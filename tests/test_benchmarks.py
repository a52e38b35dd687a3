"""Benchmark harness smoke tests (tiny sizes, CPU)."""

import sys
import os

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))


def test_scaling_harness_runs_on_1_and_2_devices():
    import scaling

    devices = jax.devices()
    t1 = scaling.run_once(devices[:1], local_n=8, chunk=2)
    t2 = scaling.run_once(devices[:2], local_n=8, chunk=2)
    assert t1 > 0 and t2 > 0


def test_advection_benchmark_small():
    import run_benchmarks

    result = run_benchmarks.bench_advection(n=16, degree=1)
    assert result["value"] > 0
    assert result["unit"] == "elements/s"
