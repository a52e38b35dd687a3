"""Weak-scaling harness: elements/s and efficiency vs device count.

Runs the coupled dynamics step on 1, 2, 4, ..., N devices with the
per-device problem size held fixed (weak scaling); reports throughput and
efficiency relative to 1 device. On a TPU pod slice this exercises ICI/DCN
halo exchange; under ``JAX_PLATFORMS=cpu`` with
``--xla_force_host_platform_device_count=8`` it validates the harness.

Usage: ``python benchmarks/scaling.py [local_n_per_device]``
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from nextsimdg_tpu.coupled import CoupledModel
from nextsimdg_tpu.dynamics import RectMesh
from nextsimdg_tpu.dynamics.mevp import DynamicsForcing
from nextsimdg_tpu.parallel import SpatialPartition, make_spatial_mesh
from nextsimdg_tpu.state import Forcing


def run_once(devices, local_n: int, chunk: int = 32) -> float:
    """Return elements/s for len(devices) devices, local_n^2 elems each."""
    k = len(devices)
    mesh = make_spatial_mesh(devices=devices)
    px, py = mesh.devices.shape
    nx, ny = local_n * px, local_n * py
    dtype = jnp.float32

    rmesh = RectMesh(nx=nx, ny=ny, dx=2e3, dy=2e3)
    model = CoupledModel(rmesh, degree=1, n_subcycles=100)
    state = model.initial_state(hice0=1.0, cice0=0.9, hsnow0=0.05, dtype=dtype)
    full = lambda v: jnp.full((nx, ny), v, dtype)
    pf = Forcing(tair=full(-10.0), dew2m=full(-12.0), pair=full(1e5), sw_in=full(10.0),
                 lw_in=full(250.0), mld=full(10.0), snowfall=full(1e-4), wind=full(8.0))
    df = DynamicsForcing(u_atm=full(8.0), v_atm=full(2.0), u_ocean=full(0.02),
                         v_ocean=full(0.0))

    part = SpatialPartition(mesh)
    state, pf, df = part.shard(state), part.shard(pf), part.shard(df)

    run = lambda s: model.run(s, pf, df, 600.0, chunk, do_thermo=False)

    def run_synced(s):
        # block_until_ready through the axon tunnel can return while work
        # is still queued; fetching one scalar forces real completion.
        out = run(s)
        float(out.hice[0, 0, 0])
        return out

    state = run_synced(state)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = run_synced(state)
        best = min(best, time.perf_counter() - t0)
    return nx * ny * chunk / best


def main(argv) -> None:
    local_n = int(argv[1]) if len(argv) > 1 else 128
    devices = jax.devices()
    counts = [1]
    while counts[-1] * 2 <= len(devices):
        counts.append(counts[-1] * 2)

    base = None
    for k in counts:
        throughput = run_once(devices[:k], local_n)
        if base is None:
            base = throughput
        efficiency = throughput / (base * k)
        print(json.dumps({
            "devices": k,
            "elements_per_s": float(f"{throughput:.4g}"),
            "weak_scaling_efficiency": float(f"{efficiency:.4g}"),
            "local_grid": f"{local_n}x{local_n}",
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv)
