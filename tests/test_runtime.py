"""Runtime tests: Iterator (Counterant port), Model end-to-end, timers.

Ports ``core/test/Iterator_test.cpp`` (counting iterant) and adds the
end-to-end dev1 run the reference only exercises manually via
``run/dev1.sh`` + ``docs/getting_started.rst``.
"""

import os

import numpy as np
import pytest

from nextsimdg_tpu.io import read_restart
from nextsimdg_tpu.runtime import Iterator, Iterant, Model
from nextsimdg_tpu.runtime.main import main
from nextsimdg_tpu.tools.make_dev_restart import make_dev_restart
from nextsimdg_tpu.utils import Chrono, ScopedTimer, Timer


class Counterant(Iterant):
    """Counts start/iterate/stop calls (Iterator_test.cpp:16-65)."""

    def __init__(self):
        self.count = 0
        self.start_count = 0
        self.stop_count = 0

    def start(self, start_time):
        self.start_count += 1

    def iterate(self, dt):
        self.count += 1

    def stop(self, stop_time):
        self.stop_count += 1


def test_iterator_runs_exact_step_count():
    counterant = Counterant()
    iterator = Iterator(counterant)
    iterator.set_start_stop_step(0, 5, 1)
    iterator.run()
    assert counterant.count == 5
    assert counterant.start_count == 1
    assert counterant.stop_count == 1


def test_iterator_duration_overrides_stop():
    counterant = Counterant()
    iterator = Iterator(counterant)
    iterator.parse_and_set(start="10", stop="100", duration="3", step="1")
    iterator.run()
    assert counterant.count == 3


def test_iterator_parse_stop_without_duration():
    counterant = Counterant()
    iterator = Iterator(counterant)
    iterator.parse_and_set(start="0", stop="4", duration="", step="2")
    iterator.run()
    assert counterant.count == 2


def run_dev1(tmp_path, monkeypatch, steps=1):
    """Generate dev1.res.nc and run the model via the CLI main()."""
    monkeypatch.chdir(tmp_path)
    make_dev_restart("dev1.res.nc")
    cfg = tmp_path / "dev1.cfg"
    cfg.write_text(
        "[model]\n"
        "init_file = dev1.res.nc\n"
        "start = 0\n"
        f"stop = {steps}\n"
        "time_step = 1\n"
    )
    assert main(["nextsim", "--config-file", str(cfg)]) == 0
    assert os.path.exists("restart.nc")
    return read_restart("restart.nc")


def test_dev1_end_to_end(tmp_path, monkeypatch):
    """The canonical dev1 run: 1 step, dummy forcing, restart written."""
    fields = run_dev1(tmp_path, monkeypatch)
    assert fields.structure_type == "devgrid"
    assert fields.nx == 10 and fields.ny == 10
    # All elements see identical forcing/state: fields stay uniform.
    for name in ("hice", "cice", "hsnow", "sst", "sss"):
        arr = getattr(fields, name)
        assert np.allclose(arr, arr.flat[0]), name
    # SST/SSS are not prognostic in this snapshot: unchanged.
    assert np.allclose(fields.sst, -1.0)
    assert np.allclose(fields.sss, 32.0)
    # Regression anchor: with the dummy forcing (night, LW=311, Tair=-1,
    # calm) and dt=1 s, BasicIceOceanHeatFlux relaxes the 10 m mixed layer
    # to freezing within the step (Qio ~ 33 MW/m2), melting the ice bottom
    # and shrinking concentration laterally — values computed by the
    # golden-validated physics path.
    assert np.allclose(fields.cice, 0.36670813, rtol=1e-6)
    assert np.allclose(fields.hice, 0.04668325, rtol=1e-6)
    assert np.allclose(fields.tice, -1.4445018, rtol=1e-6)


def test_dev1_scanned_multi_step_matches_host_loop(tmp_path, monkeypatch):
    """lax.scan on-device stepping must equal the host time loop."""
    monkeypatch.chdir(tmp_path)
    make_dev_restart("dev1.res.nc")

    from nextsimdg_tpu.config import Configurator
    from nextsimdg_tpu.modules import ModuleRegistry
    from nextsimdg_tpu.config import ConfiguredModule

    def fresh_model(stop):
        Configurator.clear()
        Configurator.add_stream(
            f"[model]\ninit_file = dev1.res.nc\nstart = 0\nstop = {stop}\ntime_step = 1\n"
        )
        ModuleRegistry.get_loader().set_all_defaults()
        ConfiguredModule.parse_configurator()
        model = Model()
        model.configure()
        return model

    model_a = fresh_model(5)
    model_a.iterator.run()
    prog_host = model_a.structure.prognostic

    model_b = fresh_model(5)
    model_b.model_step.run_steps_scanned(5, 1.0)
    prog_scan = model_b.structure.prognostic

    import jax

    for a, b in zip(jax.tree.leaves(prog_host), jax.tree.leaves(prog_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_restart_written_even_when_run_fails(tmp_path, monkeypatch):
    """Model.run mirrors the reference destructor: restart write on failure."""
    monkeypatch.chdir(tmp_path)
    make_dev_restart("dev1.res.nc")
    from nextsimdg_tpu.config import Configurator

    Configurator.add_stream(
        "[model]\ninit_file = dev1.res.nc\nstart = 0\nstop = 1\ntime_step = 1\n"
    )
    from nextsimdg_tpu.modules import ModuleRegistry
    from nextsimdg_tpu.config import ConfiguredModule

    ModuleRegistry.get_loader().set_all_defaults()
    ConfiguredModule.parse_configurator()
    model = Model()
    model.configure()

    def boom(dt):
        raise RuntimeError("simulated step failure")

    model.model_step.iterate = boom
    with pytest.raises(RuntimeError):
        model.run()
    assert os.path.exists("restart.nc")


def test_chrono_and_timer():
    import time

    chrono = Chrono()
    chrono.start()
    time.sleep(0.01)
    chrono.stop()
    assert chrono.wall_time() >= 0.01
    assert chrono.ticks == 1

    timer = Timer("test")
    timer.tick("a")
    timer.tick("b")
    time.sleep(0.005)
    timer.tock("b")
    timer.tock("a")
    report = timer.report()
    assert "a:" in report and "b:" in report
    assert "activations" in report


def test_scoped_timer_substitute():
    timer = Timer("scoped")
    ScopedTimer.set_timer_address(timer)
    with ScopedTimer("phase1") as scoped:
        scoped.substitute("phase2")
    report = timer.report()
    assert "phase1" in report and "phase2" in report
    from nextsimdg_tpu.utils.timer import main_timer

    ScopedTimer.set_timer_address(main_timer)
