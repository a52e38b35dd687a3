"""Parity extras: SimpleIterant, PrognosticBuilder, checkpoint cadence."""

import glob
import os

import jax.numpy as jnp
import numpy as np

from nextsimdg_tpu.runtime import Iterator
from nextsimdg_tpu.runtime.simple_iterant import SimpleIterant
from nextsimdg_tpu.state import PrognosticBuilder


def test_simple_iterant_prints_lifecycle(capsys):
    iterator = Iterator(SimpleIterant())
    iterator.set_start_stop_step(0, 2, 1)
    iterator.run()
    out = capsys.readouterr().out
    assert out.count("iterate") == 2
    assert "start at 0" in out and "stop at 2" in out


def test_prognostic_builder_scalars_and_layers():
    state = (
        PrognosticBuilder(4, 3, nlayers=2)
        .hice(0.1).cice(0.5).hsnow(0.0).sst(-1.0).sss(32.0).tice([-2.0, -1.5])
        .build()
    )
    assert state.hice.shape == (4, 3)
    assert state.tice.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(state.tice[0]), -2.0)
    np.testing.assert_allclose(np.asarray(state.tice[1]), -1.5)
    np.testing.assert_allclose(np.asarray(state.ice_true_thickness()), 0.2)


def test_prognostic_builder_accepts_arrays():
    field = jnp.arange(12.0).reshape(4, 3)
    state = PrognosticBuilder(4, 3).hice(field).cice(1.0).build()
    np.testing.assert_allclose(np.asarray(state.hice), np.asarray(field))


def test_checkpoint_cadence(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from nextsimdg_tpu.tools.make_dev_restart import make_dev_restart
    from nextsimdg_tpu.config import Configurator, ConfiguredModule
    from nextsimdg_tpu.modules import ModuleRegistry
    from nextsimdg_tpu.runtime import Model

    make_dev_restart("dev1.res.nc")
    Configurator.add_stream(
        "[model]\n"
        "init_file = dev1.res.nc\n"
        "start = 0\nstop = 6\ntime_step = 1\n"
        "checkpoint_period = 2\n"
        "checkpoint_pattern = chk.{step}.nc\n"
    )
    ModuleRegistry.get_loader().set_all_defaults()
    ConfiguredModule.parse_configurator()
    model = Model()
    model.configure()
    model.run()
    written = sorted(glob.glob("chk.*.nc"))
    assert written == ["chk.2.nc", "chk.4.nc", "chk.6.nc"]
    assert os.path.exists("restart.nc")
