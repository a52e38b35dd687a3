"""Time-dependent forcing archive tests."""

import numpy as np
import pytest

from nextsimdg_tpu.io.forcing_file import (
    ForcingProvider,
    write_forcing_archive,
)


def make_archive(path, nx=4, ny=4):
    time = np.array([0.0, 3600.0, 7200.0])
    tair = np.stack([np.full((nx, ny), v) for v in (-10.0, -5.0, 0.0)])
    wind = np.stack([np.full((nx, ny), v) for v in (2.0, 6.0, 10.0)])
    u_atm = np.stack([np.full((nx, ny), v) for v in (1.0, 2.0, 3.0)])
    write_forcing_archive(path, time, {"tair": tair, "wind": wind, "u_atm": u_atm})


def test_linear_time_interpolation(tmp_path):
    path = str(tmp_path / "forcing.h5")
    make_archive(path)
    provider = ForcingProvider(path)
    f = provider.thermo_forcing(1800.0, 4, 4)  # halfway between -10 and -5
    np.testing.assert_allclose(np.asarray(f.tair), -7.5)
    np.testing.assert_allclose(np.asarray(f.wind), 4.0)
    # Fields absent from the archive use the reference dummy values.
    np.testing.assert_allclose(np.asarray(f.lw_in), 311.0)
    np.testing.assert_allclose(np.asarray(f.mld), 10.0)


def test_clamping_and_periodic_wrap(tmp_path):
    path = str(tmp_path / "forcing.h5")
    make_archive(path)
    clamped = ForcingProvider(path)
    np.testing.assert_allclose(np.asarray(clamped.thermo_forcing(-100.0, 4, 4).tair), -10.0)
    np.testing.assert_allclose(np.asarray(clamped.thermo_forcing(1e9, 4, 4).tair), 0.0)
    periodic = ForcingProvider(path, periodic=True)
    # t = 9000 wraps to 1800 over the [0, 7200] cycle.
    np.testing.assert_allclose(np.asarray(periodic.thermo_forcing(9000.0, 4, 4).tair), -7.5)


def test_dynamics_forcing_fields(tmp_path):
    path = str(tmp_path / "forcing.h5")
    make_archive(path)
    provider = ForcingProvider(path)
    df = provider.dynamics_forcing(3600.0, 4, 4)
    np.testing.assert_allclose(np.asarray(df.u_atm), 2.0)
    np.testing.assert_allclose(np.asarray(df.v_atm), 0.0)  # dummy fallback


def test_model_with_forcing_archive(tmp_path, monkeypatch):
    """The thermo model consumes the archive (replacing dummy forcing)."""
    monkeypatch.chdir(tmp_path)
    from nextsimdg_tpu.tools.make_dev_restart import make_dev_restart
    from nextsimdg_tpu.runtime.main import main

    make_dev_restart("dev1.res.nc")
    # Cold, windy, clear-sky archive: strongly cools the ice surface (the
    # dummy forcing is calm with LW=311, which barely cools).
    time = np.array([0.0, 2.0])
    const = lambda v: np.stack([np.full((10, 10), v)] * 2)
    write_forcing_archive(
        "forcing.h5", time,
        {"tair": const(-20.0), "wind": const(5.0), "lw_in": const(150.0)},
    )
    cfg = tmp_path / "run.cfg"
    cfg.write_text(
        "[model]\ninit_file = dev1.res.nc\nstart = 0\nstop = 2\ntime_step = 1\n"
        "forcing_file = forcing.h5\n"
    )
    assert main(["nextsim", "--config-file", str(cfg)]) == 0
    # The run used tair=-20 (not the dummy -1): with a cold atmosphere the
    # ice surface temperature drops well below the dummy-forcing value.
    from nextsimdg_tpu.io import read_restart

    fields = read_restart("restart.nc")
    assert np.all(fields.tice < -2.0)
