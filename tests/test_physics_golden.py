"""Golden-value column physics tests.

Ports every scenario of ``physics/test/NextsimPhysics_test.cpp`` (and thereby
``ElementData_test.cpp``) to the vectorised physics. The pinned numbers are
the reference model's outputs at 1e-4 relative tolerance — they are the
correctness contract of the rebuild.

Scenarios run as 1x1 grids; the same code path handles full grids.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nextsimdg_tpu.config import Configurator, ConfiguredModule
from nextsimdg_tpu.constants import PhysicalConstants
from nextsimdg_tpu.modules import ModuleRegistry
from nextsimdg_tpu.physics import NextsimPhysics
from nextsimdg_tpu.state import Forcing, PrognosticState


def approx(value, rel=1e-4):
    return pytest.approx(value, rel=rel)


def make_state(hice, cice, hsnow, sst, sss, tice):
    arr = lambda v: jnp.full((1, 1), float(v), dtype=jnp.float64)
    tice_arr = jnp.asarray(tice, dtype=jnp.float64).reshape(-1, 1, 1)
    return PrognosticState(
        hice=arr(hice), cice=arr(cice), hsnow=arr(hsnow),
        sst=arr(sst), sss=arr(sss), tice=tice_arr,
    )


def make_forcing(tair, tdew, pair, sw=0.0, lw=0.0, mld=10.0, snowfall=0.0, wind=0.0):
    arr = lambda v: jnp.full((1, 1), float(v), dtype=jnp.float64)
    return Forcing(
        tair=arr(tair), dew2m=arr(tdew), pair=arr(pair), sw_in=arr(sw),
        lw_in=arr(lw), mld=arr(mld), snowfall=arr(snowfall), wind=arr(wind),
    )


def configured_physics():
    ModuleRegistry.get_loader().set_all_defaults()
    ConfiguredModule.parse_configurator()
    phys = NextsimPhysics()
    phys.configure()
    return phys


def scalar(x):
    return float(np.asarray(x).reshape(()))


def test_minimum_ice_and_i0_config():
    Configurator.add_stream(
        "[nextsim_thermo]\nmin_conc = 2e-12\nmin_thick = 0.02\nI_0 = 0.18\n"
    )
    phys = configured_physics()
    assert phys.min_conc == 2e-12
    assert phys.min_thick == 0.02
    assert phys.i0 == 0.18


def test_update_derived_data():
    phys = configured_physics()
    prog = make_state(hice=0.1, cice=0.5, hsnow=0.0, sst=-1, sss=32, tice=[-2, -2, -2])
    forcing = make_forcing(tair=-3, tdew=0.1, pair=100000)
    derived = phys.update_derived_data(prog, forcing)
    assert scalar(derived.rho_air) == approx(1.29253)
    assert scalar(derived.sphum_air) == approx(0.00385326)
    assert scalar(derived.sphum_water) == approx(0.00349446)
    assert scalar(derived.sphum_ice) == approx(0.00323958)
    assert scalar(derived.cp_wet_air) == approx(1011.81)


def test_new_ice_formation():
    Configurator.add_stream(
        "[Modules]\nNextsim::IFreezingPoint = Nextsim::UnescoFreezing\n"
    )
    phys = configured_physics()
    prog = make_state(hice=0.1, cice=0.5, hsnow=0.0, sst=-1.5, sss=32, tice=[-2, -2, -2])
    forcing = make_forcing(tair=-3, tdew=0.1, pair=100000, sw=0, lw=0, mld=10)
    _, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=86400.0)
    # Correct for old NeXtSIM's non-NIST Stefan-Boltzmann constant
    # (NextsimPhysics_test.cpp:120-123).
    sb_corr = PhysicalConstants.sigma / 5.67e-8
    assert scalar(diags.new_ice) == approx(0.0258236 * sb_corr)


def test_drag_pressure():
    phys = configured_physics()
    prog = make_state(hice=0.1, cice=0.5, hsnow=0.0, sst=-1.5, sss=32, tice=[-1, -1, -1])
    for wind, expected in ((1.5, 0.00126936), (8.0, 0.00141407), (23.0, 0.00253872)):
        forcing = make_forcing(tair=2, tdew=1.5, pair=100000, mld=10, wind=wind)
        _, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=86400.0)
        assert scalar(diags.drag_pressure) == approx(expected), wind


MODULE_CONFIG = (
    "[Modules]\n"
    "Nextsim::IFreezingPoint = Nextsim::UnescoFreezing\n"
    "Nextsim::IIceAlbedo = Nextsim::CCSMIceAlbedo\n"
    "\n"
    "[CCSMIceAlbedo]\n"
    "iceAlbedo = 0.63\n"
    "snowAlbedo = 0.88\n"
)


def test_melting_conditions():
    Configurator.add_stream(MODULE_CONFIG)
    phys = configured_physics()
    prog = make_state(hice=0.1, cice=0.5, hsnow=0.01, sst=-1, sss=32, tice=[-1, -1, -1])
    forcing = make_forcing(
        tair=3, tdew=2, pair=100000, sw=50, lw=330, mld=10, snowfall=0, wind=5
    )
    updated, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=600.0)

    conc = scalar(updated.cice)
    hi_true = scalar(updated.hice) / conc
    hs_true = scalar(updated.hsnow) / conc
    assert hi_true == approx(0.12846)
    assert hs_true == approx(0.01957732)
    assert conc == approx(0.368269)
    assert scalar(updated.tice[0]) == pytest.approx(0.0, abs=1e-12)

    assert scalar(diags.new_ice) == 0.0
    assert scalar(diags.q_ia) == approx(-84.6156, rel=1e-2)
    assert scalar(diags.q_io) == approx(53717.8, rel=1e-2)
    assert scalar(diags.subl) == approx(-7.3858e-06)
    assert scalar(diags.dq_dt) == approx(19.7013, rel=1e-2)
    assert scalar(diags.h_ice_from_snow) == pytest.approx(0.0, abs=1e-12)


def test_freezing_conditions():
    Configurator.add_stream(MODULE_CONFIG)
    phys = configured_physics()
    prog = make_state(hice=0.1, cice=0.5, hsnow=0.01, sst=-1.75, sss=32, tice=[-9, -9])
    forcing = make_forcing(
        tair=-12, tdew=-12, pair=100000, sw=0, lw=265, mld=10, snowfall=1e-3, wind=5
    )
    updated, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=600.0)

    conc = scalar(updated.cice)
    hi_true = scalar(updated.hice) / conc
    hs_true = scalar(updated.hsnow) / conc
    assert hi_true == approx(0.199998)
    assert hs_true == approx(0.02179357)
    assert conc == approx(0.5002)
    assert scalar(updated.tice[0]) == approx(-8.90443)

    assert scalar(diags.new_ice) == approx(6.79707e-5, rel=1e-2)
    assert scalar(diags.q_ia) == approx(42.2955, rel=1e-2)
    assert scalar(diags.q_io) == approx(73.9465, rel=1e-2)
    assert scalar(diags.subl) == approx(2.15132e-06)
    assert scalar(diags.dq_dt) == approx(16.7615, rel=1e-2)
    assert scalar(diags.h_ice_from_snow) == pytest.approx(0.0, abs=1e-12)


def test_step_is_jittable_and_matches_eager():
    """The physics step must compile under jit and agree with eager mode."""
    import jax

    Configurator.add_stream(MODULE_CONFIG)
    phys = configured_physics()
    prog = make_state(hice=0.1, cice=0.5, hsnow=0.01, sst=-1.75, sss=32, tice=[-9, -9])
    forcing = make_forcing(
        tair=-12, tdew=-12, pair=100000, sw=0, lw=265, mld=10, snowfall=1e-3, wind=5
    )
    new_ice0 = jnp.zeros((1, 1))
    eager_updated, eager_diags = phys.step(prog, forcing, new_ice0, 600.0)
    jit_step = jax.jit(lambda p, f, n: phys.step(p, f, n, 600.0))
    jit_updated, jit_diags = jit_step(prog, forcing, new_ice0)
    for a, b in zip(jax.tree.leaves(eager_updated), jax.tree.leaves(jit_updated)):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    for a, b in zip(jax.tree.leaves(eager_diags), jax.tree.leaves(jit_diags)):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_vectorised_grid_matches_scalar_columns():
    """A mixed-condition grid must equal per-column runs (mask correctness)."""
    import jax

    Configurator.add_stream(MODULE_CONFIG)
    phys = configured_physics()

    # Columns: melting scenario, freezing scenario, open water, full ice.
    cols = dict(
        hice=[0.1, 0.1, 0.0, 2.0],
        cice=[0.5, 0.5, 0.0, 1.0],
        hsnow=[0.01, 0.01, 0.0, 0.3],
        sst=[-1.0, -1.75, -1.8, -1.75],
        sss=[32.0, 32.0, 34.0, 32.0],
        tice0=[-1.0, -9.0, 0.0, -9.0],
        tair=[3.0, -12.0, -12.0, -12.0],
        tdew=[2.0, -12.0, -12.0, -12.0],
        sw=[50.0, 0.0, 0.0, 0.0],
        lw=[330.0, 265.0, 265.0, 265.0],
        snowfall=[0.0, 1e-3, 0.0, 1e-3],
        wind=[5.0, 5.0, 5.0, 5.0],
    )
    n = 4
    grid_prog = PrognosticState(
        hice=jnp.asarray(cols["hice"]).reshape(1, n),
        cice=jnp.asarray(cols["cice"]).reshape(1, n),
        hsnow=jnp.asarray(cols["hsnow"]).reshape(1, n),
        sst=jnp.asarray(cols["sst"]).reshape(1, n),
        sss=jnp.asarray(cols["sss"]).reshape(1, n),
        tice=jnp.asarray(cols["tice0"]).reshape(1, 1, n),
    )
    grid_forcing = Forcing(
        tair=jnp.asarray(cols["tair"]).reshape(1, n),
        dew2m=jnp.asarray(cols["tdew"]).reshape(1, n),
        pair=jnp.full((1, n), 1e5),
        sw_in=jnp.asarray(cols["sw"]).reshape(1, n),
        lw_in=jnp.asarray(cols["lw"]).reshape(1, n),
        mld=jnp.full((1, n), 10.0),
        snowfall=jnp.asarray(cols["snowfall"]).reshape(1, n),
        wind=jnp.asarray(cols["wind"]).reshape(1, n),
    )
    grid_updated, grid_diags = phys.step(grid_prog, grid_forcing, jnp.zeros((1, n)), 600.0)

    for k in range(n):
        prog = make_state(
            cols["hice"][k], cols["cice"][k], cols["hsnow"][k],
            cols["sst"][k], cols["sss"][k], [cols["tice0"][k]],
        )
        forcing = make_forcing(
            cols["tair"][k], cols["tdew"][k], 1e5, cols["sw"][k], cols["lw"][k],
            10.0, cols["snowfall"][k], cols["wind"][k],
        )
        updated, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), 600.0)
        for name in ("hice", "cice", "hsnow", "sst", "sss"):
            np.testing.assert_allclose(
                np.asarray(getattr(grid_updated, name))[0, k],
                scalar(getattr(updated, name)),
                rtol=1e-12, err_msg=f"{name} col {k}",
            )
        np.testing.assert_allclose(
            np.asarray(grid_updated.tice)[0, 0, k], scalar(updated.tice[0]),
            rtol=1e-12, err_msg=f"tice col {k}",
        )
