"""Masked-branch physics tests.

The golden scenarios exercise the melting/freezing paths; these target the
remaining branches of the reference logic: snow-ice flooding
(ThermoIce0.cpp:94-106), full melt (:108-132), the minimum
concentration/thickness clamp (NextsimPhysics.cpp:211-219), freeze-up of
open water, and the zero-ice early return (ThermoIce0.cpp:45-51).
"""

import jax.numpy as jnp
import numpy as np

from nextsimdg_tpu.constants import Ice, Water
from tests.test_physics_golden import (
    configured_physics,
    make_forcing,
    make_state,
    scalar,
)


def test_flooding_converts_submerged_snow_to_ice():
    """A huge snow load floods: ice grows to the draught, snow shrinks."""
    phys = configured_physics()
    # hsnow_true = 1.6 m on 0.4 m of ice: draught far exceeds the ice.
    prog = make_state(hice=0.2, cice=0.5, hsnow=0.8, sst=-1.7, sss=32, tice=[-5.0])
    forcing = make_forcing(tair=-5, tdew=-6, pair=1e5, lw=300, mld=10, wind=0)
    updated, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=600.0)

    h_from_snow = scalar(diags.h_ice_from_snow)
    assert h_from_snow > 0.0, "flooding branch must trigger"
    conc = scalar(updated.cice)
    hi_true = scalar(updated.hice) / conc
    hs_true = scalar(updated.hsnow) / conc
    # Post-flooding isostasy: the draught equals the ice thickness.
    draught = (hi_true * Ice.rho + hs_true * Ice.rho_snow) / Water.rho_ocean
    np.testing.assert_allclose(draught, hi_true, rtol=1e-6)
    # Ice+snow mass is conserved by the conversion (no melt fluxes here to
    # speak of at these settings): check the ice gained what snow lost.
    assert hi_true > 0.4


def test_flooding_disabled_by_config():
    from nextsimdg_tpu.config import Configurator

    Configurator.add_stream("[thermoice0]\nflooding = false\n")
    phys = configured_physics()
    prog = make_state(hice=0.2, cice=0.5, hsnow=0.8, sst=-1.7, sss=32, tice=[-5.0])
    forcing = make_forcing(tair=-5, tdew=-6, pair=1e5, lw=300, mld=10, wind=0)
    _, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=600.0)
    assert scalar(diags.h_ice_from_snow) == 0.0


def test_full_melt_returns_latent_heat_to_ocean():
    """Thin ice under strong warming melts out completely; Qio absorbs it."""
    phys = configured_physics()
    prog = make_state(hice=0.006, cice=0.5, hsnow=0.001, sst=1.0, sss=32, tice=[-0.1])
    forcing = make_forcing(
        tair=10, tdew=8, pair=1e5, sw=600, lw=380, mld=10, wind=5
    )
    updated, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=600.0)
    assert scalar(updated.hice) == 0.0
    assert scalar(updated.hsnow) == 0.0
    assert scalar(updated.cice) == 0.0
    # Surface temperature resets to the sea-ice freezing point -mu*s.
    np.testing.assert_allclose(
        scalar(updated.tice[0]), -Water.mu * Ice.s, rtol=1e-12
    )


def test_open_water_freeze_up_creates_ice_at_h0():
    """Supercooled open water forms new ice with true thickness Hibler.h0."""
    phys = configured_physics()
    prog = make_state(hice=0.0, cice=0.0, hsnow=0.0, sst=-1.9, sss=35, tice=[0.0])
    # Strong cooling: cold, dark, windy.
    forcing = make_forcing(
        tair=-25, tdew=-26, pair=1e5, sw=0, lw=150, mld=10, wind=10
    )
    updated, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=3600.0)
    assert scalar(diags.new_ice) > 0.0
    conc = scalar(updated.cice)
    assert conc > 0.0
    hi_true = scalar(updated.hice) / conc
    np.testing.assert_allclose(hi_true, 0.25, rtol=1e-10)  # Hibler h0 default


def test_min_concentration_clamp_zeroes_trace_ice():
    """Concentration below min_conc is killed and its mass heats the ocean."""
    from nextsimdg_tpu.config import Configurator

    Configurator.add_stream("[nextsim_thermo]\nmin_conc = 0.2\n")
    phys = configured_physics()
    assert phys.min_conc == 0.2
    # Melting conditions on low concentration: lateral melt drives the
    # concentration below min_conc within the step.
    prog = make_state(hice=0.042, cice=0.21, hsnow=0.0, sst=-1.0, sss=32, tice=[-0.2])
    forcing = make_forcing(tair=5, tdew=4, pair=1e5, sw=300, lw=340, mld=10, wind=5)
    updated, _ = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=600.0)
    assert scalar(updated.cice) == 0.0
    assert scalar(updated.hice) == 0.0


def test_zero_ice_stays_zero_without_cooling():
    """Warm open water: no ice appears, temperatures untouched."""
    phys = configured_physics()
    prog = make_state(hice=0.0, cice=0.0, hsnow=0.0, sst=5.0, sss=32, tice=[0.0])
    forcing = make_forcing(tair=10, tdew=8, pair=1e5, sw=200, lw=350, mld=10, wind=3)
    updated, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=600.0)
    assert scalar(updated.cice) == 0.0
    assert scalar(updated.hice) == 0.0
    assert scalar(diags.new_ice) == 0.0
    assert scalar(updated.sst) == 5.0
