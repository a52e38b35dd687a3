"""Semtner zero-layer slab thermodynamics, masked-vector form.

Module interface ``Nextsim::IThermodynamics``
(``physics/src/modules/include/IThermodynamics.hpp:18-33``); implementation
re-expresses ``ThermoIce0::calculate`` (``physics/src/modules/ThermoIce0.cpp:
34-133``) as straight-line array arithmetic:

* the zero-ice early return becomes a final ``jnp.where`` select;
* the flooding and full-melt branches become masks;
* config keys ``thermoice0.{ks,flooding}`` are preserved.

Inputs/outputs are plain arrays so the whole slab update fuses into the
surrounding physics step under ``jit``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..config import Configured
from ..constants import Ice, Water
from ..modules import register_implementation
from ..state import safe_div

INTERFACE = "Nextsim::IThermodynamics"

#: Freezing point of sea ice [degC]: -mu * s_ice (ThermoIce0.cpp:38).
FREEZING_POINT_ICE = -Water.mu * Ice.s


@dataclass(frozen=True)
class SlabUpdate:
    """Outputs of the slab calculation (the PhysicsData writes + increments)."""

    hi_true: jnp.ndarray  #: updated true ice thickness [m]
    hs_true: jnp.ndarray  #: updated true snow thickness [m]
    t_surf: jnp.ndarray  #: updated ice surface temperature [degC]
    q_io: jnp.ndarray  #: ice-ocean heat flux incl. full-melt latent heat
    h_ice_from_snow: jnp.ndarray  #: ice formed by flooded snow [m]
    #: Interior layer temperatures (multi-layer schemes; None for 0-layer).
    t_layers: tuple = None


@register_implementation(INTERFACE, "Nextsim::ThermoIce0")
class ThermoIce0(Configured):
    def __init__(self) -> None:
        self.k_s = 0.3096
        self.do_flooding = True

    def configure(self) -> None:
        self.k_s = Configured.get_configuration("thermoice0.ks", 0.3096)
        self.do_flooding = Configured.get_configuration("thermoice0.flooding", True)

    def calculate(
        self,
        *,
        hice,  # effective ice thickness [m]
        cice,  # ice concentration [1]
        hi_true,  # true ice thickness [m]
        hs_true,  # true snow thickness [m]
        tice0,  # ice surface temperature [degC]
        t_bot,  # ice bottom temperature = seawater freezing point [degC]
        q_ia,  # ice-atmosphere heat flux [W m-2]
        dq_dt,  # d(q_ia)/dT [W m-2 K-1]
        q_io,  # ice-ocean heat flux [W m-2]
        subl,  # sublimation rate [kg m-2 s-1]
        snowfall,  # snowfall rate [kg m-2 s-1]
        dt,  # timestep [s]
        min_thickness,  # NextsimPhysics::minimumIceThickness()
        **_unused,  # multi-layer args (tice1, tice2) of other schemes
    ) -> SlabUpdate:
        bulk_lh_snow = Water.Lf * Ice.rho_snow
        bulk_lh_ice = Water.Lf * Ice.rho

        no_ice = (hice == 0.0) | (cice == 0.0)

        # Conduction through the combined ice+snow slab (ThermoIce0.cpp:57-63).
        slab_den = self.k_s * hi_true + Ice.kappa * hs_true
        k_l_slab = safe_div(jnp.full_like(hi_true, self.k_s * Ice.kappa), slab_den)
        q_conduction = k_l_slab * (t_bot - tice0)
        remaining_flux = q_conduction - q_ia
        t_surf = tice0 + remaining_flux / (k_l_slab + dq_dt)

        # Clamp to the melting point of ice or snow (ThermoIce0.cpp:66-68).
        melting_limit = jnp.where(hs_true > 0.0, 0.0, FREEZING_POINT_ICE)
        t_surf = jnp.minimum(melting_limit, t_surf)

        # Top melt: snow melts first, excess flux melts ice (:71-81).
        snow_melt_rate = jnp.minimum(-remaining_flux, 0.0) / bulk_lh_snow
        snow_subl_rate = subl / Ice.rho_snow
        hs_new = hs_true + (snow_melt_rate - snow_subl_rate) * dt
        excess_ice_melt = jnp.minimum(hs_new, 0.0) * bulk_lh_snow / bulk_lh_ice
        hs_new = jnp.maximum(hs_new, 0.0)
        hs_new = hs_new + snowfall * dt / Ice.rho_snow

        # Bottom growth/melt from conduction minus ocean heat (:84-88).
        ice_bottom_change = (q_conduction - q_io) * dt / bulk_lh_ice
        hi_new = hi_true + excess_ice_melt + ice_bottom_change

        # Snow-ice conversion by flooding (:94-106).
        draught = (hi_new * Ice.rho + hs_new * Ice.rho_snow) / Water.rho_ocean
        flood = jnp.logical_and(self.do_flooding, draught > hi_new)
        new_ice_from_snow = jnp.where(flood, draught - hi_new, 0.0)
        hi_new = jnp.where(flood, draught, hi_new)
        hs_new = hs_new - new_ice_from_snow * Ice.rho / Ice.rho_snow
        h_ice_from_snow = new_ice_from_snow

        # Full melt below the minimum thickness (:108-132): all remaining
        # latent heat goes to the ocean and the state zeroes out.
        full_melt = hi_new < min_thickness
        delta_q_io = (hi_new * bulk_lh_ice + hs_new * bulk_lh_snow) / dt
        q_io_new = jnp.where(full_melt, q_io + delta_q_io, q_io)
        h_ice_from_snow = jnp.where(full_melt, 0.0, h_ice_from_snow)
        hi_new = jnp.where(full_melt, 0.0, hi_new)
        hs_new = jnp.where(full_melt, 0.0, hs_new)
        t_surf = jnp.where(full_melt, FREEZING_POINT_ICE, t_surf)

        # Zero-ice early return (:45-51): thickness/temperature reset, and the
        # flux/flooding updates of the main path do not happen.
        return SlabUpdate(
            hi_true=jnp.where(no_ice, 0.0, hi_new),
            hs_true=jnp.where(no_ice, 0.0, hs_new),
            t_surf=jnp.where(no_ice, FREEZING_POINT_ICE, t_surf),
            q_io=jnp.where(no_ice, q_io, q_io_new),
            h_ice_from_snow=jnp.where(no_ice, 0.0, h_ice_from_snow),
        )
