"""The column-physics orchestrator.

Re-design of ``NextsimPhysics`` (``physics/src/modules/NextsimPhysics.cpp``)
as a configured object whose ``step`` is a pure function over state pytrees:

* ``configure()`` resolves the four physics sub-modules plus the freezing
  point module from the registry (``NextsimPhysics.cpp:60-83``;
  ``PrognosticData.cpp:56-61``) and reads the ``nextsim_thermo.*`` keys —
  everything becomes Python-level constants closed over at trace time;
* ``update_derived_data`` mirrors the ``IPhysics1d`` base template method
  (``IPhysics1d.hpp:33-45``);
* ``calculate`` composes the flux/mass updates in the reference order
  (``NextsimPhysics.cpp:116-131``) with per-element branches as masks.

The only cross-step physics memory is ``new_ice``: the reference keeps
``m_newice`` per element and only overwrites it in the supercooling branch
(``NextsimPhysics.cpp:244-253``), so the previous value persists through
non-freezing steps; callers thread it via ``PhysicsDiagnostics.new_ice``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ..config import Configured, try_configure
from ..constants import Air, Ice, Vapour, Water, kelvin, PhysicalConstants
from ..modules import ModuleRegistry, register_implementation
from ..state import Forcing, PhysicsDiagnostics, PrognosticState, safe_div
from .humidity import dq_dt_ice, spec_hum_ice, spec_hum_water

INTERFACE = "Nextsim::IPhysics1d"


def stefan_boltzmann(temperature_c):
    """Upward longwave of an ice surface: eps * sigma * T^4 (T in degC)."""
    return Ice.epsilon * PhysicalConstants.sigma * kelvin(temperature_c) ** 4


def latent_heat_water(temperature):
    """Latent heat of vaporization polynomial (Horner form) [J kg-1]."""
    return Water.Lv0 + temperature * (
        -2.36418e3 + temperature * (1.58927 + temperature * (-6.14342e-2))
    )


def latent_heat_ice(temperature):
    """Latent heat of sublimation polynomial [J kg-1]."""
    return Water.Lv0 + Water.Lf - 240.0 + temperature * (-290.0 + temperature * (-4.0))


def drag_ocean_m(wind_speed):
    """Gill (1982) / Smith (1980) ocean momentum drag coefficient."""
    return 1e-3 * jnp.clip(0.61 + 0.063 * wind_speed, 1.0, 2.0)


@dataclass(frozen=True)
class DerivedData:
    """Outputs of updateDerivedData (cf. PhysicsData's derived members)."""

    sphum_air: Any
    sphum_water: Any
    sphum_ice: Any
    rho_air: Any
    cp_wet_air: Any
    hi_true: Any  #: updated true ice thickness, initialised to prognostic
    hs_true: Any  #: updated true snow thickness, initialised to prognostic


@register_implementation(INTERFACE, "Nextsim::NextsimPhysics")
class NextsimPhysics(Configured):
    def __init__(self) -> None:
        self.drag_ocean_q = 1.5e-3
        self.drag_ocean_t = 0.83e-3
        self.drag_ice_t = 1.3e-3
        self.ocean_albedo = 0.07
        self.i0 = 0.17
        self.min_conc = 1e-12
        self.min_thick = 0.01
        self._ice_ocean_heat_flux = None
        self._ice_albedo = None
        self._thermo = None
        self._concentration = None
        self._freezing_point = None

    # -- configuration (NextsimPhysics.cpp:60-83) ----------------------------
    def configure(self) -> None:
        loader = ModuleRegistry.get_loader()
        self._ice_ocean_heat_flux = loader.get_implementation("Nextsim::IIceOceanHeatFlux")
        try_configure(self._ice_ocean_heat_flux)
        self._ice_albedo = loader.get_implementation("Nextsim::IIceAlbedo")
        try_configure(self._ice_albedo)
        self._thermo = loader.get_implementation("Nextsim::IThermodynamics")
        try_configure(self._thermo)
        self._concentration = loader.get_implementation("Nextsim::IConcentrationModel")
        try_configure(self._concentration)
        # Bound by PrognosticData::configure in the reference.
        self._freezing_point = loader.get_implementation("Nextsim::IFreezingPoint")
        try_configure(self._freezing_point)

        self.drag_ocean_q = Configured.get_configuration("nextsim_thermo.drag_ocean_q", 1.5e-3)
        self.drag_ocean_t = Configured.get_configuration("nextsim_thermo.drag_ocean_t", 0.83e-3)
        self.drag_ice_t = Configured.get_configuration("nextsim_thermo.drag_ice_t", 1.3e-3)
        self.ocean_albedo = Configured.get_configuration("nextsim_thermo.albedoW", 0.07)
        self.i0 = Configured.get_configuration("nextsim_thermo.I_0", 0.17)
        self.min_conc = Configured.get_configuration("nextsim_thermo.min_conc", 1e-12)
        self.min_thick = Configured.get_configuration("nextsim_thermo.min_thick", 0.01)

    def _modules_resolved(self) -> None:
        if self._thermo is None:
            # Default wiring when configure() was not called explicitly.
            self.configure()

    # -- derived data (IPhysics1d.hpp:33-45) ---------------------------------
    def update_derived_data(self, prog: PrognosticState, forcing: Forcing) -> DerivedData:
        sphum_air = spec_hum_water(forcing.dew2m, forcing.pair)
        sphum_water = spec_hum_water(prog.sst, forcing.pair, prog.sss)
        sphum_ice = spec_hum_ice(prog.tice[0], forcing.pair)
        ra_wet = Air.Ra / (1.0 - sphum_air * (1.0 - Vapour.Ra / Air.Ra))
        rho_air = forcing.pair / (ra_wet * kelvin(forcing.tair))
        cp_wet_air = Air.cp + sphum_air * Vapour.cp
        return DerivedData(
            sphum_air=sphum_air,
            sphum_water=sphum_water,
            sphum_ice=sphum_ice,
            rho_air=rho_air,
            cp_wet_air=cp_wet_air,
            hi_true=prog.ice_true_thickness(),
            hs_true=prog.snow_true_thickness(),
        )

    # -- the physics step ----------------------------------------------------
    def calculate(
        self,
        prog: PrognosticState,
        forcing: Forcing,
        derived: DerivedData,
        new_ice_prev,
        dt: float,
    ):
        """One column-physics update (NextsimPhysics::calculate order).

        Returns ``(updated_prognostic, diagnostics)``.
        """
        self._modules_resolved()
        tice0 = prog.tice[0]
        wind = forcing.wind
        rho_air = derived.rho_air

        # massFluxOpenWater (:133-137)
        evap = self.drag_ocean_q * rho_air * wind * (derived.sphum_water - derived.sphum_air)

        # momentumFluxOpenWater (:139-142)
        drag_pressure = rho_air * drag_ocean_m(wind)

        # heatFluxOpenWater (:144-162)
        q_lh_ow = evap * latent_heat_water(prog.sst)
        q_sh_ow = (
            self.drag_ocean_t * rho_air * derived.cp_wet_air * wind * (prog.sst - forcing.tair)
        )
        q_sw_ow = -forcing.sw_in * (1.0 - self.ocean_albedo)
        q_lw_ow = stefan_boltzmann(prog.sst) - forcing.lw_in
        q_ow = q_lh_ow + q_sh_ow + q_lw_ow + q_sw_ow

        # massFluxIceAtmosphere (:164-168)
        subl = self.drag_ice_t * rho_air * wind * (derived.sphum_ice - derived.sphum_air)

        # heatFluxIceAtmosphere (:170-198)
        q_lh_i = subl * latent_heat_ice(tice0)
        dmdot_dt = self.drag_ice_t * rho_air * wind * dq_dt_ice(tice0, forcing.pair)
        dq_lh_dt = latent_heat_ice(tice0) * dmdot_dt
        q_sh_i = self.drag_ice_t * rho_air * derived.cp_wet_air * wind * (tice0 - forcing.tair)
        dq_sh_dt = self.drag_ice_t * rho_air * derived.cp_wet_air * wind
        snow_true_for_albedo = safe_div(prog.hsnow, prog.cice)
        albedo_value = self._ice_albedo.albedo(tice0, snow_true_for_albedo, self.i0)
        q_sw_i = -forcing.sw_in * (1.0 - self.i0) * (1.0 - albedo_value)
        q_lw_i = stefan_boltzmann(tice0) - forcing.lw_in
        dq_lw_dt = 4.0 / kelvin(tice0) * stefan_boltzmann(tice0)
        q_ia = q_lh_i + q_sh_i + q_lw_i + q_sw_i
        dq_dt = dq_lh_dt + dq_sh_dt + dq_lw_dt

        # heatFluxIceOcean (:222-226) — before the mass flux, which uses it.
        t_freeze = self._freezing_point(prog.sss)
        mlbhc = forcing.mixed_layer_bulk_heat_capacity()
        q_io = self._ice_ocean_heat_flux.flux(prog.sst, t_freeze, mlbhc, dt)

        # massFluxIceOcean (:200-220): thermodynamics ...
        layer_kwargs = {}
        if prog.tice.shape[0] >= 3:
            # Multi-layer schemes (ThermoWinton): tice = [Ts, T1, T2].
            layer_kwargs = dict(tice1=prog.tice[1], tice2=prog.tice[2])
        slab = self._thermo.calculate(
            hice=prog.hice,
            cice=prog.cice,
            hi_true=derived.hi_true,
            hs_true=derived.hs_true,
            tice0=tice0,
            t_bot=t_freeze,
            q_ia=q_ia,
            dq_dt=dq_dt,
            q_io=q_io,
            subl=subl,
            snowfall=forcing.snowfall,
            dt=dt,
            min_thickness=self.min_thick,
            **layer_kwargs,
        )
        q_io = slab.q_io
        hi_new = slab.hi_true
        hs_new = slab.hs_true

        # ... newIceFormation (:228-254) ...
        cooling_flux = q_ow
        delta_tml = -cooling_flux / mlbhc * dt
        t1 = prog.sst + delta_tml
        freezes = t1 < t_freeze
        sensible_flux = safe_div((t_freeze - prog.sst) * cooling_flux, delta_tml)
        latent_flux = cooling_flux - sensible_flux
        q_ow = jnp.where(freezes, sensible_flux, q_ow)
        new_ice = jnp.where(
            freezes,
            latent_flux * dt * (1.0 - prog.cice) / (Ice.Lf * Ice.rho),
            new_ice_prev,
        )

        # ... lateralGrowth (:262-289) ...
        del_c = self._concentration.freeze(new_ice)
        melting = hi_new < derived.hi_true
        del_c = del_c + jnp.where(
            melting,
            self._concentration.melt(prog.cice, derived.hi_true, hi_new),
            0.0,
        )
        conc_new = prog.cice + del_c
        apply_volume = conc_new >= self.min_conc
        # updateThickness: thick += (deltaV - thick*deltaC)/(oldConc + deltaC)
        hi_new = jnp.where(
            apply_volume,
            hi_new + safe_div(new_ice - hi_new * del_c, prog.cice + del_c),
            hi_new,
        )
        shrinking = del_c < 0.0
        q_ow = jnp.where(
            apply_volume & shrinking,
            q_ow - del_c * hs_new * Water.Lf * Ice.rho_snow / dt,
            q_ow,
        )
        hs_new = jnp.where(
            apply_volume & ~shrinking,
            hs_new + safe_div(-hs_new * del_c, prog.cice + del_c),
            hs_new,
        )

        # ... minimum concentration/thickness clamp (:211-219).
        kill = (conc_new < self.min_conc) | (hi_new < self.min_thick)
        q_ow = jnp.where(
            kill,
            q_ow
            + conc_new * Water.Lf * (hi_new * Ice.rho + hs_new * Ice.rho_snow) / dt,
            q_ow,
        )
        conc_new = jnp.where(kill, 0.0, conc_new)
        hi_new = jnp.where(kill, 0.0, hi_new)
        hs_new = jnp.where(kill, 0.0, hs_new)

        # Commit (PrognosticData::updateAndIntegrate, PrognosticData.cpp:63-94):
        # effective thickness = true thickness * concentration; ice temperature
        # layer 0 is the slab surface temperature. For multi-layer schemes the
        # interior layers come from the thermodynamics module; for the 0-layer
        # reference scheme deeper layers take the PhysicsData init value 0
        # (the reference never writes m_TiceNew[1:]).
        if slab.t_layers is not None and prog.tice.shape[0] >= 1 + len(slab.t_layers):
            layers = [slab.t_surf, *slab.t_layers]
            layers += [jnp.zeros_like(slab.t_surf)] * (prog.tice.shape[0] - len(layers))
            tice_new = jnp.stack(layers)
        else:
            tice_new = jnp.zeros_like(prog.tice).at[0].set(slab.t_surf)
        updated = PrognosticState(
            hice=hi_new * conc_new,
            cice=conc_new,
            hsnow=hs_new * conc_new,
            sst=prog.sst,
            sss=prog.sss,
            tice=tice_new,
        )
        diagnostics = PhysicsDiagnostics(
            evap=evap,
            subl=subl,
            q_ow=q_ow,
            q_ia=q_ia,
            q_io=q_io,
            dq_dt=dq_dt,
            drag_pressure=drag_pressure,
            new_ice=new_ice,
            h_ice_from_snow=slab.h_ice_from_snow,
        )
        return updated, diagnostics

    def step(self, prog: PrognosticState, forcing: Forcing, new_ice_prev, dt: float):
        """updateDerivedData + calculate: one full physics timestep."""
        derived = self.update_derived_data(prog, forcing)
        return self.calculate(prog, forcing, derived, new_ice_prev, dt)
