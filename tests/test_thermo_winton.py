"""Winton three-layer thermodynamics tests.

The ground truth is ENERGY CONSERVATION: the scheme's total ice+snow
enthalpy must change by exactly dt*(applied atmospheric flux + consumed
ocean flux) in non-degenerate regimes — checked to near round-off. Plus
physical-regime checks (growth under cold skies, surface melt under warm)
and integration through the full NextsimPhysics step with 3-layer state.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nextsimdg_tpu.config import Configurator
from nextsimdg_tpu.modules import ModuleRegistry
from nextsimdg_tpu.physics.thermo_winton import ThermoWinton, total_enthalpy
from tests.test_physics_golden import configured_physics, make_forcing, make_state, scalar


def call_winton(
    *, hi=1.0, hs=0.1, t1=-5.0, t2=-2.5, tice0=-8.0, t_bot=-1.8,
    q_ia=50.0, dq_dt=15.0, q_io=5.0, subl=0.0, snowfall=0.0, dt=3600.0,
):
    thermo = ThermoWinton()
    arr = lambda v: jnp.full((1, 1), float(v), dtype=jnp.float64)
    out = thermo.calculate(
        hice=arr(hi * 0.9), cice=arr(0.9), hi_true=arr(hi), hs_true=arr(hs),
        tice0=arr(tice0), t_bot=arr(t_bot), q_ia=arr(q_ia), dq_dt=arr(dq_dt),
        q_io=arr(q_io), subl=arr(subl), snowfall=arr(snowfall), dt=dt,
        min_thickness=0.01, tice1=arr(t1), tice2=arr(t2),
    )
    return thermo, out


def energy_residual(thermo, out, hi, hs, t1, t2, q_io_in, dt):
    """E' - E - dt (F_atm + Qio_consumed): ~0 when no melt-leftovers."""
    e0 = total_enthalpy(np.float64(hi), np.float64(hs), np.float64(t1), np.float64(t2))
    e1 = float(
        total_enthalpy(out.hi_true, out.hs_true, out.t_layers[0], out.t_layers[1])[0, 0]
    )
    f_atm = float(np.asarray(thermo.last_f_atm).reshape(-1)[0])
    # Ocean flux consumed by the ice: the input q_io minus what was handed
    # back (out.q_io - q_io_in is the hand-back).
    q_consumed = q_io_in - (float(out.q_io[0, 0]) - q_io_in)
    return e1 - float(e0) - dt * (f_atm + q_io_in) + (float(out.q_io[0, 0]) - q_io_in) * dt


def test_energy_conservation_freezing_regime():
    """Cold atmosphere, modest ocean flux: growth; budget closes."""
    kwargs = dict(hi=1.0, hs=0.1, t1=-5.0, t2=-2.5, tice0=-8.0,
                  q_ia=60.0, dq_dt=18.0, q_io=3.0, dt=3600.0)
    thermo, out = call_winton(**kwargs)
    res = energy_residual(thermo, out, kwargs["hi"], kwargs["hs"],
                          kwargs["t1"], kwargs["t2"], kwargs["q_io"], kwargs["dt"])
    scale = abs(float(total_enthalpy(1.0, 0.1, -5.0, -2.5)))
    assert abs(res) < 1e-9 * scale, res
    # Growth: ice thickens, layers stay below freezing, ordering sane.
    assert float(out.hi_true[0, 0]) > 1.0
    assert float(out.t_layers[0][0, 0]) < float(out.t_layers[1][0, 0]) < 0.0


def test_energy_conservation_melting_regime():
    """Warm flux: surface clamps, snow melts; budget still closes."""
    kwargs = dict(hi=1.0, hs=0.05, t1=-2.0, t2=-1.5, tice0=-0.5,
                  q_ia=-150.0, dq_dt=12.0, q_io=20.0, dt=3600.0)
    thermo, out = call_winton(**kwargs)
    res = energy_residual(thermo, out, kwargs["hi"], kwargs["hs"],
                          kwargs["t1"], kwargs["t2"], kwargs["q_io"], kwargs["dt"])
    scale = abs(float(total_enthalpy(1.0, 0.05, -2.0, -1.5)))
    assert abs(res) < 1e-9 * scale, res
    # Melt: snow thins (snow melts first), surface at the melting point.
    assert float(out.hs_true[0, 0]) < 0.05
    assert float(out.t_surf[0, 0]) == pytest.approx(0.0, abs=1e-9)


def test_cold_equilibrium_surface_temperature():
    """Very thick ice, cold sky: Ts approaches the flux balance point."""
    thermo, out = call_winton(hi=10.0, hs=0.0, t1=-10.0, t2=-5.0, tice0=-20.0,
                              q_ia=80.0, dq_dt=20.0, q_io=0.0, dt=600.0)
    ts = float(out.t_surf[0, 0])
    # With k12 small (thick ice), Ts ~ Ts0 - Qia/dQdT = -20 - 4 = -24.
    assert -26.0 < ts < -22.0


def test_bottom_growth_rate_matches_conduction():
    """Near-linear initial profile: growth = (F_cond - Qio) dt / (rho*(-u2(Tf)))."""
    from nextsimdg_tpu.physics.thermo_winton import enthalpy2

    kwargs = dict(hi=1.0, hs=0.0, t1=-5.4, t2=-2.8, tice0=-8.0,
                  q_ia=40.0, dq_dt=15.0, q_io=0.0, dt=600.0)
    thermo, out = call_winton(**kwargs)
    t2_new = float(out.t_layers[1][0, 0])
    f_cond = 4.0 * 2.0334 / 1.0 * (-1.8 - t2_new)
    expected_growth = f_cond * 600.0 / (917.0 * (-float(enthalpy2(-1.8, ThermoWinton.T_MELT))))
    got = float(out.hi_true[0, 0]) - 1.0
    # out.t_layers[1] is the post-growth enthalpy-mixed T2, a hair off the
    # diffusion solution that set the conduction, hence the loose rtol.
    np.testing.assert_allclose(got, expected_growth, rtol=1e-3)


def test_winton_selected_through_module_system():
    """Full physics step with [Modules] selection and 3-layer state."""
    Configurator.add_stream(
        "[Modules]\nNextsim::IThermodynamics = Nextsim::ThermoWinton\n"
    )
    phys = configured_physics()
    # SST at the freezing point (-mu*32 = -1.76): no relaxation ocean flux,
    # so the cold sky must grow the ice through conduction.
    prog = make_state(hice=0.5, cice=0.8, hsnow=0.05, sst=-1.76, sss=32,
                      tice=[-8.0, -5.0, -2.5])
    forcing = make_forcing(tair=-15, tdew=-16, pair=1e5, sw=0, lw=200,
                           mld=10, snowfall=0, wind=5)
    updated, diags = phys.step(prog, forcing, jnp.zeros((1, 1)), dt=600.0)
    # 3-layer state written: [Ts, T1, T2], all finite, below freezing.
    tice = np.asarray(updated.tice)
    assert tice.shape[0] == 3
    assert np.all(np.isfinite(tice))
    assert np.all(tice < 0.1)
    # Cold regime: total ice volume grew (new lateral ice at h0 = 0.25 m
    # lowers the MEAN thickness, so volume is the right growth metric).
    assert scalar(updated.hice) > 0.5


def test_winton_full_melt_thin_ice():
    thermo, out = call_winton(hi=0.012, hs=0.0, t1=-0.3, t2=-0.3, tice0=-0.1,
                              q_ia=-300.0, dq_dt=10.0, q_io=800.0, dt=3600.0)
    assert float(out.hi_true[0, 0]) == 0.0
    assert float(out.hs_true[0, 0]) == 0.0
