"""Dynamics module selection: mEVP default, FreeDrift via config."""

import jax.numpy as jnp
import numpy as np

from nextsimdg_tpu.config import Configurator, ConfiguredModule
from nextsimdg_tpu.coupled import CoupledModel
from nextsimdg_tpu.dynamics import FreeDriftSolver, MEVPSolver, RectMesh
from nextsimdg_tpu.modules import ModuleRegistry


def test_default_dynamics_is_mevp():
    mesh = RectMesh(nx=8, ny=8, dx=1e3, dy=1e3)
    model = CoupledModel(mesh)
    assert isinstance(model.mevp, MEVPSolver)


def test_freedrift_selected_from_config():
    Configurator.add_stream("[Modules]\nNextsim::IDynamics = Nextsim::FreeDrift\n")
    ModuleRegistry.get_loader().set_all_defaults()
    ConfiguredModule.parse_configurator()
    mesh = RectMesh(nx=8, ny=8, dx=1e3, dy=1e3)
    model = CoupledModel(mesh)
    assert isinstance(model.mevp, FreeDriftSolver)


def test_freedrift_coupled_step_reaches_drag_balance():
    from tests.test_coupled import build_model

    ModuleRegistry.get_loader().set_implementation(
        "Nextsim::IDynamics", "Nextsim::FreeDrift"
    )
    model, state, pf, df = build_model(n=8, n_sub=5)
    out = state
    for _ in range(20):
        out = model.step(out, pf, df, dt=600.0, do_thermo=False)
    u = np.asarray(out.velocity.u)
    # Free drift with 8 m/s wind: interior speed near the drag-balance value.
    expected = np.sqrt((1.225 * 1.2e-3) / (1026.0 * 5.5e-3)) * 8.0
    assert abs(np.median(u[2:-2, 2:-2]) - expected) < 0.3 * expected
    # No internal stress in free drift.
    np.testing.assert_allclose(np.asarray(out.velocity.s11), 0.0, atol=1e-12)
