"""Diagnostics output + coupled-state checkpoint/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nextsimdg_tpu.io.coupled_restart import (
    load_coupled_state,
    load_time,
    save_coupled_state,
)
from nextsimdg_tpu.io.diagnostics import DiagnosticWriter, read_diagnostics


def test_diagnostic_writer_appends_time_slices(tmp_path):
    path = str(tmp_path / "diag.h5")
    with DiagnosticWriter(path, ("hice", "cice")) as writer:
        for step in range(3):
            writer.write(
                600.0 * step,
                {
                    "hice": np.full((4, 4), 0.1 * (step + 1)),
                    "cice": np.full((4, 4), 0.5),
                },
            )
    data = read_diagnostics(path)
    assert data["time"].tolist() == [0.0, 600.0, 1200.0]
    assert data["hice"].shape == (3, 4, 4)
    np.testing.assert_allclose(data["hice"][2], 0.3)


def test_coupled_checkpoint_roundtrip_and_resume(tmp_path):
    from tests.test_coupled import build_model

    model, state, pf, df = build_model(n=8, n_sub=10)
    state1 = model.step(state, pf, df, dt=600.0)

    path = str(tmp_path / "coupled.chk")
    save_coupled_state(path, state1, time=600.0)
    assert load_time(path) == 600.0
    restored = load_coupled_state(path, dtype=jnp.float64)
    for a, b in zip(jax.tree.leaves(state1), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-15)

    # Resume: continuing from the checkpoint equals an uninterrupted run.
    direct = model.step(state1, pf, df, dt=600.0)
    resumed = model.step(restored, pf, df, dt=600.0)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14)


def test_coupled_checkpoint_roundtrip_high_order(tmp_path):
    """CG2/dG1 velocity states (HOField planes) checkpoint and resume too."""
    from nextsimdg_tpu.dynamics.mevp_ho import HOVelocityState
    from nextsimdg_tpu.modules import ModuleRegistry

    ModuleRegistry.get_loader().set_implementation(
        "Nextsim::IDynamics", "Nextsim::MEVPHighOrder"
    )
    from tests.test_coupled import build_model

    model, state, pf, df = build_model(n=8, degree=1, n_sub=10)
    state1 = model.step(state, pf, df, dt=600.0)
    assert isinstance(state1.velocity, HOVelocityState)

    path = str(tmp_path / "coupled_ho.chk")
    save_coupled_state(path, state1, time=600.0)
    restored = load_coupled_state(path, dtype=jnp.float64)
    assert isinstance(restored.velocity, HOVelocityState)
    for a, b in zip(jax.tree.leaves(state1), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-15)

    direct = model.step(state1, pf, df, dt=600.0)
    resumed = model.step(restored, pf, df, dt=600.0)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14)
