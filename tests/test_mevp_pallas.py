"""Pallas mEVP kernel: equivalence with the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextsimdg_tpu.dynamics import MEVPParams, MEVPSolver, RectMesh, VelocityState
from nextsimdg_tpu.dynamics.kernels import pallas_supported
from nextsimdg_tpu.dynamics.mevp import DynamicsForcing


def test_pallas_supported_thresholds():
    assert pallas_supported(256, 256)
    assert not pallas_supported(512, 512)
    assert not pallas_supported(2048, 2048)


def test_tiled_interpret_matches_xla_path():
    """Temporal-blocking tiled kernel == XLA path (16x16 grid, 8x8 tiles)."""
    n = 16
    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n)
    h = jnp.full((n, n), 2.0, dtype=jnp.float32)
    a = jnp.full((n, n), 0.9, dtype=jnp.float32)
    nodes = (n, n)
    forcing = DynamicsForcing(
        u_atm=jnp.full(nodes, 8.0, jnp.float32),
        v_atm=jnp.full(nodes, 2.0, jnp.float32),
        u_ocean=jnp.full(nodes, 0.02, jnp.float32),
        v_ocean=jnp.zeros(nodes, jnp.float32),
    )
    xla = MEVPSolver(mesh, MEVPParams(), backend="xla")
    tiled = MEVPSolver(mesh, MEVPParams(), backend="pallas-tiled-interpret")
    mask = xla.boundary_mask(dtype=jnp.float32)
    state = VelocityState.zeros(n, n, dtype=jnp.float32)

    # 10 subcycles = 2 rounds of 4 + 1 round of 2 at halo=4.
    out_xla = xla.step(state, h, a, forcing, mask, dt=600.0, n_subcycles=10)
    out_tiled = tiled.step(state, h, a, forcing, mask, dt=600.0, n_subcycles=10)

    for name in ("u", "v", "s11", "s22", "s12"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_tiled, name)),
            np.asarray(getattr(out_xla, name)),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )


def test_pallas_interpret_matches_xla_path():
    n = 16
    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n)
    h = jnp.full((n, n), 2.0, dtype=jnp.float32)
    a = jnp.full((n, n), 0.9, dtype=jnp.float32)
    nodes = (n, n)
    forcing = DynamicsForcing(
        u_atm=jnp.full(nodes, 8.0, jnp.float32),
        v_atm=jnp.full(nodes, 2.0, jnp.float32),
        u_ocean=jnp.full(nodes, 0.02, jnp.float32),
        v_ocean=jnp.zeros(nodes, jnp.float32),
    )
    xla = MEVPSolver(mesh, MEVPParams(), backend="xla")
    pallas = MEVPSolver(mesh, MEVPParams(), backend="pallas-interpret")
    mask = xla.boundary_mask(dtype=jnp.float32)
    state = VelocityState.zeros(n, n, dtype=jnp.float32)

    out_xla = xla.step(state, h, a, forcing, mask, dt=600.0, n_subcycles=25)
    out_pallas = pallas.step(state, h, a, forcing, mask, dt=600.0, n_subcycles=25)

    for name in ("u", "v", "s11", "s22", "s12"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_pallas, name)),
            np.asarray(getattr(out_xla, name)),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )
