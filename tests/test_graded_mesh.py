"""Tensor-graded (variable-resolution) mesh tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from nextsimdg_tpu.dynamics import DGTransport, MEVPParams, MEVPSolver, RectMesh, VelocityState
from nextsimdg_tpu.dynamics.mevp import DynamicsForcing
from nextsimdg_tpu.dynamics.transport import sample_velocity


def graded_spacings(n, lo=1.0, hi=3.0):
    """Smoothly graded spacings summing like a stretched grid."""
    return lo + (hi - lo) * 0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))


def test_mesh_geometry_consistency():
    dx = graded_spacings(8)
    dy = graded_spacings(6, 2.0, 4.0)
    mesh = RectMesh(nx=8, ny=6, dx=dx, dy=dy)
    assert not mesh.uniform
    assert mesh.lx == pytest.approx(dx.sum())
    xn, yn = mesh.node_coords()
    np.testing.assert_allclose(np.diff(xn[:, 0]), dx)
    xc, yc = mesh.element_centers()
    np.testing.assert_allclose(xc[:, 0], xn[:-1, 0] + dx / 2)
    area = mesh.cell_area
    assert area.shape == (8, 6)
    np.testing.assert_allclose(area.sum(), mesh.lx * 0 + dx.sum() * dy.sum())


def test_uniform_mesh_still_scalar_spacing():
    mesh = RectMesh(nx=4, ny=4, dx=0.25, dy=0.25)
    assert mesh.uniform
    assert isinstance(mesh.dx, float)


def test_graded_transport_conserves_mass_exactly():
    n = 24
    dx = graded_spacings(n, 0.5, 2.0)
    dy = graded_spacings(n, 1.0, 1.5)
    mesh = RectMesh(nx=n, ny=n, dx=dx, dy=dy, periodic_x=True, periodic_y=True)
    tr = DGTransport(mesh, degree=2)
    vel = sample_velocity(
        mesh, tr.basis,
        lambda x, y: (np.ones_like(x) * 0.7, np.ones_like(y) * -0.4),
        dtype=jnp.float64,
    )
    lx, ly = mesh.lx, mesh.ly
    blob = lambda x, y: np.exp(
        -((x - 0.4 * lx) ** 2 + (y - 0.6 * ly) ** 2) / (0.02 * lx * ly)
    )
    psi = tr.project(blob, dtype=jnp.float64)
    mass0 = float(tr.total_mass(psi))
    for _ in range(40):
        psi = tr.step(psi, vel, 0.05, limit=True)
    np.testing.assert_allclose(float(tr.total_mass(psi)), mass0, rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(psi)))


def test_graded_constant_preserved():
    """A constant tracer stays constant under uniform velocity (consistency)."""
    n = 16
    mesh = RectMesh(
        nx=n, ny=n, dx=graded_spacings(n), dy=graded_spacings(n),
        periodic_x=True, periodic_y=True,
    )
    tr = DGTransport(mesh, degree=1)
    vel = sample_velocity(
        mesh, tr.basis, lambda x, y: (np.ones_like(x), 0.5 * np.ones_like(y)),
        dtype=jnp.float64,
    )
    psi = tr.project(lambda x, y: np.ones_like(x), dtype=jnp.float64)
    for _ in range(20):
        psi = tr.step(psi, vel, 0.05)
    np.testing.assert_allclose(np.asarray(psi[0]), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(psi[1:]), 0.0, atol=1e-10)


def test_graded_mevp_free_drift():
    """Free drift is metric-independent: graded mesh must reach the same
    drag balance as uniform."""
    n = 16
    dx = graded_spacings(n, 20e3, 50e3)
    mesh = RectMesh(nx=n, ny=n, dx=dx, dy=dx)
    params = MEVPParams(p_star=0.0, use_coriolis=False, alpha=40.0, beta=40.0)
    solver = MEVPSolver(mesh, params, backend="xla")
    h = jnp.full((n, n), 2.0, jnp.float64)
    a = jnp.full((n, n), 1.0, jnp.float64)
    forcing = DynamicsForcing(
        u_atm=jnp.full((n, n), 10.0, jnp.float64),
        v_atm=jnp.zeros((n, n), jnp.float64),
        u_ocean=jnp.zeros((n, n), jnp.float64),
        v_ocean=jnp.zeros((n, n), jnp.float64),
    )
    mask = solver.boundary_mask(dtype=jnp.float64)
    state = VelocityState.zeros(n, n, jnp.float64)
    for _ in range(40):
        state = solver.step(state, h, a, forcing, mask, dt=600.0, n_subcycles=60)
    expected = np.sqrt((1.225 * 1.2e-3) / (1026.0 * 5.5e-3)) * 10.0
    np.testing.assert_allclose(
        np.asarray(state.u)[5:-5, 5:-5], expected, rtol=2e-2
    )


def test_graded_mevp_box_stable_with_rheology():
    n = 16
    dx = graded_spacings(n, 20e3, 50e3)
    mesh = RectMesh(nx=n, ny=n, dx=dx, dy=dx[::-1].copy())
    solver = MEVPSolver(mesh, MEVPParams(use_coriolis=False), backend="xla")
    h = jnp.full((n, n), 2.0, jnp.float64)
    a = jnp.full((n, n), 1.0, jnp.float64)
    forcing = DynamicsForcing(
        u_atm=jnp.full((n, n), 10.0, jnp.float64),
        v_atm=jnp.zeros((n, n), jnp.float64),
        u_ocean=jnp.zeros((n, n), jnp.float64),
        v_ocean=jnp.zeros((n, n), jnp.float64),
    )
    mask = solver.boundary_mask(dtype=jnp.float64)
    state = VelocityState.zeros(n, n, jnp.float64)
    for _ in range(6):
        state = solver.step(state, h, a, forcing, mask, dt=600.0, n_subcycles=100)
    u = np.asarray(state.u)
    assert np.all(np.isfinite(u))
    assert np.max(np.abs(u)) < 0.8  # bounded, not blowing up
    # Compression at the downwind wall.
    assert np.mean(np.asarray(state.s11)[-3:, 4:-4]) < 0.0
