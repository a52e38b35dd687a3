"""Positivity limiter tests (Zhang-Shu linear scaling)."""

import jax.numpy as jnp
import numpy as np

from nextsimdg_tpu.dynamics import DGTransport, RectMesh
from nextsimdg_tpu.dynamics.transport import sample_velocity


def _pointwise_min(transport, psi):
    mins = None
    for table in (
        transport._psi_vol, transport._psi_x0, transport._psi_x1,
        transport._psi_y0, transport._psi_y1,
    ):
        values = jnp.einsum("kq,kxy->qxy", table.astype(psi.dtype), psi)
        m = jnp.min(values, axis=0)
        mins = m if mins is None else jnp.minimum(mins, m)
    return mins


def test_limiter_restores_positivity_and_conserves_mean():
    mesh = RectMesh(nx=4, ny=4, dx=0.25, dy=0.25)
    tr = DGTransport(mesh, degree=2)
    # A polynomial that dips negative: small mean, large slope.
    psi = jnp.zeros((6, 4, 4), jnp.float64)
    psi = psi.at[0].set(0.1).at[1].set(1.0).at[4].set(-0.8)
    assert float(jnp.min(_pointwise_min(tr, psi))) < 0
    limited = tr.limit_positivity(psi)
    np.testing.assert_allclose(np.asarray(limited[0]), 0.1, rtol=1e-12)
    assert float(jnp.min(_pointwise_min(tr, limited))) >= -1e-12


def test_limiter_noop_on_positive_fields():
    mesh = RectMesh(nx=4, ny=4, dx=0.25, dy=0.25)
    tr = DGTransport(mesh, degree=2)
    psi = jnp.zeros((6, 4, 4), jnp.float64).at[0].set(1.0).at[1].set(0.1)
    limited = tr.limit_positivity(psi)
    np.testing.assert_allclose(np.asarray(limited), np.asarray(psi), rtol=1e-12)


def test_limited_advection_keeps_tracer_nonnegative():
    """Sharp blob under dG2: unlimited advection undershoots, limited doesn't."""
    n = 32
    mesh = RectMesh(nx=n, ny=n, dx=1.0 / n, dy=1.0 / n, periodic_x=True, periodic_y=True)
    tr = DGTransport(mesh, degree=2)
    vel = sample_velocity(
        mesh, tr.basis, lambda x, y: (np.ones_like(x), np.zeros_like(y)),
        dtype=jnp.float64,
    )
    blob = lambda x, y: np.where(
        (np.abs(x - 0.5) < 0.15) & (np.abs(y - 0.5) < 0.15), 1.0, 0.0
    )
    psi0 = tr.project(blob, dtype=jnp.float64)
    dt = 1.0 / 320

    psi_unlimited = psi0
    psi_limited = psi0
    for _ in range(60):
        psi_unlimited = tr.step(psi_unlimited, vel, dt)
        psi_limited = tr.step(psi_limited, vel, dt, limit=True)

    assert float(jnp.min(_pointwise_min(tr, psi_unlimited))) < -1e-3
    assert float(jnp.min(_pointwise_min(tr, psi_limited))) >= -1e-10
    # Conservation preserved by the limiter.
    np.testing.assert_allclose(
        float(tr.total_mass(psi_limited)), float(tr.total_mass(psi0)), rtol=1e-12
    )
