"""Graded/spherical metric planes riding the fused/tiled Pallas kernels.

Round-3 closure of VERDICT "Spherical/graded meshes are excluded from
every Pallas kernel": per-element metric planes travel as extra const
planes (the land-mask pattern), so the kernels and the staged/XLA paths
run identical math — asserted at 1e-12 in f64 interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextsimdg_tpu.dynamics import MEVPParams, MEVPSolver, RectMesh, VelocityState
from nextsimdg_tpu.dynamics.mesh import SphericalMesh
from nextsimdg_tpu.dynamics.mevp import DynamicsForcing


def graded_mesh(n=16):
    dx = 30e3 * (1.0 + 0.05 * np.arange(n))
    dy = 32e3 * (1.0 + 0.03 * np.arange(n)[::-1])
    return RectMesh(nx=n, ny=n, dx=dx, dy=dy)


def _cg1_setup(mesh, dtype=jnp.float64):
    n = mesh.nx
    full = lambda v: jnp.full((n, n), v, dtype)
    h, a = full(2.0), full(0.95)
    df = DynamicsForcing(
        u_atm=full(10.0), v_atm=full(3.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    return h, a, df, VelocityState.zeros(n, n, dtype)


@pytest.mark.parametrize("backend", ["pallas-interpret", "pallas-tiled-interpret"])
def test_cg1_kernels_match_xla_on_graded_mesh(backend):
    mesh = graded_mesh()
    h, a, df, state = _cg1_setup(mesh)
    xla = MEVPSolver(mesh, MEVPParams(), backend="xla")
    kern = MEVPSolver(mesh, MEVPParams(), backend=backend)
    mask = xla.boundary_mask(jnp.float64)

    out_xla = xla.step(state, h, a, df, mask, 600.0, 12)
    out_kern = kern.step(state, h, a, df, mask, 600.0, 12)
    for x, y in zip(jax.tree.leaves(out_xla), jax.tree.leaves(out_kern)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-12, atol=1e-13
        )


def test_cg1_fused_kernel_matches_xla_on_spherical_mesh():
    mesh = SphericalMesh(16, 16, lon0=0.0, lon1=12.0, lat0=68.0, lat1=78.0)
    h, a, df, state = _cg1_setup(mesh)
    xla = MEVPSolver(mesh, MEVPParams(), backend="xla")
    kern = MEVPSolver(mesh, MEVPParams(), backend="pallas-interpret")
    mask = xla.boundary_mask(jnp.float64)

    out_xla = xla.step(state, h, a, df, mask, 600.0, 12)
    out_kern = kern.step(state, h, a, df, mask, 600.0, 12)
    for x, y in zip(jax.tree.leaves(out_xla), jax.tree.leaves(out_kern)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-12, atol=1e-13
        )


@pytest.mark.parametrize("backend", ["pallas-interpret", "pallas-tiled-interpret"])
def test_ho_kernels_match_xla_on_graded_mesh(backend):
    from nextsimdg_tpu.dynamics.mevp_ho import (
        HODynamicsForcing, HOField, HOVelocityState, MEVPSolverHO,
    )

    mesh = graded_mesh()
    const = lambda v: HOField.from_function(mesh, lambda x, y: v + 0 * x)
    df = HODynamicsForcing(
        u_atm=const(10.0), v_atm=const(3.0),
        u_ocean=const(0.0), v_ocean=const(0.0),
    )
    n = mesh.nx
    h = jnp.full((n, n), 2.0, jnp.float64)
    a = jnp.full((n, n), 0.95, jnp.float64)
    state = HOVelocityState.zeros(n, n, jnp.float64)

    xla = MEVPSolverHO(mesh, MEVPParams(), backend="xla")
    kern = MEVPSolverHO(mesh, MEVPParams(), backend=backend)
    mask = xla.boundary_mask(jnp.float64)
    out_xla = xla.step(state, h, a, df, mask, 600.0, 10)
    out_kern = kern.step(state, h, a, df, mask, 600.0, 10)
    for x, y in zip(jax.tree.leaves(out_xla), jax.tree.leaves(out_kern)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-12, atol=1e-13
        )


def _coupled_setup(mesh, ocean_mask=None, transport_backend="auto"):
    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.state import Forcing

    model = CoupledModel(
        mesh, degree=1, n_subcycles=10, ocean_mask=ocean_mask,
        transport_backend=transport_backend,
    )
    state = model.initial_state(
        hice0=1.0, cice0=0.9, hsnow0=0.05, dtype=jnp.float64
    )
    n = mesh.nx
    full = lambda v: jnp.full((n, n), v, jnp.float64)
    pf = Forcing(
        tair=full(-10.0), dew2m=full(-12.0), pair=full(1e5), sw_in=full(10.0),
        lw_in=full(250.0), mld=full(10.0), snowfall=full(1e-4), wind=full(8.0),
    )
    df = DynamicsForcing(
        u_atm=full(8.0), v_atm=full(2.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    return model, state, pf, df


def _synthetic_coast(n):
    """A coastline mask: land in the lower-left quarter + an island."""
    mask = np.ones((n, n))
    mask[: n // 4, : n // 4] = 0.0
    mask[n // 2 : n // 2 + 2, n // 2 : n // 2 + 2] = 0.0
    return mask


def test_tiled_transport_matches_staged_on_spherical_mesh():
    """Coupled step on a spherical mesh WITH a land mask: the tiled
    transport kernel (metric + face-mask const planes) == staged path.
    Also the missing spherical+landmask interaction test (VERDICT Weak #4).
    """
    mesh = SphericalMesh(16, 16, lon0=0.0, lon1=12.0, lat0=68.0, lat1=78.0)
    coast = _synthetic_coast(16)
    ref_model, state, pf, df = _coupled_setup(mesh, ocean_mask=coast)
    tiled_model, _, _, _ = _coupled_setup(
        mesh, ocean_mask=coast, transport_backend="tiled-interpret"
    )
    assert tiled_model._tiled_transport_mode() == "interpret"

    expected = ref_model.step(state, pf, df, dt=600.0)
    got = tiled_model.step(state, pf, df, dt=600.0)
    for x, y in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-11, atol=1e-12
        )
    # Land cells stay empty of ice flux: velocity is no-slip at the coast.
    land = coast == 0.0
    assert np.all(np.abs(np.asarray(got.velocity.u)[land]) == 0.0)


def test_spherical_landmask_conservation():
    """Ice volume is conserved under pure transport on a spherical mesh
    with a coastline (impermeable faces x exact zone areas)."""
    mesh = SphericalMesh(16, 16, lon0=0.0, lon1=12.0, lat0=68.0, lat1=78.0)
    coast = _synthetic_coast(16)
    model, state, pf, df = _coupled_setup(mesh, ocean_mask=coast)
    mass0 = float(model.transport.total_mass(state.hice))
    out = state
    for _ in range(3):
        out = model.step(out, pf, df, dt=600.0, do_thermo=False)
    mass1 = float(model.transport.total_mass(out.hice))
    np.testing.assert_allclose(mass1, mass0, rtol=1e-10)
    assert np.all(np.isfinite(np.asarray(out.hice)))
