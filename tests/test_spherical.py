"""Spherical lon-lat mesh: metric correctness of transport and dynamics.

The reference has no dynamics at all (SURVEY.md section 0); the spherical
metric follows the standard conservative flux form on the sphere:
d(psi)/dt + (1/(R cos(phi))) [d(u psi)/dlambda + d(cos(phi) v psi)/dphi] = 0,
implemented as per-face metric lengths + exact zone areas (mesh.py
SphericalMesh docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nextsimdg_tpu.dynamics import RectMesh
from nextsimdg_tpu.dynamics.mesh import EARTH_RADIUS, SphericalMesh
from nextsimdg_tpu.dynamics.transport import DGTransport, sample_velocity


def test_exact_zone_areas():
    mesh = SphericalMesh(16, 12, lon0=-20.0, lon1=20.0, lat0=60.0, lat1=84.0)
    total = float(np.sum(np.broadcast_to(mesh.cell_area, (16, 12))))
    lam = np.radians(40.0)
    expected = (
        EARTH_RADIUS ** 2 * lam * (np.sin(np.radians(84.0)) - np.sin(np.radians(60.0)))
    )
    np.testing.assert_allclose(total, expected, rtol=1e-12)
    # Poleward rows are smaller.
    areas = np.asarray(mesh.cell_area)[0]
    assert np.all(np.diff(areas) < 0)


def test_spherical_transport_conserves_mass():
    mesh = SphericalMesh(24, 20, lon0=0.0, lon1=30.0, lat0=55.0, lat1=80.0)
    transport = DGTransport(mesh, degree=1)
    # A rotating-ish velocity field sampled at quadrature points [m/s].
    fn = lambda x, y: (20.0 + 0.5 * np.sin(y / 4e5), -15.0 + 0.3 * np.cos(x / 4e5))
    vel = sample_velocity(mesh, transport.basis, fn, dtype=jnp.float64)
    k = transport.basis.n_dofs
    psi = jnp.zeros((k, 24, 20), jnp.float64).at[0].set(1.0)
    xc, yc = mesh.element_centers()
    bump = 1.0 + 0.5 * np.exp(
        -(((xc - xc.mean()) ** 2 + (yc - yc.mean()) ** 2) / (3e5) ** 2)
    )
    psi = psi.at[0].set(jnp.asarray(bump))
    total0 = float(transport.total_mass(psi))
    for _ in range(20):
        psi = transport.step(psi, vel, dt=300.0, limit=True)
    np.testing.assert_allclose(float(transport.total_mass(psi)), total0, rtol=1e-12)


def test_spherical_reduces_to_cartesian_at_equator():
    """A thin band at the equator (cos(phi) ~ 1) must match a Cartesian
    mesh of the same logical dimensions to O(phi_max^2) ~ 1e-5."""
    nx, ny = 20, 16
    half_deg = 0.25
    sph = SphericalMesh(nx, ny, lon0=0.0, lon1=1.0, lat0=-half_deg, lat1=half_deg)
    dx = EARTH_RADIUS * np.radians(1.0) / nx
    dy = EARTH_RADIUS * np.radians(2 * half_deg) / ny
    cart = RectMesh(nx=nx, ny=ny, dx=dx, dy=dy, x0=0.0, y0=-ny / 2 * dy)

    fn = lambda x, y: (5.0 + 0 * x, 2.0 + 0 * y)
    psi0 = np.zeros((3, nx, ny))
    psi0[0] = 1.0 + 0.3 * np.sin(2 * np.pi * np.arange(nx) / nx)[:, None]

    results = []
    for mesh in (sph, cart):
        transport = DGTransport(mesh, degree=1)
        vel = sample_velocity(mesh, transport.basis, fn, dtype=jnp.float64)
        psi = jnp.asarray(psi0)
        for _ in range(10):
            psi = transport.step(psi, vel, dt=200.0)
        results.append(np.asarray(psi[0]))
    np.testing.assert_allclose(results[0], results[1], atol=1e-4)


def test_rigid_rotation_zonal_advection_converges():
    """Rigid rotation about the pole (u = omega R cos(phi)) advects any
    profile uniformly in longitude; the dG1 error must converge ~2nd order."""
    omega = 2.0e-5  # rad/s
    errors = []
    for nx in (24, 48):
        ny = nx // 2
        mesh = SphericalMesh(
            nx, ny, lon0=0.0, lon1=360.0, lat0=60.0, lat1=75.0, periodic_x=True
        )
        transport = DGTransport(mesh, degree=1)
        lat2d, lon2d = mesh.lonlat_centers()
        u = omega * EARTH_RADIUS * np.cos(np.radians(lat2d))
        fn = lambda x, y: (
            omega * EARTH_RADIUS * np.cos(y / EARTH_RADIUS), 0.0 * x
        )
        vel = sample_velocity(mesh, transport.basis, fn, dtype=jnp.float64)
        k = transport.basis.n_dofs
        profile = lambda lon: 1.0 + 0.5 * np.sin(np.radians(lon))
        psi = jnp.zeros((k, nx, ny), jnp.float64).at[0].set(
            jnp.asarray(profile(lon2d))
        )
        t_total = np.radians(45.0) / omega  # rotate 45 degrees
        n_steps = 200
        for _ in range(n_steps):
            psi = transport.step(psi, vel, dt=t_total / n_steps)
        exact = profile(lon2d - 45.0)
        errors.append(float(jnp.max(jnp.abs(psi[0] - exact))))
    order = np.log2(errors[0] / errors[1])
    assert order > 1.5, (errors, order)


def test_meridional_flow_converges_poleward():
    """Constant northward v on uniform psi: the metric divergence
    -(1/(R cos phi)) d(cos phi v)/dphi = v tan(phi)/R must appear as the
    cell-mean tendency (flow convergence piles ice up toward the pole)."""
    mesh = SphericalMesh(8, 40, lon0=0.0, lon1=10.0, lat0=40.0, lat1=72.0)
    transport = DGTransport(mesh, degree=0)  # means only: pure metric effect
    v0 = 0.4
    fn = lambda x, y: (0.0 * x, v0 + 0.0 * y)
    vel = sample_velocity(mesh, transport.basis, fn, dtype=jnp.float64)
    psi = jnp.ones((1, 8, 40), jnp.float64)
    dt = 600.0
    out = transport.step(psi, vel, dt=dt)
    lat2d, _ = mesh.lonlat_centers()
    expected_rate = v0 * np.tan(np.radians(lat2d)) / EARTH_RADIUS
    measured_rate = (np.asarray(out[0]) - 1.0) / dt
    interior = (slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(
        measured_rate[interior], expected_rate[interior], rtol=2e-3
    )


def test_coupled_model_on_spherical_mesh():
    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.dynamics import MEVPParams
    from nextsimdg_tpu.dynamics.mevp import DynamicsForcing
    from nextsimdg_tpu.state import Forcing
    import jax

    mesh = SphericalMesh(16, 16, lon0=0.0, lon1=12.0, lat0=68.0, lat1=80.0)
    model = CoupledModel(mesh, degree=1, mevp_params=MEVPParams(), n_subcycles=10)
    state = model.initial_state(
        hice0=1.0, cice0=0.9, hsnow0=0.05, sst0=-1.6, sss0=32.0, dtype=jnp.float64
    )
    full = lambda v: jnp.full((16, 16), v, jnp.float64)
    pf = Forcing(
        tair=full(-10.0), dew2m=full(-12.0), pair=full(1e5), sw_in=full(10.0),
        lw_in=full(250.0), mld=full(10.0), snowfall=full(1e-4), wind=full(8.0),
    )
    df = DynamicsForcing(
        u_atm=full(8.0), v_atm=full(2.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    for _ in range(3):
        state = model.step(state, pf, df, dt=600.0)
    for leaf in jax.tree.leaves(state):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.max(jnp.abs(state.velocity.u))) > 0.0
    cice = np.asarray(state.cice[0])
    assert np.all(cice >= 0.0) and np.all(cice <= 1.0 + 1e-12)
