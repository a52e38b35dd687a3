"""Land-mask tests: impermeable coastlines, no-slip coastal nodes,
conservation in the presence of land."""

import jax.numpy as jnp
import numpy as np

from nextsimdg_tpu.coupled import CoupledModel
from nextsimdg_tpu.dynamics import RectMesh
from nextsimdg_tpu.dynamics.transport import face_masks_from_land
from tests.test_coupled import build_model


def island_mask(n):
    """Ocean grid with a square island in the middle."""
    mask = np.ones((n, n))
    q = n // 4
    mask[q : 2 * q, q : 2 * q] = 0.0
    return mask


def test_face_masks_block_coastline():
    mask = jnp.asarray(island_mask(8))
    fx, fy = face_masks_from_land(mask)
    # A face between ocean and land must be closed; ocean-ocean open.
    fx = np.asarray(fx)
    assert fx[2, 3] == 0.0  # land element (2,3)'s left face
    assert fx[4, 3] == 0.0  # face between land (3,3) and ocean (4,3)
    assert fx[5, 3] == 1.0  # ocean-ocean
    assert fx[1, 1] == 1.0


def test_coupled_with_island_conserves_and_keeps_land_empty():
    n = 16
    mask = island_mask(n)
    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n)
    model = CoupledModel(mesh, degree=1, n_subcycles=10, ocean_mask=mask)
    _, state0, pf, df = build_model(n=n, n_sub=10)

    # Start with ice only on the ocean.
    ocean = jnp.asarray(mask)
    state = state0
    state = type(state)(
        hice=state.hice * ocean, cice=state.cice * ocean, hsnow=state.hsnow * ocean,
        sst=state.sst, sss=state.sss, tice=state.tice,
        velocity=state.velocity, new_ice=state.new_ice,
    )

    mass0 = float(jnp.sum(state.hice[0] * ocean))
    out = state
    for _ in range(5):
        out = model.step(out, pf, df, dt=600.0, do_thermo=False)

    # No ice leaks onto land; total ice volume conserved (closed domain,
    # impermeable island, no thermodynamics).
    land = 1.0 - np.asarray(mask)
    assert np.max(np.abs(np.asarray(out.hice[0]) * land)) < 1e-12
    mass1 = float(jnp.sum(out.hice[0]))
    np.testing.assert_allclose(mass1, mass0, rtol=1e-10)
    # Coastal nodes are no-slip: velocity zero on nodes adjacent to land.
    u = np.asarray(out.velocity.u)
    q = n // 4
    assert np.max(np.abs(u[q : 2 * q + 1, q : 2 * q + 1])) == 0.0
