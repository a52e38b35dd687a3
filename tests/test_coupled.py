"""Coupled model tests: full step, on-device scan, multi-device SPMD.

The multi-device cases run on the virtual 8-device CPU mesh (conftest) and
pin the core distributed contract: sharded execution must reproduce
single-device results.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nextsimdg_tpu.coupled import CoupledModel, CoupledState
from nextsimdg_tpu.dynamics import MEVPParams, RectMesh
from nextsimdg_tpu.dynamics.mevp import DynamicsForcing
from nextsimdg_tpu.parallel import SpatialPartition, make_spatial_mesh
from nextsimdg_tpu.state import Forcing


def build_model(n=16, degree=1, n_sub=20, dtype=jnp.float64):
    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n)
    model = CoupledModel(mesh, degree=degree, n_subcycles=n_sub)
    state = model.initial_state(
        hice0=1.0, cice0=0.9, hsnow0=0.05, sst0=-1.6, sss0=32.0, dtype=dtype
    )
    nx, ny = mesh.nx, mesh.ny
    full = lambda v: jnp.full((nx, ny), v, dtype=dtype)
    phys_forcing = Forcing(
        tair=full(-10.0), dew2m=full(-12.0), pair=full(1e5), sw_in=full(10.0),
        lw_in=full(250.0), mld=full(10.0), snowfall=full(1e-4), wind=full(8.0),
    )
    nodes = (nx, ny)
    nfull = lambda v: jnp.full(nodes, v, dtype=dtype)
    dyn_forcing = DynamicsForcing(
        u_atm=nfull(8.0), v_atm=nfull(2.0), u_ocean=nfull(0.02), v_ocean=nfull(0.0)
    )
    return model, state, phys_forcing, dyn_forcing


def test_coupled_step_runs_and_preserves_shapes():
    model, state, pf, df = build_model()
    out = model.step(state, pf, df, dt=600.0)
    assert out.hice.shape == state.hice.shape
    assert out.velocity.u.shape == state.velocity.u.shape
    for leaf in jax.tree.leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # Something happened: velocity moved, thermodynamics changed tice.
    assert float(jnp.max(jnp.abs(out.velocity.u))) > 0
    assert float(jnp.max(jnp.abs(out.tice - state.tice))) > 0


def test_coupled_bounds_respected():
    model, state, pf, df = build_model(n_sub=40)
    out = model.run(state, pf, df, dt=600.0, n_steps=5)
    cice = np.asarray(out.cice[0])
    hice = np.asarray(out.hice[0])
    assert np.all(cice >= 0.0) and np.all(cice <= 1.0 + 1e-12)
    assert np.all(hice >= 0.0)


def test_coupled_run_scan_matches_python_loop():
    model, state, pf, df = build_model(n=8, n_sub=10)
    scanned = model.run(state, pf, df, dt=600.0, n_steps=3)
    looped = state
    for _ in range(3):
        looped = model.step(looped, pf, df, dt=600.0)
    for a, b in zip(jax.tree.leaves(scanned), jax.tree.leaves(looped)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14)


def test_dynamics_only_and_thermo_only_paths():
    model, state, pf, df = build_model(n=8, n_sub=10)
    dyn_only = model.step(state, pf, df, dt=600.0, do_thermo=False)
    np.testing.assert_array_equal(np.asarray(dyn_only.tice), np.asarray(state.tice))
    thermo_only = model.step(state, pf, df, dt=600.0, do_dynamics=False)
    np.testing.assert_array_equal(
        np.asarray(thermo_only.velocity.u), np.asarray(state.velocity.u)
    )


def test_multi_device_sharded_step_matches_single_device():
    """The SPMD contract: sharded == unsharded, bit-for-bit-ish (f64)."""
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    model, state, pf, df = build_model(n=16, n_sub=10)

    single = model.step(state, pf, df, dt=600.0)

    mesh = make_spatial_mesh((4, 2))
    part = SpatialPartition(mesh)
    state_sharded = part.shard(state)
    pf_sharded = part.shard(pf)
    df_sharded = part.shard(df)
    sharded = model.step(state_sharded, pf_sharded, df_sharded, dt=600.0)

    for a, b, path in zip(
        jax.tree.leaves(single),
        jax.tree.leaves(sharded),
        [str(p) for p, _ in jax.tree_util.tree_leaves_with_path(single)],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-11, atol=1e-12, err_msg=path
        )


def test_multi_device_multi_step_transport_and_mevp():
    """Several sharded coupled steps stay finite and match unsharded."""
    model, state, pf, df = build_model(n=16, degree=2, n_sub=10)
    single = model.run(state, pf, df, dt=300.0, n_steps=4)

    mesh = make_spatial_mesh((2, 4))
    part = SpatialPartition(mesh)
    sharded = model.run(
        part.shard(state), part.shard(pf), part.shard(df), dt=300.0, n_steps=4
    )
    for a, b in zip(jax.tree.leaves(single), jax.tree.leaves(sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-11)


def test_cfl_substeps_counts():
    """cfl_substeps: k=1 for slow flow, grows with speed, floor respected."""
    import jax.numpy as jnp

    from nextsimdg_tpu.dynamics import RectMesh
    from nextsimdg_tpu.dynamics.transport import QuadVelocity, cfl_substeps

    mesh = RectMesh(nx=8, ny=8, dx=2000.0, dy=2000.0)
    qv = lambda s: QuadVelocity(
        vx_vol=jnp.full((9, 8, 8), s), vy_vol=jnp.zeros((9, 8, 8)),
        vn_x=jnp.full((3, 8, 8), s), vn_y=jnp.zeros((3, 8, 8)),
    )
    # nu = s * 600 / 2000; dG1 limit C = 0.7/3.
    assert int(cfl_substeps(qv(0.1), 600.0, mesh, 1)) == 1
    assert int(cfl_substeps(qv(1.5), 600.0, mesh, 1)) == 2
    assert int(cfl_substeps(qv(0.0), 600.0, mesh, 1, k_floor=3)) == 3
    assert int(cfl_substeps(qv(1e6), 600.0, mesh, 1, k_max=16)) == 16


def test_wind8_box_stays_finite_without_hand_set_substeps():
    """The wind-8 box exceeded the dG1/RK2 advective CFL near step 800 in
    round 1 and required hand-set transport_substeps; with CFL-adaptive
    substepping (the default) a long run stays finite and bounded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.dynamics import RectMesh
    from nextsimdg_tpu.dynamics.mevp import DynamicsForcing

    n = 32
    # Same physical extent/step as the headline box: dx = 2 km, dt = 600 s.
    mesh = RectMesh(nx=n, ny=n, dx=2000.0, dy=2000.0)
    model = CoupledModel(mesh, degree=1, n_subcycles=20)
    assert model.auto_substeps
    state = model.initial_state(hice0=1.0, cice0=0.9, hsnow0=0.05)
    full = lambda v: jnp.full((n, n), v, jnp.float32)
    df = DynamicsForcing(
        u_atm=full(8.0), v_atm=full(8.0), u_ocean=full(0.1), v_ocean=full(0.0)
    )
    # 2000+ steps on device; the small box reaches its terminal drift speed
    # far sooner than the 256^2 domain does.
    state = model.run(state, None, df, dt=600.0, n_steps=2000, do_thermo=False)
    for leaf in jax.tree.leaves(state):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert float(jnp.max(state.cice[0])) <= 1.0 + 1e-6
    # Bounded, not blown up (isolated near-zero-thickness ice-edge nodes
    # carry a few m/s of classic mEVP edge noise; blow-up would be inf/nan
    # or orders of magnitude larger).
    assert float(jnp.max(jnp.abs(state.velocity.u))) < 5.0
