"""Pallas mEVP kernel: equivalence with the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextsimdg_tpu.dynamics import MEVPParams, MEVPSolver, RectMesh, VelocityState
from nextsimdg_tpu.dynamics.kernels import pallas_supported
from nextsimdg_tpu.dynamics.mevp import DynamicsForcing


def test_pallas_supported_thresholds():
    # With the raised Mosaic scoped-VMEM cap (110 MB of the v5e core's
    # 128 MB physical VMEM) the single-block kernel covers up to 768^2;
    # 1024^2's residents + loop temporaries exceed physical VMEM.
    assert pallas_supported(256, 256)
    assert pallas_supported(512, 512)
    assert pallas_supported(768, 768)
    assert not pallas_supported(1024, 1024)
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


def test_tiled_full_row_interpret_matches_xla_path():
    """Full-row tiles (tile_y = ny, halo_y = 0: the block's y-edges ARE the
    closed walls, so no lane halo and no y-redundant compute) == XLA path."""
    from nextsimdg_tpu.dynamics.kernels.mevp_tiled import mevp_subcycles_tiled

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
    mask = xla.boundary_mask(dtype=jnp.float32)
    state = VelocityState.zeros(n, n, dtype=jnp.float32)
    out_xla = xla.step(state, h, a, forcing, mask, dt=600.0, n_subcycles=10)

    consts = xla.step_consts(state, h, a, forcing, mask, 600.0)
    carry0 = (state.u, state.v, state.s11, state.s22, state.s12)
    out = mevp_subcycles_tiled(
        xla, carry0, consts, 600.0, 10,
        tile_x=8, tile_y=n, halo_x=4, halo_y=0, interpret=True,
    )
    for k, name in enumerate(("u", "v", "s11", "s22", "s12")):
        np.testing.assert_allclose(
            np.asarray(out[k]),
            np.asarray(getattr(out_xla, name)),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )


def test_tiled_auto_config():
    from nextsimdg_tpu.dynamics.kernels.mevp_tiled import (
        _BLOCK_EQUIVALENTS_EXTRA, _TILED_VMEM_BUDGET, auto_config,
    )

    for n_consts in (7, 12):  # uniform / graded (5 metric planes)
        block_equivalents = 2 * (n_consts + 5) + _BLOCK_EQUIVALENTS_EXTRA
        for n in (2048, 4096, 8192):
            tile_x, tile_y, halo_x, halo_y = auto_config(n, n, n_consts=n_consts)
            # Full-row tiles: no lane halo, tile spans the whole y axis.
            assert tile_y == n and halo_y == 0
            assert n % tile_x == 0 and (tile_x + 2 * halo_x) % 8 == 0
            block_elems = (tile_x + 2 * halo_x) * tile_y
            assert block_elems * block_equivalents * 4 <= _TILED_VMEM_BUDGET
    # ny not lane-aligned and defaults don't divide -> unsupported.
    assert auto_config(100, 100) is None
    # Defaults fallback when rows are too long for full-row blocks but the
    # (128, 512) tiling divides.
    assert auto_config(512, 65536) == (128, 512, 8, 128)


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


def test_fused_dynamics_interpret_matches_staged_path():
    """The fully-fused dynamics kernel (mEVP + CG sampling + DG transport
    in one pallas_call) must reproduce the staged path."""
    import jax
    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.dynamics import MEVPParams, RectMesh
    from nextsimdg_tpu.dynamics.mevp import DynamicsForcing
    from nextsimdg_tpu.state import Forcing

    n = 16
    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n)
    dtype = jnp.float64
    full = lambda v: jnp.full((n, n), v, dtype)
    df = DynamicsForcing(
        u_atm=full(10.0), v_atm=full(3.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )

    models = {
        "staged": CoupledModel(mesh, degree=1, n_subcycles=15),
        "fused": CoupledModel(
            mesh, degree=1, n_subcycles=15, mevp_backend="pallas-interpret"
        ),
    }
    assert models["fused"]._fused_dynamics_mode() == "interpret"
    assert models["staged"]._fused_dynamics_mode() is None

    results = {}
    for name, model in models.items():
        state = model.initial_state(hice0=1.2, cice0=0.9, hsnow0=0.1, dtype=dtype)
        for _ in range(2):
            state = model.step(state, None, df, dt=600.0, do_thermo=False)
        results[name] = state

    for a, b in zip(
        jax.tree.leaves(results["staged"]), jax.tree.leaves(results["fused"])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13
        )


def test_fused_dynamics_with_land_mask_matches_staged_path():
    """Fused dynamics kernel with a land mask (coastline face masks enter
    the kernel as two extra constant planes) == staged path, exactly."""
    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.dynamics import RectMesh
    from nextsimdg_tpu.dynamics.mevp import DynamicsForcing

    n = 16
    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n)
    dtype = jnp.float64
    full = lambda v: jnp.full((n, n), v, dtype)
    df = DynamicsForcing(
        u_atm=full(10.0), v_atm=full(3.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    # An island + a straight coastline strip.
    ocean = np.ones((n, n))
    ocean[5:8, 6:10] = 0.0
    ocean[:, 0] = 0.0

    models = {
        "staged": CoupledModel(mesh, degree=1, n_subcycles=15, ocean_mask=ocean),
        "fused": CoupledModel(
            mesh, degree=1, n_subcycles=15, ocean_mask=ocean,
            mevp_backend="pallas-interpret",
        ),
    }
    assert models["fused"]._fused_dynamics_mode() == "interpret"
    assert models["staged"]._fused_dynamics_mode() is None

    results = {}
    for name, model in models.items():
        state = model.initial_state(hice0=1.2, cice0=0.9, hsnow0=0.1, dtype=dtype)
        for _ in range(2):
            state = model.step(state, None, df, dt=600.0, do_thermo=False)
        results[name] = state

    for a, b in zip(
        jax.tree.leaves(results["staged"]), jax.tree.leaves(results["fused"])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13
        )
    # The land mask must actually bite: tracer mean over land cells differs
    # from an unmasked run (guards against the masks being dropped).
    unmasked = CoupledModel(mesh, degree=1, n_subcycles=15)
    state_u = unmasked.initial_state(hice0=1.2, cice0=0.9, hsnow0=0.1, dtype=dtype)
    for _ in range(2):
        state_u = unmasked.step(state_u, None, df, dt=600.0, do_thermo=False)
    assert not np.allclose(
        np.asarray(results["fused"].hice), np.asarray(state_u.hice)
    )


def _tiled_transport_models(n=16, tvb_m=None, ocean=None, substeps=None, degree=1):
    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.dynamics import RectMesh

    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n)
    kw = dict(degree=degree, n_subcycles=15, tvb_m=tvb_m, ocean_mask=ocean)
    if substeps is not None:
        kw.update(auto_substeps=False, transport_substeps=substeps)
    return {
        "staged": CoupledModel(mesh, transport_backend="xla", **kw),
        "tiled": CoupledModel(mesh, transport_backend="tiled-interpret", **kw),
    }


@pytest.mark.parametrize(
    "case",
    ["plain", "mask", "tvb", "rounds", "dg2", "dg2_tvb"],
)
def test_tiled_transport_interpret_matches_staged_path(case):
    """Ghost-zone tiled transport kernel == staged XLA path, exactly.

    Cases: plain (auto CFL substeps), a land mask (coastline face masks
    enter the kernel as const planes), the TVB slope limiter (extra ring
    per RK stage), substeps=5 > K_CAP (multi-round while_loop chaining),
    and dG2 (SSP-RK3: 3 rings per substep — regression for the ring
    budget hard-coding the RK2 stencil) with and without TVB."""
    import jax
    from nextsimdg_tpu.dynamics.mevp import DynamicsForcing

    n = 16
    ocean = None
    kw = {}
    if case == "mask":
        ocean = np.ones((n, n))
        ocean[5:8, 6:10] = 0.0
        ocean[:, 0] = 0.0
    if case == "tvb":
        kw["tvb_m"] = 0.0
    if case == "rounds":
        kw["substeps"] = 5
    if case == "dg2":
        kw.update(degree=2, substeps=3)
    if case == "dg2_tvb":
        kw.update(degree=2, substeps=2, tvb_m=0.0)
    models = _tiled_transport_models(n=n, ocean=ocean, **kw)
    assert models["tiled"]._tiled_transport_mode() == "interpret"
    assert models["staged"]._tiled_transport_mode() is None

    dtype = jnp.float64
    full = lambda v: jnp.full((n, n), v, dtype)
    df = DynamicsForcing(
        u_atm=full(10.0), v_atm=full(3.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    results = {}
    for name, model in models.items():
        state = model.initial_state(hice0=1.2, cice0=0.9, hsnow0=0.1, dtype=dtype)
        for _ in range(2):
            state = model.step(state, None, df, dt=600.0, do_thermo=False)
        results[name] = state

    for a, b in zip(
        jax.tree.leaves(results["staged"]), jax.tree.leaves(results["tiled"])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13
        )


def test_tiled_cross_prefetch_and_deferred_writes_match_xla():
    """Exercise the cross-round prefetch + 2-tile-deferred write-back
    paths (ADVICE r02): full-row tiles with enough x-tiles that
    cross_prefetch AND defer_out are enabled (nx=64, tile_x=8, halo_x=4
    -> n_tiles=8, needed=1), over 11 subcycles = rounds of 4+4+3
    (a remainder round), in interpret mode against the XLA path."""
    import jax

    from nextsimdg_tpu.dynamics import MEVPParams, MEVPSolver, RectMesh, VelocityState
    from nextsimdg_tpu.dynamics.kernels import mevp_tiled
    from nextsimdg_tpu.dynamics.kernels.mevp_tiled import mevp_subcycles_tiled
    from nextsimdg_tpu.dynamics.mevp import DynamicsForcing

    # Static feasibility: this config must actually enable both flags.
    n_ti, n_tj = 64 // 8, 1
    needed = mevp_tiled._prefetch_needed(n_ti, n_tj, 0)
    assert (n_ti * n_tj - 2) >= needed  # cross_prefetch
    assert (n_ti * n_tj - 2) >= needed + 2  # defer_out

    nx, ny = 64, 16
    mesh = RectMesh(nx=nx, ny=ny, dx=512e3 / nx, dy=512e3 / ny)
    dtype = jnp.float64
    full = lambda v: jnp.full((nx, ny), v, dtype)
    h, a = full(2.0), full(0.95)
    df = DynamicsForcing(
        u_atm=full(10.0), v_atm=full(3.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    state = VelocityState.zeros(nx, ny, dtype)

    xla = MEVPSolver(mesh, MEVPParams(), backend="xla")
    mask = xla.boundary_mask(dtype)
    expected = xla.step(state, h, a, df, mask, 600.0, 11)

    consts = xla.step_consts(state, h, a, df, mask, 600.0)
    carry0 = (state.u, state.v, state.s11, state.s22, state.s12)
    out = jax.jit(
        lambda c, k: mevp_subcycles_tiled(
            xla, c, k, 600.0, 11,
            tile_x=8, tile_y=ny, halo_x=4, halo_y=0, interpret=True,
        )
    )(carry0, consts)
    for k, name in enumerate(("u", "v", "s11", "s22", "s12")):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(getattr(expected, name)),
            rtol=1e-12, atol=1e-13, err_msg=name,
        )


@pytest.mark.parametrize("periodic", [(True, False), (False, True), (True, True)])
@pytest.mark.parametrize("n", [16, 32])
def test_tiled_periodic_interpret_matches_xla(periodic, n):
    """Periodic domains on the tiled kernel: wrapped (modular) halo loads
    along x, in-block lane wrap along y (full-row tiles) == XLA path.
    n=32 gives 4 x-tiles — enough that cross-round prefetch WOULD engage
    (it must stay disabled under periodic x: tile 0's wrap strip depends
    on the LAST tile of the previous round; regression for the stale
    wrap-strip bug caught on hardware)."""
    from nextsimdg_tpu.dynamics.kernels.mevp_tiled import mevp_subcycles_tiled

    px, py = periodic
    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n,
                    periodic_x=px, periodic_y=py)
    dtype = jnp.float64
    full = lambda v: jnp.full((n, n), v, dtype)
    h, a = full(2.0), full(0.95)
    # Non-constant forcing so the wrap actually moves distinct data.
    import numpy as _np
    gx = jnp.asarray(_np.linspace(6.0, 10.0, n)[:, None] * _np.ones((1, n)))
    forcing = DynamicsForcing(
        u_atm=gx, v_atm=full(3.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    xla = MEVPSolver(mesh, MEVPParams(), backend="xla")
    mask = xla.boundary_mask(dtype)
    state = VelocityState.zeros(n, n, dtype)
    expected = xla.step(state, h, a, forcing, mask, 600.0, 10)

    consts = xla.step_consts(state, h, a, forcing, mask, 600.0)
    carry0 = (state.u, state.v, state.s11, state.s22, state.s12)
    out = mevp_subcycles_tiled(
        xla, carry0, consts, 600.0, 10,
        tile_x=8, tile_y=n, halo_x=4, halo_y=0, interpret=True,
    )
    for k, name in enumerate(("u", "v", "s11", "s22", "s12")):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(getattr(expected, name)),
            rtol=1e-12, atol=1e-13, err_msg=f"{name} periodic={periodic}",
        )


@pytest.mark.parametrize(
    "case", ["plain", "periodic", "mask", "tvb", "rounds", "spherical", "ho"]
)
def test_banded_transport_interpret_matches_staged_path(case):
    """Y-banded tiled transport (round 5: config-5-wide lanes get lane
    bands + sliced ghost columns instead of degenerate tile_x=16) ==
    staged XLA path exactly — incl. periodic wrap through the band pad,
    coastline masks, TVB wall-delta masks, multi-round restitching,
    spherical metric const planes, and the HO quadrature-velocity path."""
    import jax
    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.dynamics import RectMesh
    from nextsimdg_tpu.dynamics.mevp import DynamicsForcing
    from nextsimdg_tpu.state import Forcing

    n = 16
    ocean = None
    kw = dict(degree=1, n_subcycles=10)
    periodic = case == "periodic"
    if case == "mask":
        ocean = np.ones((n, n))
        ocean[5:8, 6:10] = 0.0
        ocean[:, 0] = 0.0
        kw["ocean_mask"] = ocean
    if case == "tvb":
        kw["tvb_m"] = 0.0
    if case == "rounds":
        kw.update(auto_substeps=False, transport_substeps=5)
    if case == "spherical":
        from nextsimdg_tpu.dynamics.mesh import SphericalMesh

        mesh = SphericalMesh(
            nx=n, ny=n, lon0=-20.0, lon1=20.0, lat0=60.0, lat1=80.0
        )
    else:
        mesh = RectMesh(
            nx=n, ny=n, dx=512e3 / n, dy=512e3 / n,
            periodic_x=periodic, periodic_y=periodic,
        )
    if case == "ho":
        from nextsimdg_tpu.modules import ModuleRegistry

        ModuleRegistry.get_loader().set_implementation(
            "Nextsim::IDynamics", "Nextsim::MEVPHighOrder"
        )
    try:
        staged = CoupledModel(mesh, transport_backend="xla", **kw)
        banded = CoupledModel(mesh, transport_backend="banded-interpret", **kw)
    finally:
        if case == "ho":
            ModuleRegistry.get_loader().reset()
    assert banded._tiled_transport_mode() == "interpret-banded"
    if case == "ho":
        assert banded.is_high_order

    dtype = jnp.float64
    full = lambda v: jnp.full((n, n), v, dtype)
    df = DynamicsForcing(
        u_atm=full(10.0), v_atm=full(3.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    results = {}
    for name, model in (("staged", staged), ("banded", banded)):
        state = model.initial_state(hice0=1.2, cice0=0.9, hsnow0=0.1, dtype=dtype)
        for _ in range(2):
            state = model.step(state, None, df, dt=600.0, do_thermo=False)
        results[name] = state

    for a, b in zip(
        jax.tree.leaves(results["staged"]), jax.tree.leaves(results["banded"])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13,
            err_msg=case,
        )


def test_transport_banded_config_gates_on_full_width():
    """Banding engages ONLY where the full-width kernel cannot run at
    all (measured round 5: the DMA-bound transport kernel is faster
    with a degenerate full-width tile than banded — negative result
    recorded in transport_banded_config)."""
    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.dynamics import RectMesh
    from nextsimdg_tpu.dynamics.kernels.transport_tiled import (
        transport_banded_config, transport_tiled_config,
    )

    # 16M with a servable (if degenerate) full-width tile: NO banding.
    model = CoupledModel(RectMesh(nx=4096, ny=4096, dx=4e3, dy=4e3), degree=1)
    assert transport_tiled_config(model) is not None
    assert transport_banded_config(model) is None

    # >=1M with a lane extent 128 cannot divide: full-width refuses,
    # banding serves it (the pad lives per band).
    model = CoupledModel(RectMesh(nx=4096, ny=4000, dx=4e3, dy=4e3), degree=1)
    assert transport_tiled_config(model) is None
    band = transport_banded_config(model)
    assert band is not None
    band_w, g, tile_x = band
    assert 4000 % band_w == 0 and tile_x >= 64

    # Small grids keep the staged/fused paths entirely.
    small = CoupledModel(RectMesh(nx=1024, ny=1024, dx=4e3, dy=4e3), degree=1)
    assert transport_banded_config(small) is None


def test_adaptive_alpha_rides_the_kernels():
    """adaptive_alpha traces through the shared subcycle_body, so the
    fused AND tiled kernels reproduce the XLA path with the per-node
    alpha plane computed in-register (no new const planes)."""
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
    params = MEVPParams(adaptive_alpha=True)
    xla = MEVPSolver(mesh, params, backend="xla")
    mask = xla.boundary_mask(dtype=jnp.float32)
    state = VelocityState.zeros(n, n, dtype=jnp.float32)
    out_xla = xla.step(state, h, a, forcing, mask, dt=600.0, n_subcycles=10)
    for backend in ("pallas-interpret", "pallas-tiled-interpret"):
        out_k = MEVPSolver(mesh, params, backend=backend).step(
            state, h, a, forcing, mask, dt=600.0, n_subcycles=10
        )
        for name in ("u", "v", "s11", "s22", "s12"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_k, name)),
                np.asarray(getattr(out_xla, name)),
                rtol=1e-5, atol=1e-6, err_msg=f"{backend}:{name}",
            )
