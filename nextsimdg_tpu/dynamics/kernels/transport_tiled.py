"""Temporally-blocked tiled Pallas kernel for the DG transport phase.

On >=1M-element grids the staged transport path re-streams ~40 planes per
RK stage from HBM (24 quadrature-velocity planes + K x T coefficients +
intermediates) and XLA's effective bandwidth degrades with working-set
size, making transport ~1/3 of the coupled step even at k=1 substep. This
kernel applies the same ghost-zone strategy as ``mevp_tiled``:

* tracer coefficients live PADDED by halo_x in one stacked
  (K*T, nx+2H, ny) HBM buffer (full-row tiles: tile_y = ny, NO lane halo
  — the y block edges are the true closed walls);
* each tile DMAs its halo'd block of (u, v, face_x, face_y) and the
  coefficients into VMEM, samples the quadrature velocity LOCALLY
  (``velocity_from_cg`` on the widened block — bit-identical to the
  global sampling in the valid region), runs n_sub RK substeps with the
  positivity (and optional TVB) limiter entirely on-chip, and DMAs back
  only the interior;
* per substep the valid interior shrinks by 2 rings (RK2 stencil), +2
  with the TVB slope limiter, +1 once for the block-edge velocity ring;
  ``K_CAP = (halo_x - 1) // rings_per_substep`` substeps run per round
  and a ``lax.while_loop`` chains rounds for larger CFL counts;
* the substep count and dt_sub arrive as SMEM scalars (the CFL count is
  a global reduction — computed OUTSIDE on the full velocity so every
  tile agrees and the result matches the staged path exactly).

Wall fluxes: the staged path zeroes the global x=0 / y=0 face fluxes with
an iota select. Inside a tile the local row-0 select lands on the
(discarded) halo ring, so the TRUE global wall columns are zeroed via the
effective face masks instead (column 0 of face_x/face_y pre-zeroed by the
caller) — numerically identical to the staged select.

Closed uniform meshes only (same scope as mevp_tiled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024
_VMEM_BUDGET = 96 * 1024 * 1024
_HALO_X = 8
#: Size floor for the auto gate. Measured (v5e, CG1 coupled 512^2, 16-step
#: scan): staged XLA 2.91 ms/step vs tiled 3.29 — below ~1M elements the
#: per-tile velocity re-sampling + halo redundancy outweigh the streaming
#: the kernel saves, and the fused coupled kernel covers small grids.
_MIN_ELEMENTS = 1_000_000


def _rings_per_substep(transport) -> int:
    """Valid-interior rings one substep consumes.

    Every SSP-RK *stage* evaluates the +-1-ring rhs once (rk1/rk2/rk3 =
    1/2/3 stages) and, when the TVB slope limiter is on, reads +-1-ring
    neighbor means once more per stage. The +1 block-edge velocity ring
    is accounted separately by the (halo - 1) budget.
    """
    stages = {"rk1": 1, "rk2": 2, "rk3": 3}[transport.scheme]
    return stages * (2 if transport.tvb_m is not None else 1)


def transport_tiled_config(model, n_tracers: int = 3):
    """(tile_x, halo_x, K_CAP) when the tiled transport kernel applies.

    Applies to the CG1 path (velocity re-sampled per tile from the u, v
    node planes) AND the higher-order path (the caller passes the
    CG2-sampled QuadVelocity, which rides the kernel as 24 extra
    constant planes). Under shard_map use ``transport_tiled_spmd_config``
    + ``transport_substeps_tiled_spmd`` instead.
    """
    mesh = model.mesh
    if not mesh.uniform and model.transport.tvb_m is not None:
        # The TVB tolerance M dx^2 would need per-element planes inside
        # the limiter; graded TVB configs keep the staged path.
        return None
    if any(axis is not None for axis in model.spmd):
        return None
    if mesh.n_elements < _MIN_ELEMENTS or mesh.ny % 128:
        return None
    n_dofs = model.transport.basis.n_dofs
    rings = _rings_per_substep(model.transport)
    k_cap = (_HALO_X - 1) // rings
    if k_cap < 1:
        return None
    # VMEM plane-equivalents: 4 consts + 2 K T coefficients (in + RK stage)
    # + 24 quadrature-velocity planes + the streamed-rhs live set
    # (~8 K T accumulators/traces) + slack (+5 metric planes on
    # graded/spherical meshes). Calibrated to the mevp_tiled budget
    # discipline.
    planes = 4 + 24 + 10 * n_dofs * n_tracers + 12
    if not mesh.uniform:
        planes += 5
    budget = _VMEM_BUDGET // (planes * 4)
    tile_x = 512
    while tile_x >= 8:
        if mesh.nx % tile_x == 0 and (tile_x + 2 * _HALO_X) * mesh.ny <= budget:
            return tile_x, _HALO_X, k_cap
        tile_x //= 2
    return None


def transport_substeps_tiled(
    model,  # CoupledModel (static: transport, mesh)
    tracers,  # (K, T, nx, ny) stacked DG coefficients
    u=None, v=None,  # (nx, ny) owned-node velocity (CG1 path)
    dt_sub=None,  # traced substep length (dt / k)
    k=None,  # traced int32 total substep count
    face_masks=None,  # optional (face_x, face_y) coastline masks
    interpret: bool = False,
    tile_x: int = None,
    qv=None,  # precomputed QuadVelocity (HO path) instead of (u, v)
    metric=None,  # explicit metric planes (spmd wrapper) overriding the mesh's
    wall_masks=None,  # TVB wall-delta masks (fwd_x, bwd_x, fwd_y, bwd_y)
):
    """Run k transport substeps via ghost-zone tiles; returns the tracers.

    Velocity enters one of two ways: ``(u, v)`` owned-node planes (the
    CG1 path — each tile re-samples the quadrature velocity locally,
    bit-identical to the global sampling in the valid region), or a
    precomputed ``qv`` (the HO path — its 24 quadrature planes ride the
    kernel as constants; the CG2 sampling stays outside).
    ``metric``: explicit per-element metric planes (the spmd wrapper
    passes the device's WIDENED local planes — the shim mesh is uniform,
    so they cannot be derived here).
    """
    from ..mesh import RectMesh
    from ..transport import DGTransport, QuadVelocity, velocity_from_cg

    mesh = model.mesh
    cfg = transport_tiled_config(model, n_tracers=tracers.shape[1])
    if tile_x is None:
        tile_x, halo_x, k_cap = cfg
    else:  # test override (tiny grids)
        halo_x = _HALO_X
        k_cap = (_HALO_X - 1) // _rings_per_substep(model.transport)
    nx, ny = mesh.nx, mesh.ny
    px_wrap = bool(mesh.periodic_x)
    py_wrap = bool(mesh.periodic_y)
    if nx % tile_x:
        raise ValueError(f"grid rows ({nx}) not divisible by tile_x ({tile_x})")
    n_ti = nx // tile_x
    block_x = tile_x + 2 * halo_x
    pad_x = nx + 2 * halo_x
    K, T = tracers.shape[0], tracers.shape[1]
    n_st = K * T
    dtype = tracers.dtype

    # Effective face masks: the global wall columns are zeroed here (the
    # staged path's iota select) — periodic axes have no walls; padded
    # rings are zero-filled on closed axes (no flux through out-of-domain
    # faces) and wrapped on periodic ones.
    ones = jnp.ones((nx, ny), dtype)
    fx = ones if face_masks is None else face_masks[0].astype(dtype)
    fy = ones if face_masks is None else face_masks[1].astype(dtype)
    if not px_wrap:
        fx = fx.at[0, :].set(0.0)
    if not py_wrap:
        fy = fy.at[:, 0].set(0.0)

    def pad2(arr):
        if px_wrap:
            return jnp.concatenate(
                [arr[-halo_x:], arr, arr[:halo_x]], axis=0
            )
        return jnp.pad(arr, ((halo_x, halo_x), (0, 0)))
    if qv is None:
        const_planes = [u, v, fx, fy]
        qv_counts = None
    else:
        # Precomputed quadrature velocity: flatten its 4 stacks into
        # constant planes (zero-padded rings = no flux out of domain).
        qv_counts = (
            qv.vx_vol.shape[0], qv.vy_vol.shape[0],
            qv.vn_x.shape[0], qv.vn_y.shape[0],
        )
        const_planes = (
            [fx, fy]
            + [qv.vx_vol[i] for i in range(qv_counts[0])]
            + [qv.vy_vol[i] for i in range(qv_counts[1])]
            + [qv.vn_x[i] for i in range(qv_counts[2])]
            + [qv.vn_y[i] for i in range(qv_counts[3])]
        )
    # Graded/spherical meshes: the 5 metric planes ride as extra consts
    # (zero rings = no flux/zero gradients in the discarded ghost zone —
    # every metric use in the rhs is a multiply).
    if metric is None:
        metric = model.transport.metric_planes(dtype)
    metric_names = tuple(sorted(metric)) if metric is not None else ()
    if metric is not None:
        const_planes = const_planes + [metric[name] for name in metric_names]
    # TVB wall-delta masks (spmd wrapper): 4 planes marking the TRUE
    # global wall rows/cols, which sit H rows inside the widened block
    # where the kernel-local iota select cannot find them. Zero-padded
    # rings mean "no zeroing" there (the ghost zone is discard space).
    n_wall = 0
    if wall_masks is not None:
        const_planes = const_planes + list(wall_masks)
        n_wall = 4
    n_const = len(const_planes)
    consts_stack = jnp.stack([pad2(a) for a in const_planes])
    states0 = jnp.stack([pad2(tracers[ki, ti]) for ki in range(K) for ti in range(T)])

    # Local transport operator on the widened block: closed x shifts (the
    # halo supplies the neighbor/wrap data); full-row tiles on a
    # periodic-y mesh wrap the lane dim IN-BLOCK (the block spans the
    # whole y extent). Non-uniform geometry travels entirely via the
    # metric const planes, so the shim mesh is a unit uniform mesh then.
    if metric is None:
        local_mesh = RectMesh(
            nx=block_x, ny=ny, dx=mesh.dx, dy=mesh.dy, periodic_y=py_wrap
        )
    else:
        local_mesh = RectMesh(
            nx=block_x, ny=ny, dx=1.0, dy=1.0, periodic_y=py_wrap
        )
    local_tr = DGTransport(
        local_mesh, degree=model.transport.basis.degree,
        scheme=model.transport.scheme, tvb_m=model.transport.tvb_m,
    )

    def kernel(nsub_ref, dt_ref, consts_ref, states_ref, out_ref, *rest):
        c_scr, s_scr, sems = rest
        ti = pl.program_id(0)
        row0 = ti * tile_x
        window = (slice(None), pl.ds(row0, block_x), slice(None))

        in_c = pltpu.make_async_copy(consts_ref.at[window], c_scr, sems.at[0])
        in_s = pltpu.make_async_copy(states_ref.at[window], s_scr, sems.at[1])
        in_c.start()
        in_s.start()
        in_c.wait()
        in_s.wait()

        # Global-edge tiles, closed x: fill the out-of-domain strips of
        # the state block with the REPLICATED wall row (fresh output
        # buffers have uninitialized rings). Fluxes through those strips
        # are already killed by the zeroed wall face masks / zero-padded
        # velocity; replication (not zeros) is what makes the TVB
        # limiter's mean differences vanish at the wall — exactly the
        # staged path's zero-gradient ghosts. Consts keep their padding.
        # Periodic x: the ghost strips are the OPPOSITE interior rows of
        # the padded buffer (wrap halos; interiors are always fresh) —
        # real data whose per-substep ring invalidation the K_CAP budget
        # already covers, so no refresh is needed either.
        if px_wrap:
            @pl.when(ti == 0)
            def _ghost_lo():
                cp = pltpu.make_async_copy(
                    states_ref.at[:, pl.ds(nx, halo_x), :],
                    s_scr.at[:, pl.ds(0, halo_x), :],
                    sems.at[3],
                )
                cp.start()
                cp.wait()

            @pl.when(ti == n_ti - 1)
            def _ghost_hi():
                cp = pltpu.make_async_copy(
                    states_ref.at[:, pl.ds(halo_x, halo_x), :],
                    s_scr.at[:, pl.ds(halo_x + tile_x, halo_x), :],
                    sems.at[3],
                )
                cp.start()
                cp.wait()
        else:
            @pl.when(ti == 0)
            def _ghost_lo():
                wall = s_scr[:, halo_x, :]
                s_scr[:, :halo_x, :] = jnp.broadcast_to(
                    wall[:, None, :], (n_st, halo_x, ny)
                )

            @pl.when(ti == n_ti - 1)
            def _ghost_hi():
                wall = s_scr[:, halo_x + tile_x - 1, :]
                s_scr[:, halo_x + tile_x :, :] = jnp.broadcast_to(
                    wall[:, None, :], (n_st, halo_x, ny)
                )

        if qv_counts is None:
            kmasks = (c_scr[2], c_scr[3])
            kqv = velocity_from_cg(local_mesh, local_tr.basis, c_scr[0], c_scr[1])
        else:
            kmasks = (c_scr[0], c_scr[1])
            o = 2
            nvx, nvy, nnx, nny = qv_counts
            kqv = QuadVelocity(
                vx_vol=c_scr[o : o + nvx],
                vy_vol=c_scr[o + nvx : o + nvx + nvy],
                vn_x=c_scr[o + nvx + nvy : o + nvx + nvy + nnx],
                vn_y=c_scr[o + nvx + nvy + nnx : o + nvx + nvy + nnx + nny],
            )
        kmetric = None
        if metric_names:
            base = n_const - n_wall - len(metric_names)
            kmetric = {
                name: c_scr[base + i] for i, name in enumerate(metric_names)
            }
        kwall = None
        if n_wall:
            wbase = n_const - n_wall
            kwall = tuple(c_scr[wbase + i] for i in range(4))
        psi = s_scr[:].reshape(K, T, block_x, ny)
        dt_s = dt_ref[0]

        is_first = ti == 0
        is_last = ti == n_ti - 1

        def refresh_ghosts(p):
            # Keep the zero-gradient wall ghosts valid THROUGH the substep
            # loop (a substep overwrites the ghost rows with garbage; the
            # wall rows themselves are valid interior for edge tiles and
            # their next limiter pass reads the ghost means). Periodic x:
            # ghosts are real wrap data — no refresh (ring invalidation
            # is budgeted by K_CAP).
            if px_wrap:
                return p
            lo = jnp.where(
                is_first,
                jnp.broadcast_to(p[:, :, halo_x : halo_x + 1, :], p[:, :, :halo_x, :].shape),
                p[:, :, :halo_x, :],
            )
            hi_row = halo_x + tile_x
            hi = jnp.where(
                is_last,
                jnp.broadcast_to(p[:, :, hi_row - 1 : hi_row, :], p[:, :, hi_row:, :].shape),
                p[:, :, hi_row:, :],
            )
            return jnp.concatenate([lo, p[:, :, halo_x:hi_row, :], hi], axis=2)

        def body(_, p):
            p = local_tr.step(
                p, kqv, dt_s, limit=True, face_masks=kmasks, metric=kmetric,
                wall_masks=kwall,
            )
            return refresh_ghosts(p)

        psi = jax.lax.fori_loop(0, nsub_ref[0], body, psi)
        s_scr[:] = psi.reshape(n_st, block_x, ny)

        out = pltpu.make_async_copy(
            s_scr.at[:, pl.ds(halo_x, tile_x), :],
            out_ref.at[:, pl.ds(halo_x + row0, tile_x), :],
            sems.at[2],
        )
        out.start()
        out.wait()

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_ti,),
        out_shape=jax.ShapeDtypeStruct((n_st, pad_x, ny), dtype),
        in_specs=[smem_spec(), smem_spec(), any_spec, any_spec],
        out_specs=any_spec,
        scratch_shapes=[
            pltpu.VMEM((n_const, block_x, ny), dtype),
            pltpu.VMEM((n_st, block_x, ny), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        # NO aliasing: later tiles read neighbors' PRE-round halo strips.
        interpret=interpret,
    )

    k = jnp.asarray(k, jnp.int32)
    dt_arr = jnp.asarray(dt_sub, dtype).reshape(1)

    def round_body(carry):
        states, done = carry
        n_sub = jnp.minimum(jnp.int32(k_cap), k - done)
        states = call(n_sub.reshape(1), dt_arr, consts_stack, states)
        return states, done + n_sub

    states, _ = jax.lax.while_loop(
        lambda c: c[1] < k, round_body, (states0, jnp.int32(0))
    )
    interior = states[:, halo_x : halo_x + nx, :]
    return interior.reshape(K, T, nx, ny)


def transport_tiled_spmd_config(model, n_tracers: int = 3, min_local: int = 65536):
    """(H, k_cap, tile_x) for the blocked shard_map wrapper, or None.

    ``H`` is the exchange-round ghost width (one ppermute pair per axis
    buys ``k_cap = (H - 1) // rings`` transport substeps run locally on
    the widened block by the single-chip tiled kernel), ``tile_x`` the
    kernel tile on the WIDENED block. TVB is excluded: its zero-gradient
    wall ghosts must track the evolving wall mean every substep, which
    the kernel can only do at ITS block edges, not at a global wall
    sitting H rows inside the widened block — the staged spmd path
    handles TVB configs.
    """
    mesh = model.mesh  # the per-device LOCAL block
    tr = model.transport
    # Non-uniform geometry is supported via a LocalMeshView (the device's
    # widened metric planes ride the kernel as 5 extra consts); a plain
    # non-uniform local mesh would replicate one block's static metric.
    if not (mesh.uniform or mesh.is_local_view):
        return None
    # Periodic global domains are fine (round 4): halo_widen's ring wrap
    # IS the periodic condition — the exchange strips carry the wrap
    # neighbors, the wall-face zeroing is skipped, and the single-chip
    # kernel runs the widened block closed exactly as on closed domains.
    if not any(axis is not None for axis in model.spmd):
        return None
    if tr.tvb_m is not None and not mesh.uniform:
        # Graded TVB would additionally need dx/dy tolerance planes inside
        # the kernel (the single-chip exclusion); staged path.
        return None
    if mesh.n_elements < min_local:
        return None
    rings = _rings_per_substep(tr)  # doubles under TVB (mean reads)
    n_dofs = tr.basis.n_dofs
    planes = 4 + 24 + 10 * n_dofs * n_tracers + 12
    if not mesh.uniform:
        planes += 5  # the widened metric const planes
    if tr.tvb_m is not None:
        planes += 4  # the widened wall-delta mask planes
    budget = _VMEM_BUDGET // (planes * 4)
    # H: sublane-aligned; larger H amortizes the exchange over more
    # substeps at ((n+2H)/n)^2 redundancy — with k rarely above ~8 the
    # smallest feasible H wins. The lane extent is zero-padded up to a
    # 128 multiple inside the wrapper (Mosaic full-slice alignment), so
    # only the VMEM budget sees it here.
    for H in (8, 16, 24, 32):
        if (H - 1) // rings < 1 or 2 * H >= min(mesh.nx, mesh.ny):
            continue
        nx_w = mesh.nx + 2 * H
        ny_w = mesh.ny + 2 * H
        ny_w += (-ny_w) % 128  # lane pad applied by the wrapper
        for tile_x in (512, 384, 256, 192, 128, 96, 64, 48, 32, 24, 16, 8):
            if (
                nx_w % tile_x == 0
                and tile_x % 8 == 0
                and (tile_x + 2 * _HALO_X) * ny_w <= budget
            ):
                return H, (H - 1) // rings, tile_x
    return None


def transport_banded_config(model, n_tracers: int = 3):
    """(band_w, band_g, tile_x) y-banding for lane extents too wide to
    tile well, or None when the full-width config is already good.

    Banding runs the substep rounds on ``ny / band_w`` lane bands
    widened by ``band_g`` ghost columns sliced from the neighboring
    bands (zero-filled at closed walls, wrapped when periodic); each
    substep invalidates ``rings_per_substep`` ghost rings, so
    ``(band_g - 1) // rings`` substeps run per restitch.

    MEASURED NEGATIVE RESULT (round 5, v5e): unlike the HO mEVP kernel
    (100 compute-dominated subcycles, where banding won 7.8x), the
    transport kernel is DMA-bound — at 16M, auto-banding the degenerate
    tile_x=16 config to (1024, 8, 128) measured 2-6% SLOWER
    (spherical_16m 9.88e7 -> 9.40e7; multihost_16m 1.16e8 -> 1.09e8):
    the 2x compute redundancy was free behind the streaming, and the
    per-step pad/stitch passes are not. Auto therefore engages banding
    ONLY for shapes the full-width kernel cannot serve at all; the
    backend stays explicitly selectable.
    """
    mesh, tr = model.mesh, model.transport
    if any(axis is not None for axis in model.spmd):
        return None
    if not mesh.uniform and tr.tvb_m is not None:
        return None
    if mesh.n_elements < _MIN_ELEMENTS:
        return None
    cfg = transport_tiled_config(model, n_tracers=n_tracers)
    if cfg is not None:
        return None  # any full-width tile beats banding (see above)
    rings = _rings_per_substep(tr)
    g = max(_HALO_X, rings + 1)  # >= 1 substep per restitch
    n_dofs = tr.basis.n_dofs
    planes = 4 + 24 + 10 * n_dofs * n_tracers + 12
    if not mesh.uniform:
        planes += 5
    if tr.tvb_m is not None:
        planes += 4
    budget = _VMEM_BUDGET // (planes * 4)
    best = None
    best_score = None
    for band_w in sorted(
        (d for d in range(256, min(mesh.ny // 2, 2048) + 1)
         if mesh.ny % d == 0),
        reverse=True,
    ):
        ext = band_w + 2 * g
        ext_pad = ext + (-ext) % 128
        for tile_x in (512, 384, 256, 192, 128, 96, 64):
            if mesh.nx % tile_x == 0 and (tile_x + 2 * _HALO_X) * ext_pad <= budget:
                score = (ext_pad / band_w) * ((tile_x + 2 * _HALO_X) / tile_x)
                if best_score is None or score < best_score:
                    best, best_score = (band_w, g, tile_x), score
                break
    return best


def transport_substeps_tiled_banded(
    model,  # CoupledModel (static; single device)
    tracers,  # (K, T, nx, ny) stacked DG coefficients
    u=None, v=None,  # (nx, ny) owned-node velocity (CG1 path)
    dt_sub=None,
    k=None,  # traced int32 total substep count
    face_masks=None,
    interpret: bool = False,
    qv=None,  # precomputed QuadVelocity (HO path)
    band=None,  # (band_w, band_g, tile_x) override (tests)
):
    """Single-device y-banded tiled transport (see transport_banded_config).

    Structure mirrors ``transport_substeps_tiled_spmd`` with LOCAL SLICES
    instead of ppermute: global wall zeroing is baked into the face masks
    (and TVB wall-delta masks) BEFORE the y-pad, the pad wraps on
    periodic y and zero-fills on closed y (zero masks = no flux = the
    wall treatment, so the lane pad and out-of-band ghosts are inert),
    and every band runs the single-chip kernel on its (nx, ext) block —
    band interiors stay exactly equal through ``(band_g - 1) // rings``
    substeps by the ghost-ring invalidation argument.
    """
    from types import SimpleNamespace

    from ..mesh import RectMesh
    from ..transport import DGTransport, QuadVelocity

    mesh, tr = model.mesh, model.transport
    band_w, g, tile_x = (
        band if band is not None
        else transport_banded_config(model, n_tracers=tracers.shape[1])
    )
    nx, ny = mesh.nx, mesh.ny
    if ny % band_w:
        raise ValueError(f"band width {band_w} does not divide ny={ny}")
    rings = _rings_per_substep(tr)
    k_cap = (min(g, _HALO_X) - 1) // rings
    if k_cap < 1:
        raise ValueError(f"band ghost g={g} too small for {tr.scheme}")
    n_bands = ny // band_w
    ext = band_w + 2 * g
    lane_pad = 0 if interpret else (-ext) % 128
    py_wrap = bool(mesh.periodic_y)
    dtype = tracers.dtype

    # Global wall zeroing BEFORE padding: the kernel's own local-edge
    # zeroing then lands on ghost/pad columns (discard space).
    ones = jnp.ones((nx, ny), dtype)
    fx = ones if face_masks is None else face_masks[0].astype(dtype)
    fy = ones if face_masks is None else face_masks[1].astype(dtype)
    if not py_wrap:
        fy = fy.at[:, 0].set(0.0)

    def pad_y(f):
        if py_wrap:
            f = jnp.concatenate([f[..., ny - g:], f, f[..., :g]], axis=-1)
        else:
            zeros = jnp.zeros(f.shape[:-1] + (g,), f.dtype)
            f = jnp.concatenate([zeros, f, zeros], axis=-1)
        return f

    def band_block(f, b):
        blk = jax.lax.slice_in_dim(
            f, b * band_w, b * band_w + ext, axis=f.ndim - 1
        )
        if lane_pad:
            blk = jnp.pad(
                blk, [(0, 0)] * (blk.ndim - 1) + [(0, lane_pad)]
            )
        return blk

    # Per-band constant planes, built once (padded once, sliced per band).
    fx_p, fy_p = pad_y(fx), pad_y(fy)
    if qv is None:
        u_p, v_p = pad_y(u), pad_y(v)
        vel_b = [dict(u=band_block(u_p, b), v=band_block(v_p, b))
                 for b in range(n_bands)]
    else:
        qv_p = QuadVelocity(
            vx_vol=pad_y(qv.vx_vol), vy_vol=pad_y(qv.vy_vol),
            vn_x=pad_y(qv.vn_x), vn_y=pad_y(qv.vn_y),
        )
        vel_b = [dict(qv=QuadVelocity(
            vx_vol=band_block(qv_p.vx_vol, b),
            vy_vol=band_block(qv_p.vy_vol, b),
            vn_x=band_block(qv_p.vn_x, b),
            vn_y=band_block(qv_p.vn_y, b),
        )) for b in range(n_bands)]
    metric_b = [{} for _ in range(n_bands)]
    local_metric = tr.metric_planes(dtype)
    if local_metric is not None:
        metric_p = {name: pad_y(p) for name, p in local_metric.items()}
        metric_b = [
            {"metric": {name: band_block(p, b)
                        for name, p in metric_p.items()}}
            for b in range(n_bands)
        ]
    tvb_b = [{} for _ in range(n_bands)]
    if tr.tvb_m is not None:
        # True wall locations baked globally; band-local edges are NOT
        # walls (their zero strips mean "no wall-delta zeroing", which is
        # correct: ghost zones are discard space).
        zeros = jnp.zeros((nx, ny), dtype)
        one = jnp.ones((), dtype)
        ix = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1)
        fwd_x = bwd_x = fwd_y = bwd_y = zeros
        if not mesh.periodic_x:
            fwd_x = jnp.where(ix == nx - 1, one, zeros)
            bwd_x = jnp.where(ix == 0, one, zeros)
        if not py_wrap:
            fwd_y = jnp.where(iy == ny - 1, one, zeros)
            bwd_y = jnp.where(iy == 0, one, zeros)
        walls_p = [pad_y(m) for m in (fwd_x, bwd_x, fwd_y, bwd_y)]
        tvb_b = [
            {"wall_masks": tuple(band_block(m, b) for m in walls_p)}
            for b in range(n_bands)
        ]

    local_mesh = RectMesh(
        nx=nx, ny=ext + lane_pad,
        dx=mesh.dx if mesh.uniform else 1.0,
        dy=mesh.dy if mesh.uniform else 1.0,
        periodic_x=mesh.periodic_x,  # x is never cut
    )
    local_model = SimpleNamespace(
        mesh=local_mesh,
        spmd=(None, None),
        transport=DGTransport(
            local_mesh, degree=tr.basis.degree, scheme=tr.scheme,
            tvb_m=tr.tvb_m,
        ),
    )

    k = jnp.asarray(k, jnp.int32)

    def round_body(carry):
        states, done = carry
        n_sub = jnp.minimum(jnp.int32(k_cap), k - done)
        padded = jax.tree.map(pad_y, states)
        outs = []
        for b in range(n_bands):
            got = transport_substeps_tiled(
                local_model, band_block(padded, b), dt_sub=dt_sub,
                k=n_sub,
                face_masks=(band_block(fx_p, b), band_block(fy_p, b)),
                interpret=interpret, tile_x=tile_x,
                **vel_b[b], **metric_b[b], **tvb_b[b],
            )
            outs.append(got[:, :, :, g : g + band_w])
        return jnp.concatenate(outs, axis=-1), done + n_sub

    states, _ = jax.lax.while_loop(
        lambda c: c[1] < k, round_body, (tracers, jnp.int32(0))
    )
    return states


def transport_substeps_tiled_spmd(
    model,  # CoupledModel on the LOCAL block (spmd axes set)
    tracers,  # (K, T, nx, ny) LOCAL stacked DG coefficients
    u=None, v=None,  # (nx, ny) owned-node velocity (CG1 path)
    dt_sub=None,  # traced substep length (dt / k)
    k=None,  # traced int32 total substep count (globally agreed via pmax)
    face_masks=None,  # optional LOCAL (face_x, face_y) coastline masks
    interpret: bool = False,
    H: int = None, tile_x: int = None,  # test overrides
    qv=None,  # precomputed QuadVelocity (HO path)
):
    """Ghost-zone tiled transport under shard_map.

    Per exchange round: widen the tracers + velocity + face masks by H
    ghost cells from the neighbor devices (ONE ppermute pair per axis),
    run ``k_cap = (H-1)//rings`` substeps on the widened block with the
    single-chip tiled kernel (closed local boundaries — the exchange
    already supplied neighbor data; each substep invalidates ``rings``
    ghost rings plus one block-edge velocity ring once), keep the
    interior, repeat until the traced ``k`` is exhausted. Global walls:
    the wall-face zeroing is baked into the face masks BEFORE widening
    (the staged path's iota select, traced per device), and the widened
    strips beyond a global wall are zeros with zero velocity/masks — no
    flux ever crosses, exactly the staged closed treatment.
    """
    from types import SimpleNamespace

    from ..mesh import RectMesh
    from ..stencil import halo_widen, is_global_edge
    from ..transport import DGTransport, QuadVelocity

    mesh = model.mesh
    tr = model.transport
    ax_x, ax_y = model.spmd
    px, py = mesh.periodic_x, mesh.periodic_y
    nx, ny = mesh.nx, mesh.ny
    dtype = tracers.dtype
    if H is None:
        cfg = transport_tiled_spmd_config(model, n_tracers=tracers.shape[1])
        H, k_cap, tile_x = cfg
    else:
        rings = _rings_per_substep(tr)
        k_cap = (H - 1) // rings
    if k_cap < 1:
        raise ValueError(f"exchange halo H={H} too small for {tr.scheme}")

    # Mosaic DMA alignment: full-extent lane slices must be 128-aligned
    # on hardware (observed: "Slice shape along dimension 2 must be
    # aligned to tiling (128), but is 1040"). Zero-pad the widened lane
    # extent up to the next 128 multiple; the pad sits BEYOND the real
    # ghost strips where the zero-padded face masks already enforce the
    # closed-wall treatment, so it is numerically inert.
    lane_pad = 0 if interpret else (-(ny + 2 * H)) % 128

    def widen(f):
        f = halo_widen(f, H, f.ndim - 2, px, ax_x)
        f = halo_widen(f, H, f.ndim - 1, py, ax_y)
        if lane_pad:
            f = jnp.pad(f, [(0, 0)] * (f.ndim - 1) + [(0, lane_pad)])
        return f

    # Effective face masks with the GLOBAL wall zeroing baked in before
    # the exchange (the staged path's iota + is_global_edge select).
    ones = jnp.ones((nx, ny), dtype)
    fx = ones if face_masks is None else face_masks[0].astype(dtype)
    fy = ones if face_masks is None else face_masks[1].astype(dtype)
    if not px:
        row0 = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0) == 0
        fx = jnp.where(row0 & is_global_edge(ax_x, "first"), 0.0, fx)
    if not py:
        col0 = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1) == 0
        fy = jnp.where(col0 & is_global_edge(ax_y, "first"), 0.0, fy)
    fx_w, fy_w = widen(fx), widen(fy)

    if qv is None:
        u_w, v_w = widen(u), widen(v)
        vel_kw = dict(u=u_w, v=v_w)
    else:
        qv_w = QuadVelocity(
            vx_vol=widen(qv.vx_vol), vy_vol=widen(qv.vy_vol),
            vn_x=widen(qv.vn_x), vn_y=widen(qv.vn_y),
        )
        vel_kw = dict(qv=qv_w)

    # Non-uniform geometry (LocalMeshView): the device's metric planes,
    # widened like every other const (ppermute strips carry the NEIGHBOR
    # metric; zero strips beyond global walls are inert — multiplies
    # only) and handed to the single-chip kernel explicitly, since the
    # shim mesh below is uniform.
    metric_kw = {}
    local_metric = tr.metric_planes(dtype)
    if local_metric is not None:
        metric_kw["metric"] = {
            name: widen(plane) for name, plane in local_metric.items()
        }

    # TVB (round 4): the limiter runs INSIDE the kernel on the widened
    # block, but the global walls sit H rows inside it where the kernel's
    # local iota select cannot see them — so the wall-delta zeroing rides
    # as 4 explicit mask planes, built here with the device's TRUE wall
    # locations (iota + is_global_edge, the staged path's select) and
    # widened like every other const (zero strips = no zeroing, correct:
    # the ghost zone is discard space; periodic axes have no walls and
    # their masks are all-zero).
    tvb_kw = {}
    if tr.tvb_m is not None:
        zeros = jnp.zeros((nx, ny), dtype)
        ix = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0)
        iy = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1)
        one = jnp.ones((), dtype)
        fwd_x = bwd_x = fwd_y = bwd_y = zeros
        if not px:
            fwd_x = jnp.where(
                (ix == nx - 1) & is_global_edge(ax_x, "last"), one, zeros
            )
            bwd_x = jnp.where(
                (ix == 0) & is_global_edge(ax_x, "first"), one, zeros
            )
        if not py:
            fwd_y = jnp.where(
                (iy == ny - 1) & is_global_edge(ax_y, "last"), one, zeros
            )
            bwd_y = jnp.where(
                (iy == 0) & is_global_edge(ax_y, "first"), one, zeros
            )
        tvb_kw["wall_masks"] = tuple(
            widen(m) for m in (fwd_x, bwd_x, fwd_y, bwd_y)
        )

    # The single-chip kernel's "model" on the widened (+lane-padded) block.
    local_mesh = RectMesh(
        nx=nx + 2 * H, ny=ny + 2 * H + lane_pad,
        dx=mesh.dx if mesh.uniform else 1.0,
        dy=mesh.dy if mesh.uniform else 1.0,
    )
    local_model = SimpleNamespace(
        mesh=local_mesh,
        spmd=(None, None),
        transport=DGTransport(
            local_mesh, degree=tr.basis.degree, scheme=tr.scheme,
            tvb_m=tr.tvb_m,
        ),
    )

    k = jnp.asarray(k, jnp.int32)

    def round_body(carry):
        states, done = carry
        n_sub = jnp.minimum(jnp.int32(k_cap), k - done)
        padded = widen(states)
        padded = transport_substeps_tiled(
            local_model, padded, dt_sub=dt_sub, k=n_sub,
            face_masks=(fx_w, fy_w), interpret=interpret, tile_x=tile_x,
            **vel_kw, **metric_kw, **tvb_kw,
        )
        return padded[:, :, H : H + nx, H : H + ny], done + n_sub

    states, _ = jax.lax.while_loop(
        lambda c: c[1] < k, round_body, (tracers, jnp.int32(0))
    )
    return states
