"""Temporally-blocked tiled Pallas kernel for large-grid HIGHER-ORDER mEVP.

Same ghost-zone strategy as ``mevp_tiled`` applied to the CG2/dG1 solver
(the real neXtSIM_DG discretization): the 17 state planes (4+4 CG2
velocity planes, 3x3 dG1 stress coefficients) and 29 constant planes live
PADDED by halo_x in stacked HBM buffers; full-row tiles (tile_y = ny,
no lane halo — block y-edges are the true closed walls) DMA their halo'd
blocks into VMEM, run halo_x subcycles on-chip via the shared
``MEVPSolverHO.subcycle_body`` (each subcycle's gather/scatter pair
invalidates one ring, so the interior stays exact), and DMA back only the
interiors. Zero ghost strips ARE the closed boundary (zero ``active``
pins ghost nodes at rest; zero strains/stresses contribute nothing).

ALL ceil(n_subcycles / halo_x) rounds run inside ONE pallas_call over a
(rounds, ti) grid (the CG1 ``mevp_tiled`` structure): the padded state
ping-pongs between two HBM slots (round r reads slot r%2, writes slot
1-r%2), both slots' halo rings are zeroed once on entry and only
interiors are ever written, so the closed-boundary zeros persist for
every round with no host round-trip, re-pad, or XLA copy between rounds.
When the tile count statically clears the stencil-reach hazard (n_ti >=
4), input blocks of tile g+2 are prefetched across round boundaries and
the interior write-back of tile g is retired one tile late (from a
staging buffer), keeping every DMA — including the round-leading first
load and the write-backs that the chained per-round form exposed —
behind another tile's subcycle compute.

The single-block fused HO kernel (``mevp_ho_pallas``) covers ~371^2; this
kernel extends the VMEM-resident subcycle loop to >=1M-element HO grids,
where the XLA path re-streams all 46 planes per subcycle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cg2basis import PLANES

#: This kernel needs every byte of the 128 MB core: at the production
#: 1024^2 config (block 144, 29 consts) the double-buffered input blocks
#: + interior staging + the HO body's Mosaic stack measure 111.3 MB
#: (the 110 MB cap used elsewhere OOMs by 2.4 MB with block-wide
#: staging). 120 MB leaves ~9 MB for Mosaic's own overheads.
_VMEM_LIMIT = 120 * 1024 * 1024
#: The fused ping-pong form budgets 2x(n_consts + 17) double-buffered
#: input blocks + 17 interior-rows staging blocks (deferred write-backs)
#: + the Mosaic stack census below against the raised cap.
_TILED_VMEM_BUDGET = 104 * 1024 * 1024
#: Mosaic stack temporaries of the HO body (the Gauss-point stacks
#: halved with the 2x2 constitutive rule; same census as mevp_ho_pallas).
_STACK_EQUIVALENTS = 65


def ho_tiled_config(nx: int, ny: int, n_consts: int = 29):
    """(tile_x, halo_x) full-row tile config, or None if unsupported.

    Dims are budgeted at the next (64, 128)-multiple: non-aligned extents
    ride the kernel via inert zero padding (zero ``active``/strength/dt_m
    pin pad nodes at rest and contribute zero stress — the closed-wall
    zeros, sideways/downward). This is what lets the blocked exchange's
    widened local blocks (local extent + 2H, never tile-aligned) use
    this kernel at all, and x-padding to 64 keeps proper tile widths
    (528 raw admits only tile_x = 16 — 2x halo redundancy — where 576
    padded admits 64).
    """
    nx = -(-nx // 64) * 64
    ny = -(-ny // 128) * 128
    budget = _TILED_VMEM_BUDGET // (
        (2 * (n_consts + 17) + 17 + _STACK_EQUIVALENTS) * 4
    )
    best = None
    best_cost = None
    for halo_x in (8, 16, 32):
        tile_x = 512
        while tile_x >= 8:
            if (
                nx % tile_x == 0
                and (tile_x + 2 * halo_x) % 8 == 0
                and (tile_x + 2 * halo_x) * ny <= budget
            ):
                # Same cost shape as mevp_tiled.auto_config: VPU compute
                # x redundancy + per-round HBM traffic amortized over
                # halo_x subcycles.
                redundancy = (tile_x + 2 * halo_x) / tile_x
                cost = redundancy * (1.0 + 2.0 / halo_x)
                if best_cost is None or cost < best_cost:
                    best = (tile_x, halo_x)
                    best_cost = cost
                break
            tile_x //= 2
    return best


def _flatten_state(carry):
    u, v, s11, s22, s12 = carry
    return (
        [getattr(u, k) for k in PLANES]
        + [getattr(v, k) for k in PLANES]
        + [s11[i] for i in range(3)]
        + [s22[i] for i in range(3)]
        + [s12[i] for i in range(3)]
    )


def _unflatten_state(planes):
    from ..mevp_ho import HOField

    u = HOField(**{k: planes[i] for i, k in enumerate(PLANES)})
    v = HOField(**{k: planes[4 + i] for i, k in enumerate(PLANES)})
    s11 = jnp.stack(planes[8:11])
    s22 = jnp.stack(planes[11:14])
    s12 = jnp.stack(planes[14:17])
    return (u, v, s11, s22, s12)


def ho_subcycles_tiled(
    solver,  # MEVPSolverHO (static; carries mesh + params + tables)
    carry0,  # (u: HOField, v: HOField, s11, s22, s12)
    consts: dict,  # the 29 per-step constant planes (step_consts)
    dt: float,
    n_subcycles: int,
    tile_x: int = None,
    halo_x: int = None,
    interpret: bool = False,
):
    """Run n_subcycles via full-row ghost-zone tiles; returns the carry."""
    state_planes = _flatten_state(carry0)
    nx_out, ny_out = state_planes[0].shape
    dtype = state_planes[0].dtype
    # Periodic axes (round 4, ported from the CG1 tiled kernel): x wraps
    # via modular-offset state-strip DMAs + wrap-padded consts; y wraps
    # IN-BLOCK (full-row tiles span the whole y extent, so jnp.roll in
    # the lane dim IS the periodic condition). Both exclude the inert
    # padding below — a wrap through zero pad rows/lanes would be wrong —
    # so the gate in mevp_ho._kernel_choice requires aligned extents.
    px_wrap = bool(solver.mesh.periodic_x)
    py_wrap = bool(solver.mesh.periodic_y)
    # Round extents up to (64 sublanes, 128 lanes); the pad strips are
    # inert (zero active/strength/dt_m pin pad nodes at rest and
    # contribute zero stress — the closed-wall zeros, sideways). Interop
    # note: the node line at the real|pad interface was previously the
    # IMPLICIT wall of the owned-node layout; stored and zero-pinned it
    # feeds the real interior the exact same zeros.
    nx = -(-nx_out // 64) * 64
    ny = -(-ny_out // 128) * 128
    row_pad, lane_pad = nx - nx_out, ny - ny_out
    if px_wrap and row_pad:
        raise ValueError("periodic_x requires nx to be a 64-multiple")
    if py_wrap and lane_pad:
        raise ValueError("periodic_y requires ny to be a 128-multiple")
    if row_pad or lane_pad:
        state_planes = [
            jnp.pad(p, ((0, row_pad), (0, lane_pad))) for p in state_planes
        ]
        consts = {
            name: jnp.pad(value, ((0, row_pad), (0, lane_pad)))
            for name, value in consts.items()
        }
    if tile_x is None:
        # Budget with the TRUE const count: graded/spherical (+4) and
        # A-weighted (+4) runs carry 33/37 planes, and a tile budgeted
        # for 29 can blow the Mosaic VMEM margin (advisor r3 finding).
        tile_x, halo_x = ho_tiled_config(nx, ny, n_consts=len(consts))
    if nx % tile_x:
        raise ValueError(f"grid rows ({nx}) not divisible by tile_x ({tile_x})")
    n_ti = nx // tile_x
    block_x = tile_x + 2 * halo_x
    pad_x = nx + 2 * halo_x
    const_names = tuple(sorted(consts))
    n_c = len(const_names)
    n_s = len(state_planes)  # 17

    # Consts: zero halo pad (closed walls) or wrap pad (periodic x — the
    # rings then hold the true wrap neighbors and never go stale, since
    # consts are never written).
    def pad2(arr):
        if px_wrap:
            return jnp.concatenate(
                [arr[-halo_x:], arr, arr[:halo_x]], axis=0
            )
        return jnp.pad(arr, ((halo_x, halo_x), (0, 0)))

    consts_stack = jnp.stack([pad2(consts[name]) for name in const_names])

    # The per-block subcycle body: closed x shifts (the halo supplies the
    # neighbor/wrap data); full-row tiles on a periodic-y mesh WRAP the
    # lane dim in-block. Never trace with the caller's mesh flags — a
    # periodic_x roll inside a block slice would wrap block-locally.
    from ..mesh import RectMesh
    from ..mevp_ho import MEVPSolverHO

    body_solver = MEVPSolverHO(
        RectMesh(
            nx=block_x, ny=ny,
            dx=solver.mesh.dx if solver.mesh.uniform else 1.0,
            dy=solver.mesh.dy if solver.mesh.uniform else 1.0,
            periodic_x=False, periodic_y=py_wrap,
        ),
        solver.params,
        backend="xla",
    )

    n_rounds = -(-n_subcycles // halo_x)
    total = n_rounds * n_ti
    # Cross-round prefetch + one-tile-deferred write-back feasibility
    # (static). A round-(r+1) tile t's block reads interiors written by
    # round-r tiles t-reach..t+reach, reach = ceil(halo_x / tile_x)
    # (ho_tiled_config never returns halo_x > tile_x, i.e. reach 1, but
    # caller-supplied tile kwargs could — and interpret-mode tests cannot
    # catch the resulting DMA race, so the reach is computed, not
    # assumed; advisor r3 finding). The prefetch for tile g+2 is issued
    # at tile g AFTER retiring the write of tile g-1, so every round-r
    # write it depends on is known complete iff
    # (n_ti - 2) >= reach + 1. Below that, prefetch stays round-local,
    # round-leading tiles self-start their loads, and write-backs are
    # waited inline (the CG1 fallback discipline).
    reach = -(-halo_x // tile_x)
    cross_prefetch = (n_ti - 2) >= reach + 1
    if px_wrap:
        # Periodic x: tile 0's LO wrap strip reads the LAST tile's
        # interior (and vice versa) — the cross-round dependency distance
        # becomes n_ti - 1, so cross-round prefetch can never run ahead
        # safely. Round-local prefetch (reading the fully-written
        # previous-round slot) remains fine (the CG1 kernel's rule).
        cross_prefetch = False
    defer_out = cross_prefetch

    def kernel(consts_ref, states_in, states_io, c_scr, s_scr, staging,
               in_sems, out_sem):
        # ``c_scr``/``s_scr``: (2, n, block_x, ny) double-buffered input
        # blocks — tile g computes out of slot g%2 while the two
        # whole-window DMAs for tile g+1 (issued one tile earlier) land
        # in the other slot. ``staging``: one block holding tile g's
        # final state so its interior write-back DMA can drain behind
        # tile g+1's compute (retired just before tile g+1 re-stages).
        r = pl.program_id(0)
        ti = pl.program_id(1)
        g = r * n_ti + ti
        slot = jax.lax.rem(g, jnp.int32(2))

        def src_slot_of(gg):
            return jax.lax.rem(gg // jnp.int32(n_ti), jnp.int32(2))

        def load_dmas(gg, s):
            t = jax.lax.rem(gg, jnp.int32(n_ti))
            window = pl.ds(t * tile_x, block_x)
            dmas = [
                pltpu.make_async_copy(
                    consts_ref.at[:, window, :], c_scr.at[s], in_sems.at[s, 0]
                ),
            ]
            if not px_wrap:
                dmas.append(
                    pltpu.make_async_copy(
                        states_io.at[src_slot_of(gg), :, window, :],
                        s_scr.at[s],
                        in_sems.at[s, 1],
                    )
                )
                return dmas
            # Periodic x: the padded state rings are stale (interiors are
            # the only rows ever written), so the halo strips are fetched
            # from the source slot's INTERIOR at modular row offsets —
            # three segments per load (the CG1 kernel's pattern). All
            # offsets stay 8-aligned (tile_x, halo_x, nx are).
            ss = src_slot_of(gg)
            lo = jax.lax.rem(
                t * tile_x - jnp.int32(halo_x) + jnp.int32(nx), jnp.int32(nx)
            )
            hi = jax.lax.rem(t * tile_x + jnp.int32(tile_x), jnp.int32(nx))
            segs = (
                (pl.ds(pl.multiple_of(halo_x + lo, 8), halo_x),
                 pl.ds(0, halo_x)),
                (pl.ds(halo_x + t * tile_x, tile_x),
                 pl.ds(halo_x, tile_x)),
                (pl.ds(pl.multiple_of(halo_x + hi, 8), halo_x),
                 pl.ds(halo_x + tile_x, halo_x)),
            )
            for m, (src_rows, dst_rows) in enumerate(segs):
                dmas.append(
                    pltpu.make_async_copy(
                        states_io.at[ss, :, src_rows, :],
                        s_scr.at[s, :, dst_rows, :],
                        in_sems.at[s, 1 + m],
                    )
                )
            return dmas

        def out_dma(gg):
            t = jax.lax.rem(gg, jnp.int32(n_ti))
            ds = 1 - src_slot_of(gg)  # write the OTHER state slot
            return pltpu.make_async_copy(
                staging.at[:, pl.ds(0, tile_x), :],
                states_io.at[
                    ds, :, pl.ds(halo_x + t * tile_x, tile_x), :
                ],
                out_sem.at[0],
            )

        @pl.when(g == 0)
        def _first():
            for dma in load_dmas(jnp.int32(0), jnp.int32(0)):
                dma.start()
            # n_ti == 1: tile g=1 is round 1 and must read round 0's
            # write-back — its load is self-started below instead.
            if n_ti > 1:
                for dma in load_dmas(jnp.int32(1), jnp.int32(1)):
                    dma.start()

        if not cross_prefetch and n_rounds > 1:
            # Round-leading tiles get no cross-round prefetch: each of
            # the first two tiles of a later round starts its OWN loads
            # (exposed) right before waiting. Safe because without
            # cross_prefetch write-backs are waited inline, so all of
            # the previous round's interiors are already in HBM.
            @pl.when((r > 0) & (ti < min(2, n_ti)))
            def _self_start():
                for dma in load_dmas(g, slot):
                    dma.start()

        for dma in load_dmas(g, slot):
            dma.wait()

        kconsts = {
            name: c_scr[slot, idx] for idx, name in enumerate(const_names)
        }
        carry = _unflatten_state([s_scr[slot, k] for k in range(n_s)])

        # Last round may run fewer subcycles (the remainder).
        n_sub = jnp.minimum(
            jnp.int32(halo_x),
            jnp.int32(n_subcycles) - r * jnp.int32(halo_x),
        )

        def body(_, c):
            return body_solver.subcycle_body(c, kconsts, dt)

        final = jax.lax.fori_loop(0, n_sub, body, carry)

        # Retire the deferred write whose staging block this tile reuses.
        if defer_out and total > 1:
            @pl.when(g >= 1)
            def _retire():
                out_dma(g - 1).wait()

        for k, plane in enumerate(_flatten_state(final)):
            staging[k] = plane[halo_x : halo_x + tile_x, :]
        started = out_dma(g)
        started.start()
        if not defer_out:
            started.wait()

        # Prefetch the loads of tile g+2 into the input slot this tile
        # just vacated; they fly behind tile g+1's subcycle compute.
        if cross_prefetch:
            if total > 2:
                @pl.when(g + 2 < total)
                def _prefetch():
                    for dma in load_dmas(g + 2, slot):
                        dma.start()
        elif n_ti > 2:
            @pl.when(ti + 2 < n_ti)
            def _prefetch_round():
                for dma in load_dmas(g + 2, slot):
                    dma.start()

        if defer_out:
            @pl.when(g == total - 1)
            def _drain():
                out_dma(g).wait()

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch_shapes = [
        pltpu.VMEM((2, n_c, block_x, ny), dtype),
        pltpu.VMEM((2, n_s, block_x, ny), dtype),
        pltpu.VMEM((n_s, tile_x, ny), dtype),
        # 4 input sems per slot: consts + up to 3 periodic-x state segments.
        pltpu.SemaphoreType.DMA((2, 4)),
        pltpu.SemaphoreType.DMA((1,)),
    ]
    out_shape = jax.ShapeDtypeStruct((2, n_s, pad_x, ny), dtype)

    # Ping-pong state buffer: slot 0 holds the padded initial state; round
    # r reads slot r%2 and writes slot 1-r%2. Both slots' halo rings are
    # zero (the closed walls) and stay zero: the kernel writes interiors
    # only, and the buffer is ALIASED in/out so rounds run in place.
    states = jnp.zeros((2, n_s, pad_x, ny), dtype)
    states = states.at[0, :, halo_x : halo_x + nx, :].set(
        jnp.stack(state_planes)
    )
    states = pl.pallas_call(
        kernel,
        grid=(n_rounds, n_ti),
        out_shape=out_shape,
        in_specs=[any_spec, any_spec],
        out_specs=any_spec,
        input_output_aliases={1: 0},
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(consts_stack, states)

    final_slot = n_rounds % 2
    interior = [
        states[final_slot, k, halo_x : halo_x + nx_out, :ny_out]
        for k in range(n_s)
    ]
    return _unflatten_state(interior)
