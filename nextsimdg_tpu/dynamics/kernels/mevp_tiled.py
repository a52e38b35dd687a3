"""Temporally-blocked tiled Pallas kernel for large-grid mEVP.

For grids too big for the single-block VMEM-resident kernel, the XLA path
re-streams ~14 arrays from HBM every subcycle (bandwidth-bound, and XLA's
effective bandwidth degrades with working-set size: ~520 GB/s at 1024^2
but <200 GB/s at 4096^2 — docs/performance.md). This kernel applies
stencil temporal blocking ("ghost zone" batching):

* the state lives PADDED by the halo widths (Hx, Hy) for the whole
  subcycle loop (one pad on entry, one slice on exit); zero halos ARE the
  closed-boundary condition (shifts fill zeros at walls);
* each (T, T) tile DMAs its (T+2Hx, T+2Hy) block of all 12 fields into
  VMEM, runs min(Hx, Hy) subcycles entirely on-chip — each subcycle
  invalidates one ring, so the interior T x T stays exact — and DMAs back
  only the interior;
* ALL ceil(n_subcycles / min(Hx,Hy)) rounds run inside ONE pallas_call
  over a (rounds, ti, tj) grid: the padded state ping-pongs between two
  HBM slots (round r reads slot r%2, writes slot 1-r%2), so no host
  round-trip, re-pad, or XLA copy separates rounds. Both slots' halo
  rings are zeroed once on entry and only interiors are ever written, so
  the closed-boundary zeros persist for every round;
* when the tile count allows it (statically checked against the stencil
  reach ``needed``), input blocks of tile g+2 are prefetched across round
  boundaries and interior write-backs are retired two tiles late, keeping
  every DMA behind another tile's subcycle compute.

HBM traffic drops from O(n_subcycles) to O(n_subcycles / H) full-state
passes at the cost of ((T+2Hx)(T+2Hy))/T^2 redundant compute. The
numerical body is the shared ``MEVPSolver.subcycle_body`` (bit-consistent
with the XLA path). Closed boundaries only (periodic wrap-halos are a
follow-up; the XLA path handles periodic meshes).

Buffer-placement note: the 5 state planes travel as ONE stacked
(5, pad_x, pad_y) array. With separate per-plane outputs, XLA's memory
-space assignment opportunistically promotes custom-call outputs that fit
into scoped VMEM (observed as S(1) layouts + scoped-vmem OOM at 1024^2+);
the stacked buffer exceeds VMEM at any production size, forcing HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Default tiles and halos (min halo = subcycles per round). Mosaic DMA
#: constraints: slice SHAPES and lane OFFSETS must be multiples of 128 in
#: the lane dim (dim 1) and of 8 in the sublane dim, so the lane halo is
#: 128 (the interior write lands at lane offset halo_y + tj*tile_y).
#: Budget: scratch = 12 blocks + the Mosaic stack for the loop body's
#: live temporaries (~24 block-sized buffers) must stay under the 16 MB
#: scoped-vmem limit. Measured v5e sweep (docs/performance.md): (128, 512)
#: tiles with (8, 128) halos -> 144x768 blocks (432 KB), 1.69x redundant
#: compute, 8 subcycles per HBM pass: 46.7 ms at 2048^2 (XLA: 70.9) and
#: 195 ms at 4096^2 (XLA: 598).
DEFAULT_TILE_X = 128
DEFAULT_TILE_Y = 512
DEFAULT_HALO_X = 8
DEFAULT_HALO_Y = 128

_STATE_NAMES = ("u", "v", "s11", "s22", "s12")


def tiled_supported(
    nx: int, ny: int, tile_x: int = DEFAULT_TILE_X, tile_y: int = DEFAULT_TILE_Y
) -> bool:
    return nx % tile_x == 0 and ny % tile_y == 0 and nx >= tile_x and ny >= tile_y


#: VMEM budget terms for auto_config: 2 x (n_consts + 5) double-buffered
#: scratch blocks (input prefetch overlaps the previous tile's compute)
#: + 2 x 5 staging blocks for the deferred interior write-backs + ~24
#: block-sized Mosaic stack temporaries of the subcycle body, against the
#: 110 MB cap. n_consts = 7 uniform (58 total), 12 graded/spherical (68).
_BLOCK_EQUIVALENTS_EXTRA = 34
_TILED_VMEM_BUDGET = 96 * 1024 * 1024

#: Overlap-aware cost model inputs (measured v5e, docs/performance.md):
#: VPU subcycle compute ~50.5 ps/element (post shift-factoring), effective
#: HBM DMA bandwidth ~700 GB/s.
_COMPUTE_PS_PER_EL = 50.5
_HBM_BYTES_PER_S = 700e9


def _prefetch_needed(n_ti: int, n_tj: int, halo_y: int) -> int:
    """Linear tile distance a cross-round prefetch may read ahead of.

    A tile of round r+1 reads interiors written by round-r tiles up to
    this offset ahead of its own index. For a single tile row (n_ti == 1)
    the only in-domain neighbor is t_j + 1; otherwise the farthest is the
    (t_i + 1, t_j [+1]) neighbor at linear distance n_tj (+1 with a lane
    halo).
    """
    if n_ti == 1:
        return 1 if n_tj > 1 else 0
    return n_tj + (1 if (halo_y and n_tj > 1) else 0)


def _tile_cost_per_element(nx: int, ny: int, tile_x: int, halo_x: int, n_fields: int = 12):
    """Estimated time per subcycle-element [ps] with input prefetch.

    Per round each tile runs ``halo_x`` subcycles on its widened block;
    when the tile count clears the cross-prefetch feasibility threshold
    the input-block DMAs of tile k+1 fly behind tile k's compute (a round
    costs one exposed load + n_tiles x max(compute, dma)); otherwise the
    loads are exposed every tile.
    """
    block_x = tile_x + 2 * halo_x
    comp = _COMPUTE_PS_PER_EL * block_x * ny * halo_x
    dma = (n_fields * block_x + 5 * tile_x) * ny * 4 / _HBM_BYTES_PER_S * 1e12
    n_tiles = nx // tile_x
    # Full-row tiles: n_tj = 1, so needed = 0/1 (see _prefetch_needed).
    cross_prefetch = (n_tiles - 2) >= _prefetch_needed(n_tiles, 1, 0)
    if cross_prefetch:
        per_round = dma + comp + (n_tiles - 1) * max(comp, dma)
    else:
        per_round = n_tiles * (dma + comp)
    return per_round / (nx * ny * halo_x)


def auto_config(nx: int, ny: int, n_consts: int = 7, periodic=(False, False)):
    """Pick (tile_x, tile_y, halo_x, halo_y) for an (nx, ny) grid.

    Periodic axes: x rides wrapped (modular) halo loads with any config;
    periodic y requires FULL-ROW tiles (the subcycle body then wraps the
    lane dim in-block), so the (128, 512) lane-halo fallback is
    disallowed when periodic_y is set.

    Preference order (measured v5e, docs/performance.md): FULL-ROW tiles
    (tile_y = ny, halo_y = 0 — no 128-lane halo, so no lane-offset
    constraint and no y-redundancy), choosing the (tile_x, halo_x) pair
    that minimizes the overlap-aware cost model under the double-buffered
    VMEM budget; fall back to the round-1 (128, 512) tiles with (8, 128)
    halos when rows are too long. Returns None when nothing fits the
    alignment rules.
    """
    itemsize = 4
    block_equivalents = 2 * (n_consts + 5) + _BLOCK_EQUIVALENTS_EXTRA
    budget = _TILED_VMEM_BUDGET // (block_equivalents * itemsize)
    best = None
    best_cost = None
    if ny % 128 == 0:
        # halo_x must be a multiple of 8: interior slices start at sublane
        # offset halo_x, and Mosaic requires dynamic sublane offsets to be
        # provably divisible by the (8, 128) tiling (halo_x=4 compiles in
        # interpret mode but fails Mosaic on hardware).
        for halo_x in (8, 16, 32):
            # Evaluate EVERY fitting tile_x (not just the widest): under
            # the overlap-aware cost model the exposed first-load term
            # grows with block_x while redundancy shrinks, and a config
            # too small to clear the prefetch feasibility threshold is
            # costed unoverlapped — the optimum is not monotone in tile_x.
            for tile_x in (512, 256, 128, 64, 32, 16, 8):
                if (
                    nx % tile_x == 0
                    and (tile_x + 2 * halo_x) % 8 == 0
                    and (tile_x + 2 * halo_x) * ny <= budget
                ):
                    cost = _tile_cost_per_element(
                        nx, ny, tile_x, halo_x, n_fields=n_consts + 5
                    )
                    if best_cost is None or cost < best_cost:
                        best = (tile_x, ny, halo_x, 0)
                        best_cost = cost
    if best is not None:
        return best
    if not periodic[1] and tiled_supported(nx, ny):
        return DEFAULT_TILE_X, DEFAULT_TILE_Y, DEFAULT_HALO_X, DEFAULT_HALO_Y
    return None


def mevp_subcycles_tiled(
    solver,  # MEVPSolver (static; carries mesh + params)
    state_arrays,  # (u, v, s11, s22, s12), each (nx, ny)
    consts: dict,  # the per-step constant fields
    dt: float,
    n_subcycles: int,
    tile: int = None,
    halo: int = None,
    tile_x: int = DEFAULT_TILE_X,
    tile_y: int = DEFAULT_TILE_Y,
    halo_x: int = DEFAULT_HALO_X,
    halo_y: int = DEFAULT_HALO_Y,
    interpret: bool = False,
):
    """Run n_subcycles via temporally-blocked tiles; returns the 5 states."""
    if tile is not None:
        tile_x = tile_y = tile
    if halo is not None:
        halo_x = halo_y = halo
    u, v, s11, s22, s12 = state_arrays
    nx, ny = u.shape
    dtype = u.dtype
    if nx % tile_x or ny % tile_y:
        raise ValueError(
            f"grid ({nx}, {ny}) is not divisible by tiles ({tile_x}, {tile_y})"
        )
    n_ti, n_tj = nx // tile_x, ny // tile_y
    # A zero halo is allowed exactly when the tile spans that whole axis
    # (closed boundary: the block edge IS the wall, no exchange needed —
    # this removes the 128-lane halo and its redundant compute entirely).
    if halo_x == 0 and n_ti != 1:
        raise ValueError("halo_x=0 requires tile_x == nx")
    if halo_y == 0 and n_tj != 1:
        raise ValueError("halo_y=0 requires tile_y == ny")
    if not interpret:
        # Mosaic alignment: every VMEM/HBM slice offset (halo_x,
        # halo_x + t_i*tile_x) must be divisible by the (8, 128) tiling.
        if halo_x % 8 or (n_ti > 1 and tile_x % 8):
            raise ValueError(f"halo_x/tile_x ({halo_x}/{tile_x}) not 8-aligned")
        if halo_y % 128 or (n_tj > 1 and tile_y % 128):
            raise ValueError(f"halo_y/tile_y ({halo_y}/{tile_y}) not 128-aligned")
    px_wrap = bool(solver.mesh.periodic_x)
    py_wrap = bool(solver.mesh.periodic_y)
    if py_wrap and halo_y != 0:
        raise ValueError("periodic_y requires full-row tiles (halo_y = 0)")
    block_x = tile_x + 2 * halo_x
    block_y = tile_y + 2 * halo_y
    sub_per_round = min(h for h in (halo_x, halo_y) if h > 0)
    pad_x, pad_y = nx + 2 * halo_x, ny + 2 * halo_y
    const_names = tuple(sorted(consts))
    n_consts = len(const_names)
    n_fields = n_consts + 5

    # The per-block subcycle body: closed x shifts (the halo supplies the
    # neighbor/wrap data), and — full-row tiles on a periodic-y mesh —
    # WRAPPING y shifts (the block spans the whole y extent, so jnp.roll
    # in the lane dim IS the periodic condition).
    from ..mesh import RectMesh
    from ..mevp import MEVPSolver

    body_solver = MEVPSolver(
        RectMesh(
            nx=block_x, ny=block_y,
            dx=solver.mesh.dx if solver.mesh.uniform else 1.0,
            dy=solver.mesh.dy if solver.mesh.uniform else 1.0,
            periodic_x=False, periodic_y=(py_wrap and halo_y == 0),
        ),
        solver.params,
        backend="xla",
    )

    # Pad once. Closed walls pad with zeros (active=0 pins halo-exterior
    # nodes; no divisor fields remain since dt/m is precomputed); periodic
    # axes pad the round-invariant CONSTS with wrapped values. State rings
    # on a periodic-x axis are never read (the loads below fetch the wrap
    # strips from the source-slot interior instead). Consts are never
    # overwritten, so their rings survive all rounds.
    def pad2(arr):
        if halo_x:
            if px_wrap:
                arr = jnp.concatenate([arr[-halo_x:], arr, arr[:halo_x]], axis=0)
            else:
                arr = jnp.pad(arr, ((halo_x, halo_x), (0, 0)))
        if halo_y:
            # periodic_y is full-row-only (guarded above): closed pad.
            arr = jnp.pad(arr, ((0, 0), (halo_y, halo_y)))
        return arr

    consts_stack = jnp.stack([pad2(consts[name]) for name in const_names])

    n_tiles = n_ti * n_tj
    n_rounds = -(-n_subcycles // sub_per_round)
    total = n_rounds * n_tiles
    # Cross-round prefetch / deferred-output-wait feasibility (static).
    # A tile of round r+1 reads interiors written by round-r tiles up to
    # linear offset ``needed`` ahead of its own index; the prefetch for
    # tile g+2 is issued at tile g, and with deferred waits a write is
    # only KNOWN complete two tiles after it started.
    needed = _prefetch_needed(n_ti, n_tj, halo_y)
    if px_wrap:
        # Periodic x: tile 0's LO wrap strip reads the LAST tile's
        # interior (and the last tile's HI strip reads tile 0's) — the
        # cross-round dependency distance becomes n_tiles - 1, so
        # cross-round prefetch can never run ahead safely. Round-local
        # prefetch (reading the fully-written previous-round slot)
        # remains fine.
        needed = n_tiles
    defer_out = (n_tiles - 2) >= needed + 2
    cross_prefetch = (n_tiles - 2) >= needed

    def kernel(consts_ref, states_in, states_io, scratch, staging, in_sems, out_sems):
        # ``scratch``: (2, n_fields, block_x, block_y) — double-buffered
        # input blocks. Tile k computes out of slot k%2 while the DMAs
        # for tile k+1 (issued one tile earlier) land in the other
        # slot; at the end of tile k the loads for tile k+2 are issued
        # into the slot just vacated. This keeps the 12 halo'd block
        # loads (the bulk of the kernel's HBM traffic) entirely behind
        # the previous tile's subcycle compute.
        r = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)
        t_lin = ti * n_tj + tj
        g = r * n_tiles + t_lin  # global tile index over all rounds
        slot = jax.lax.rem(g, jnp.int32(2))

        def src_slot_of(gg):
            return jax.lax.rem(gg // jnp.int32(n_tiles), jnp.int32(2))

        def load_dmas(gg, s):
            """The block-load DMA descriptors of global tile gg.

            Consts (wrap- or zero-padded at build time) load as one
            window. States on a closed x axis likewise; on a PERIODIC x
            axis the halo strips are fetched from the source slot's
            interior at modular row offsets (the padded rings are stale —
            interiors are the only rows ever written), three segments per
            field. All offsets stay 8-aligned (tile_x, halo_x, nx are).
            """
            t = jax.lax.rem(gg, jnp.int32(n_tiles))
            t_i = t // jnp.int32(n_tj)
            t_j = jax.lax.rem(t, jnp.int32(n_tj))
            window = (
                pl.ds(t_i * tile_x, block_x),
                pl.ds(t_j * tile_y, block_y),
            )
            ss = src_slot_of(gg)
            dmas = []
            for idx in range(n_consts):
                dmas.append(
                    pltpu.make_async_copy(
                        consts_ref.at[(idx,) + window],
                        scratch.at[s, idx],
                        in_sems.at[s, idx, 0],
                    )
                )
            for k in range(5):
                idx = n_consts + k
                if not px_wrap:
                    dmas.append(
                        pltpu.make_async_copy(
                            states_io.at[(ss, k) + window],
                            scratch.at[s, idx],
                            in_sems.at[s, idx, 0],
                        )
                    )
                    continue
                ywin = pl.ds(t_j * tile_y, block_y)
                lo = jax.lax.rem(
                    t_i * tile_x - jnp.int32(halo_x) + jnp.int32(nx),
                    jnp.int32(nx),
                )
                hi = jax.lax.rem(t_i * tile_x + jnp.int32(tile_x), jnp.int32(nx))
                segs = (
                    (pl.ds(pl.multiple_of(halo_x + lo, 8), halo_x),
                     pl.ds(0, halo_x)),
                    (pl.ds(halo_x + t_i * tile_x, tile_x),
                     pl.ds(halo_x, tile_x)),
                    (pl.ds(pl.multiple_of(halo_x + hi, 8), halo_x),
                     pl.ds(halo_x + tile_x, halo_x)),
                )
                for m, (src_rows, dst_rows) in enumerate(segs):
                    dmas.append(
                        pltpu.make_async_copy(
                            states_io.at[ss, k, src_rows, ywin],
                            scratch.at[s, idx, dst_rows, :],
                            in_sems.at[s, idx, m],
                        )
                    )
            return dmas

        def out_dmas(gg):
            """The 5 interior write-back DMA descriptors of tile gg."""
            t = jax.lax.rem(gg, jnp.int32(n_tiles))
            t_i = t // jnp.int32(n_tj)
            t_j = jax.lax.rem(t, jnp.int32(n_tj))
            s = jax.lax.rem(gg, jnp.int32(2))
            ds = 1 - src_slot_of(gg)  # write the OTHER state slot
            dmas = []
            for k in range(5):
                dmas.append(
                    pltpu.make_async_copy(
                        staging.at[
                            s, k,
                            pl.ds(halo_x, tile_x), pl.ds(halo_y, tile_y),
                        ],
                        states_io.at[
                            ds, k,
                            pl.ds(halo_x + t_i * tile_x, tile_x),
                            pl.ds(halo_y + t_j * tile_y, tile_y),
                        ],
                        out_sems.at[s, k],
                    )
                )
            return dmas

        @pl.when(g == 0)
        def _first():
            for dma in load_dmas(jnp.int32(0), jnp.int32(0)):
                dma.start()
            if n_tiles > 1:
                for dma in load_dmas(jnp.int32(1), jnp.int32(1)):
                    dma.start()

        if not cross_prefetch:
            # Round-leading tiles get no cross-round prefetch: each of
            # the first two tiles of a later round starts its OWN loads
            # (exposed) right before waiting. Safe because without
            # cross_prefetch there is no defer_out either, so all of
            # the previous round's interior writes were waited inline.
            @pl.when((r > 0) & (t_lin < min(2, n_tiles)))
            def _self_start():
                for dma in load_dmas(g, slot):
                    dma.start()

        for dma in load_dmas(g, slot):
            dma.wait()

        # The state rings of BOTH slots were zeroed on entry and only
        # interiors are ever written back, so the closed-boundary
        # zero halos persist for the whole subcycle loop — no
        # in-kernel edge-strip zeroing is needed.
        kconsts = {
            name: scratch[slot, idx]
            for idx, name in enumerate(const_names)
        }
        carry0 = tuple(scratch[slot, n_consts + k] for k in range(5))

        # Last round may run fewer subcycles (the remainder).
        n_sub = jnp.minimum(
            jnp.int32(sub_per_round),
            jnp.int32(n_subcycles) - r * jnp.int32(sub_per_round),
        )

        def body(_, carry):
            return body_solver.subcycle_body(carry, kconsts, dt)

        final = jax.lax.fori_loop(0, n_sub, body, carry0)

        # Retire the out-DMAs whose staging slot this tile reuses.
        if defer_out:
            if total > 2:
                @pl.when(g >= 2)
                def _retire():
                    for dma in out_dmas(g - 2):
                        dma.wait()

        # Stage the final state, then DMA the interiors into the
        # destination state slot.
        for k in range(5):
            staging[slot, k] = final[k]
        started = out_dmas(g)
        for dma in started:
            dma.start()
        if not defer_out:
            for dma in started:
                dma.wait()

        # Prefetch the loads of tile g+2 into the slot this tile just
        # vacated; they fly behind tile g+1's subcycle compute.
        if cross_prefetch:
            if total > 2:
                @pl.when(g + 2 < total)
                def _prefetch():
                    for dma in load_dmas(g + 2, slot):
                        dma.start()
        elif n_tiles > 2:
            @pl.when(t_lin + 2 < n_tiles)
            def _prefetch_round():
                for dma in load_dmas(g + 2, slot):
                    dma.start()

        if defer_out:
            @pl.when(g == total - 1)
            def _drain():
                for dma in out_dmas(g):
                    dma.wait()
                if total > 1:
                    for dma in out_dmas(g - 1):
                        dma.wait()

    out_shape = jax.ShapeDtypeStruct((2, 5, pad_x, pad_y), dtype)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch_shapes = [
        pltpu.VMEM((2, n_fields, block_x, block_y), dtype),
        pltpu.VMEM((2, 5, block_x, block_y), dtype),
        # 3 sems per field: periodic-x state loads split into 3 segments.
        pltpu.SemaphoreType.DMA((2, n_fields, 3)),
        pltpu.SemaphoreType.DMA((2, 5)),
    ]

    # Ping-pong state buffer: slot 0 holds the padded initial state; round
    # r reads slot r%2 and writes slot 1-r%2. Both slots' halo rings are
    # zero (the closed walls) and stay zero: the kernel writes interiors
    # only, and the buffer is ALIASED in/out so rounds run in place.
    states = jnp.zeros((2, 5, pad_x, pad_y), dtype)
    states = states.at[
        0, :, halo_x : halo_x + nx, halo_y : halo_y + ny
    ].set(jnp.stack([u, v, s11, s22, s12]))
    states = pl.pallas_call(
        kernel,
        grid=(n_rounds, n_ti, n_tj),
        out_shape=out_shape,
        in_specs=[any_spec, any_spec],
        out_specs=any_spec,
        input_output_aliases={1: 0},
        scratch_shapes=scratch_shapes,
        # Raised scoped-VMEM cap (the Mosaic default is 16 MB; the
        # kernel is its core's only tenant): double-buffered scratch +
        # staging blocks + the ~24 block-sized loop temporaries budget
        # against this.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(consts_stack, states)
    interior = (slice(halo_x, halo_x + nx), slice(halo_y, halo_y + ny))
    final_slot = n_rounds % 2
    return tuple(states[(final_slot, k) + interior] for k in range(5))
