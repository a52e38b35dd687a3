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
* tiles on the global edge zero the out-of-domain strips of their state
  blocks in VMEM (the padded ring of a fresh output buffer is
  uninitialized, so its contents must never be read);
* a Python loop over ceil(n_subcycles / min(Hx,Hy)) rounds chains calls.

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
_CONST_NAMES = (
    "strength", "dt_m", "active", "b_u", "b_v", "u_ocean", "v_ocean",
)


def tiled_supported(
    nx: int, ny: int, tile_x: int = DEFAULT_TILE_X, tile_y: int = DEFAULT_TILE_Y
) -> bool:
    return nx % tile_x == 0 and ny % tile_y == 0 and nx >= tile_x and ny >= tile_y


#: VMEM budget for auto_config: 2 x 12 double-buffered scratch blocks
#: (input prefetch overlaps the previous tile's compute) + ~24 block-sized
#: Mosaic stack temporaries of the subcycle body, against the 110 MB cap.
_BLOCK_EQUIVALENTS = 48
_TILED_VMEM_BUDGET = 96 * 1024 * 1024

#: Overlap-aware cost model inputs (measured v5e, docs/performance.md):
#: VPU subcycle compute ~50.5 ps/element (post shift-factoring), effective
#: HBM DMA bandwidth ~700 GB/s.
_COMPUTE_PS_PER_EL = 50.5
_HBM_BYTES_PER_S = 700e9


def _tile_cost_per_element(nx: int, ny: int, tile_x: int, halo_x: int):
    """Estimated time per subcycle-element [ps] with input prefetch.

    Per round each tile runs ``halo_x`` subcycles on its widened block;
    the 12 input-block DMAs of tile k+1 fly behind tile k's compute, so a
    round costs one exposed load + n_tiles x max(compute, dma).
    """
    block_x = tile_x + 2 * halo_x
    comp = _COMPUTE_PS_PER_EL * block_x * ny * halo_x
    dma = (12 * block_x + 5 * tile_x) * ny * 4 / _HBM_BYTES_PER_S * 1e12
    n_tiles = nx // tile_x
    per_round = dma + comp + (n_tiles - 1) * max(comp, dma)
    return per_round / (nx * ny * halo_x)


def auto_config(nx: int, ny: int):
    """Pick (tile_x, tile_y, halo_x, halo_y) for a closed (nx, ny) grid.

    Preference order (measured v5e, docs/performance.md): FULL-ROW tiles
    (tile_y = ny, halo_y = 0 — no 128-lane halo, so no lane-offset
    constraint and no y-redundancy), choosing the (tile_x, halo_x) pair
    that minimizes the overlap-aware cost model under the double-buffered
    VMEM budget; fall back to the round-1 (128, 512) tiles with (8, 128)
    halos when rows are too long. Returns None when nothing fits the
    alignment rules.
    """
    itemsize = 4
    budget = _TILED_VMEM_BUDGET // (_BLOCK_EQUIVALENTS * itemsize)
    best = None
    best_cost = None
    if ny % 128 == 0:
        for halo_x in (4, 8, 16, 32):
            for tile_x in (512, 256, 128, 64, 32, 16, 8):
                if (
                    nx % tile_x == 0
                    and (tile_x + 2 * halo_x) % 8 == 0
                    and (tile_x + 2 * halo_x) * ny <= budget
                ):
                    cost = _tile_cost_per_element(nx, ny, tile_x, halo_x)
                    if best_cost is None or cost < best_cost:
                        best = (tile_x, ny, halo_x, 0)
                        best_cost = cost
                    break  # wider tiles only reduce redundancy; found max
    if best is not None:
        return best
    if tiled_supported(nx, ny):
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
    block_x = tile_x + 2 * halo_x
    block_y = tile_y + 2 * halo_y
    sub_per_round = min(h for h in (halo_x, halo_y) if h > 0)
    pad_x, pad_y = nx + 2 * halo_x, ny + 2 * halo_y
    n_consts = len(_CONST_NAMES)
    n_fields = n_consts + 5

    # Pad once: zeros everywhere (= closed walls; active=0 pins
    # halo-exterior nodes, and no divisor fields remain since dt/m is
    # precomputed). Consts are never overwritten, so their zero rings
    # survive all rounds; state rings are re-zeroed in VMEM per tile.
    pad2 = lambda arr: jnp.pad(arr, ((halo_x, halo_x), (halo_y, halo_y)))
    consts_stack = jnp.stack([pad2(consts[name]) for name in _CONST_NAMES])

    n_tiles = n_ti * n_tj

    def round_kernel(n_sub):
        def kernel(consts_ref, states_ref, out_ref, scratch, in_sems, out_sems):
            # ``scratch``: (2, n_fields, block_x, block_y) — double-buffered
            # input blocks. Tile k computes out of slot k%2 while the DMAs
            # for tile k+1 (issued one tile earlier) land in the other
            # slot; at the end of tile k the loads for tile k+2 are issued
            # into the slot just vacated. This keeps the 12 halo'd block
            # loads (the bulk of the kernel's HBM traffic) entirely behind
            # the previous tile's subcycle compute.
            ti = pl.program_id(0)
            tj = pl.program_id(1)
            k_lin = ti * n_tj + tj
            slot = jax.lax.rem(k_lin, jnp.int32(2))

            def load_dmas(t, s):
                """The 12 block-load DMA descriptors of linear tile t."""
                t_i = t // jnp.int32(n_tj)
                t_j = jax.lax.rem(t, jnp.int32(n_tj))
                window = (
                    pl.ds(t_i * tile_x, block_x),
                    pl.ds(t_j * tile_y, block_y),
                )
                dmas = []
                for idx in range(n_fields):
                    src = (
                        consts_ref.at[(idx,) + window]
                        if idx < n_consts
                        else states_ref.at[(idx - n_consts,) + window]
                    )
                    dmas.append(
                        pltpu.make_async_copy(
                            src, scratch.at[s, idx], in_sems.at[s, idx]
                        )
                    )
                return dmas

            @pl.when(k_lin == 0)
            def _first():
                for dma in load_dmas(jnp.int32(0), jnp.int32(0)):
                    dma.start()
                if n_tiles > 1:
                    for dma in load_dmas(jnp.int32(1), jnp.int32(1)):
                        dma.start()

            for dma in load_dmas(k_lin, slot):
                dma.wait()

            # Global-edge tiles: the state rings outside the domain came
            # from an uninitialized output buffer of the previous round —
            # zero them in VMEM (this IS the closed boundary condition).
            zero_strips = []
            if halo_x:
                zero_strips += [
                    (ti == 0, (pl.ds(0, halo_x), slice(None))),
                    (ti == n_ti - 1, (pl.ds(halo_x + tile_x, halo_x), slice(None))),
                ]
            if halo_y:
                zero_strips += [
                    (tj == 0, (slice(None), pl.ds(0, halo_y))),
                    (tj == n_tj - 1, (slice(None), pl.ds(halo_y + tile_y, halo_y))),
                ]
            for k in range(5):
                dst = scratch.at[slot, n_consts + k]
                for cond, idx in zero_strips:
                    @pl.when(cond)
                    def _zero(dst=dst, idx=idx):
                        dst[idx] = jnp.zeros_like(dst[idx])

            kconsts = {
                name: scratch[slot, idx]
                for idx, name in enumerate(_CONST_NAMES)
            }
            carry0 = tuple(scratch[slot, n_consts + k] for k in range(5))

            def body(_, carry):
                return solver.subcycle_body(carry, kconsts, dt)

            final = jax.lax.fori_loop(0, n_sub, body, carry0)

            # Stage the final state back into the scratch blocks, then DMA
            # the interiors into the padded output buffer. The blocking
            # wait (before the next-next tile's loads reuse this slot) is
            # ~1/6 of the load traffic — cheap enough to leave exposed.
            row0 = ti * tile_x
            col0 = tj * tile_y
            out_copies = []
            for k in range(5):
                scratch[slot, n_consts + k] = final[k]
                dma = pltpu.make_async_copy(
                    scratch.at[
                        slot, n_consts + k,
                        pl.ds(halo_x, tile_x), pl.ds(halo_y, tile_y),
                    ],
                    out_ref.at[
                        k,
                        pl.ds(halo_x + row0, tile_x),
                        pl.ds(halo_y + col0, tile_y),
                    ],
                    out_sems.at[k],
                )
                dma.start()
                out_copies.append(dma)
            for dma in out_copies:
                dma.wait()

            if n_tiles > 2:
                @pl.when(k_lin + 2 < n_tiles)
                def _prefetch():
                    for dma in load_dmas(k_lin + 2, slot):
                        dma.start()

        return kernel

    out_shape = jax.ShapeDtypeStruct((5, pad_x, pad_y), dtype)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch_shapes = [
        pltpu.VMEM((2, n_fields, block_x, block_y), dtype),
        pltpu.SemaphoreType.DMA((2, n_fields)),
        pltpu.SemaphoreType.DMA((5,)),
    ]

    states = jnp.stack([pad2(s) for s in (u, v, s11, s22, s12)])
    remaining = n_subcycles
    while remaining > 0:
        n_sub = min(sub_per_round, remaining)
        remaining -= n_sub
        states = pl.pallas_call(
            round_kernel(n_sub),
            grid=(n_ti, n_tj),
            out_shape=out_shape,
            in_specs=[any_spec, any_spec],
            out_specs=any_spec,
            scratch_shapes=scratch_shapes,
            # Raised scoped-VMEM cap (the Mosaic default is 16 MB; the
            # kernel is its core's only tenant): scratch blocks + the
            # ~24 block-sized loop temporaries budget against this.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            # NO input/output aliasing: tiles run sequentially and later
            # tiles read halo strips from their neighbors' PRE-round
            # interiors — in-place writes would corrupt those reads.
            interpret=interpret,
        )(consts_stack, states)
    interior = (slice(halo_x, halo_x + nx), slice(halo_y, halo_y + ny))
    return tuple(states[(k,) + interior] for k in range(5))
