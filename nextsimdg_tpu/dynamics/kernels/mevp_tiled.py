"""Temporally-blocked tiled Pallas kernel for large-grid mEVP.

For grids too big for the single-block VMEM-resident kernel, the XLA path
re-streams ~14 arrays from HBM every subcycle (bandwidth-bound at ~25% of
speed-of-light on 1M elements). This kernel applies stencil temporal
blocking ("ghost zone" batching):

* the global state is zero-padded by the halo width H (zero halos ARE the
  closed-boundary condition: shifts fill zeros at walls);
* each (T, T) tile DMAs its (T+2H, T+2H) block of all fields into VMEM,
  runs H subcycles entirely on-chip — each subcycle invalidates one ring,
  so after H subcycles the interior T x T is exact — and writes back only
  the interior;
* a Python loop over ceil(n_subcycles / H) rounds re-pads between rounds.

HBM traffic drops from O(n_subcycles) to O(n_subcycles / H) full-state
passes at the cost of ((T+2H)/T)^2 redundant compute. The numerical body is
the shared ``MEVPSolver.subcycle_body`` (bit-consistent with the XLA path).
Closed boundaries only (periodic wrap-halos are a follow-up; the XLA path
handles periodic meshes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Default tile and halos (min halo = subcycles per round). Mosaic DMA
#: slices must be lane-aligned (multiples of 128) and sublane-aligned
#: (multiples of 8): T=256 with halos (32 sublane, 64 lane) -> 320x384
#: blocks, 12 fields * 320*384 * 4 B = 5.9 MB of VMEM, 32 subcycles per
#: HBM pass, 1.88x redundant compute at tile edges.
DEFAULT_TILE = 256
DEFAULT_HALO_X = 32
DEFAULT_HALO_Y = 64

_STATE_NAMES = ("u", "v", "s11", "s22", "s12")
_CONST_NAMES = (
    "strength", "dt_m", "active", "b_u", "b_v", "u_ocean", "v_ocean",
)


def tiled_supported(nx: int, ny: int, tile: int = DEFAULT_TILE) -> bool:
    return nx % tile == 0 and ny % tile == 0 and nx >= tile and ny >= tile


def _pad(arr, halo: int, value: float):
    return jnp.pad(arr, halo, constant_values=value)


def mevp_subcycles_tiled(
    solver,  # MEVPSolver (static; carries mesh + params)
    state_arrays,  # (u, v, s11, s22, s12), each (nx, ny)
    consts: dict,  # the per-step constant fields
    dt: float,
    n_subcycles: int,
    tile: int = DEFAULT_TILE,
    halo: int = None,
    halo_x: int = DEFAULT_HALO_X,
    halo_y: int = DEFAULT_HALO_Y,
    interpret: bool = False,
):
    """Run n_subcycles via temporally-blocked tiles; returns the 5 states."""
    if halo is not None:
        halo_x = halo_y = halo
    u, v, s11, s22, s12 = state_arrays
    nx, ny = u.shape
    dtype = u.dtype
    n_ti, n_tj = nx // tile, ny // tile
    block_x = tile + 2 * halo_x
    block_y = tile + 2 * halo_y
    sub_per_round = min(halo_x, halo_y)

    # Pad the per-step constants once; zeros everywhere (= closed walls;
    # active=0 pins halo-exterior nodes, and no divisor fields remain since
    # dt/m is precomputed).
    pad2 = lambda arr: jnp.pad(arr, ((halo_x, halo_x), (halo_y, halo_y)))
    consts_padded = [pad2(consts[name]) for name in _CONST_NAMES]

    n_inputs = len(_CONST_NAMES) + len(_STATE_NAMES)

    def round_kernel(n_sub):
        def kernel(*refs):
            in_refs = refs[:n_inputs]
            out_refs = refs[n_inputs : n_inputs + 5]
            scratch = refs[n_inputs + 5 : n_inputs + 5 + n_inputs]
            sems = refs[n_inputs + 5 + n_inputs]

            ti = pl.program_id(0)
            tj = pl.program_id(1)
            row0 = ti * tile
            col0 = tj * tile

            # Halo'd block loads: overlapping reads need manual DMA.
            copies = []
            for idx, (ref, dst) in enumerate(zip(in_refs, scratch)):
                dma = pltpu.make_async_copy(
                    ref.at[pl.ds(row0, block_x), pl.ds(col0, block_y)],
                    dst,
                    sems.at[idx],
                )
                dma.start()
                copies.append(dma)
            for dma in copies:
                dma.wait()

            kconsts = {
                name: scratch[idx][:]
                for idx, name in enumerate(_CONST_NAMES)
            }
            base = len(_CONST_NAMES)
            carry0 = tuple(scratch[base + k][:] for k in range(5))

            def body(_, carry):
                return solver.subcycle_body(carry, kconsts, dt)

            final = jax.lax.fori_loop(0, n_sub, body, carry0)
            for ref, value in zip(out_refs, final):
                ref[:] = value[halo_x : halo_x + tile, halo_y : halo_y + tile]

        return kernel

    out_shapes = [jax.ShapeDtypeStruct((nx, ny), dtype) for _ in range(5)]
    out_specs = [
        pl.BlockSpec(
            (tile, tile), lambda ti, tj: (ti, tj), memory_space=pltpu.VMEM
        )
        for _ in range(5)
    ]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_inputs
    scratch_shapes = [pltpu.VMEM((block_x, block_y), dtype) for _ in range(n_inputs)] + [
        pltpu.SemaphoreType.DMA((n_inputs,)),
    ]

    states = (u, v, s11, s22, s12)
    remaining = n_subcycles
    while remaining > 0:
        n_sub = min(sub_per_round, remaining)
        remaining -= n_sub
        padded_states = [pad2(s) for s in states]
        states = pl.pallas_call(
            round_kernel(n_sub),
            grid=(n_ti, n_tj),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*consts_padded, *padded_states)
        states = tuple(states)
    return states
