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

_VMEM_LIMIT = 110 * 1024 * 1024
_TILED_VMEM_BUDGET = 96 * 1024 * 1024
#: Mosaic stack temporaries of the HO body (the Gauss-point stacks
#: halved with the 2x2 constitutive rule; same census as mevp_ho_pallas).
#: The input blocks (n_consts + 17 state planes) are DOUBLE-buffered so
#: the next tile's loads fly behind this tile's compute.
_STACK_EQUIVALENTS = 65


def ho_tiled_config(nx: int, ny: int, n_consts: int = 29):
    """(tile_x, halo_x) full-row tile config, or None if unsupported."""
    if ny % 128:
        return None
    budget = _TILED_VMEM_BUDGET // (
        (2 * (n_consts + 17) + _STACK_EQUIVALENTS) * 4
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
    nx, ny = state_planes[0].shape
    dtype = state_planes[0].dtype
    if tile_x is None:
        tile_x, halo_x = ho_tiled_config(nx, ny)
    if nx % tile_x:
        raise ValueError(f"grid rows ({nx}) not divisible by tile_x ({tile_x})")
    n_ti = nx // tile_x
    block_x = tile_x + 2 * halo_x
    pad_x = nx + 2 * halo_x
    const_names = tuple(sorted(consts))
    n_c = len(const_names)
    n_s = len(state_planes)  # 17

    pad2 = lambda arr: jnp.pad(arr, ((halo_x, halo_x), (0, 0)))
    consts_stack = jnp.stack([pad2(consts[name]) for name in const_names])
    states = jnp.stack([pad2(p) for p in state_planes])

    def round_kernel(n_sub):
        def kernel(consts_ref, states_ref, out_ref, *rest):
            # Double-buffered input blocks: tile ti+1's 46-plane load
            # (the bulk of the round's HBM traffic, ~30 MB/tile at 1024^2)
            # flies behind tile ti's subcycle compute; only the round's
            # first load is exposed. Tiles read the PRE-round state
            # (states_ref) and write a separate out_ref, so the prefetch
            # never races the interior write-backs.
            c_scr, s_scr, sems = rest
            ti = pl.program_id(0)
            slot = jax.lax.rem(ti, jnp.int32(2))

            def load_dmas(t, s):
                window = (slice(None), pl.ds(t * tile_x, block_x), slice(None))
                return (
                    pltpu.make_async_copy(
                        consts_ref.at[window], c_scr.at[s], sems.at[s, 0]
                    ),
                    pltpu.make_async_copy(
                        states_ref.at[window], s_scr.at[s], sems.at[s, 1]
                    ),
                )

            @pl.when(ti == 0)
            def _first():
                for dma in load_dmas(jnp.int32(0), jnp.int32(0)):
                    dma.start()

            for dma in load_dmas(ti, slot):
                dma.wait()
            if n_ti > 1:
                @pl.when(ti + 1 < n_ti)
                def _prefetch():
                    for dma in load_dmas(ti + 1, 1 - slot):
                        dma.start()

            # Global-edge tiles: zero the out-of-domain state strips (the
            # padded rings of a fresh output buffer are uninitialized;
            # zeros ARE the closed boundary). Consts keep jnp.pad zeros.
            @pl.when(ti == 0)
            def _zero_lo():
                s_scr[0, :, :halo_x, :] = jnp.zeros_like(
                    s_scr[0, :, :halo_x, :]
                )

            @pl.when(ti == n_ti - 1)
            def _zero_hi():
                s_scr[slot, :, halo_x + tile_x :, :] = jnp.zeros_like(
                    s_scr[slot, :, halo_x + tile_x :, :]
                )

            kconsts = {
                name: c_scr[slot, idx] for idx, name in enumerate(const_names)
            }
            carry = _unflatten_state([s_scr[slot, k] for k in range(n_s)])

            def body(_, c):
                return solver.subcycle_body(c, kconsts, dt)

            final = jax.lax.fori_loop(0, n_sub, body, carry)
            row0 = ti * tile_x
            for k, plane in enumerate(_flatten_state(final)):
                s_scr[slot, k] = plane

            out = pltpu.make_async_copy(
                s_scr.at[slot, :, pl.ds(halo_x, tile_x), :],
                out_ref.at[:, pl.ds(halo_x + row0, tile_x), :],
                sems.at[slot, 2],
            )
            out.start()
            out.wait()

        return kernel

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch_shapes = [
        pltpu.VMEM((2, n_c, block_x, ny), dtype),
        pltpu.VMEM((2, n_s, block_x, ny), dtype),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]
    out_shape = jax.ShapeDtypeStruct((n_s, pad_x, ny), dtype)

    remaining = n_subcycles
    while remaining > 0:
        n_sub = min(halo_x, remaining)
        remaining -= n_sub
        states = pl.pallas_call(
            round_kernel(n_sub),
            grid=(n_ti,),
            out_shape=out_shape,
            in_specs=[any_spec, any_spec],
            out_specs=any_spec,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            # NO aliasing: later tiles read neighbors' PRE-round strips.
            interpret=interpret,
        )(consts_stack, states)

    interior = [states[k, halo_x : halo_x + nx, :] for k in range(n_s)]
    return _unflatten_state(interior)
