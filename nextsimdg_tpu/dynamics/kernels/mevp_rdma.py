"""RDMA halo exchange overlapped with interior compute for blocked mEVP.

The 'blocked' backend exchanges H-wide ghost zones with ONE ppermute pair
per axis per H subcycles — but the exchange is still exposed: XLA inserts
the collective before the round's compute, so every round pays the full
ICI latency + transfer time. This backend moves the exchange INSIDE a
Pallas kernel with ``pltpu.make_async_remote_copy`` and hides it behind
the round's own compute:

per round (H subcycles), each x-sharded device:

1. barriers with its ring neighbors (scratch buffers are reused across
   sequentially dispatched rounds — the barrier keeps a fast neighbor's
   round r+1 RDMA from landing in a recv buffer still being read);
2. starts RDMA of its H-row edge strips into the neighbors' recv buffers
   (symmetric ring transfers — every device sends both strips; global
   walls are restored by zeroing the wrapped ghosts after arrival);
3. while the strips fly over ICI, runs the H subcycles on its WHOLE local
   block with zero ghosts — rows [H, nx-H) come out exactly right (ring
   invalidation never reaches them), the outer H rows are garbage;
4. waits the recv semaphores and re-runs the H subcycles on two 3H-row
   edge BANDS (received ghost H + own 2H rows) — rows [0, H) and
   [nx-H, nx) come out exactly right;
5. assembles the output from the interior pass + the two band passes.

The redundant compute is the two 2H-row own-band re-runs (2 x 2H / nx of
the block — vanishing for production blocks); in exchange the ICI
transfer is fully hidden behind step 3. Numerics are bit-identical to the
'blocked' ppermute path (same ``subcycle_body``, same ghost-zone
invalidation argument; tests/test_shardmap.py asserts it exactly).

Scope: x-axis sharding, closed domains, uniform meshes (the prototype per
SURVEY §5 "overlapping halo transfer with interior compute"). Constants
are widened once per step by the existing ppermute ``halo_widen`` (7
planes, once per ~100 subcycles — not worth hiding); only the 5 state
planes ride the per-round RDMA. Validated in TPU-interpret mode on a CPU
device mesh (a single real chip cannot exercise a ring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024

_CONST_NAMES = (
    "strength", "dt_m", "active", "b_u", "b_v", "u_ocean", "v_ocean",
)


def mevp_round_rdma(
    local_solver,  # MEVPSolver on the LOCAL (nx, ny) closed mesh (static)
    state_arrays,  # (u, v, s11, s22, s12), each local (nx, ny)
    consts_w,  # dict: the 7 const planes widened by h in x -> (nx+2h, ny)
    dt: float,
    n_sub: int,  # subcycles this round (<= h)
    h: int,  # ghost width = max subcycles per round
    axis_name: str,  # x device-mesh axis
    interpret=False,
):
    """One ghost-zone round with RDMA overlap; returns the 5 state planes."""
    if interpret is True:
        # The generic Pallas interpreter has no remote-DMA semantics; the
        # TPU interpret machinery simulates them (incl. semaphores).
        interpret = pltpu.InterpretParams(dma_execution_mode="eager")
    nx, ny = state_arrays[0].shape
    dtype = state_arrays[0].dtype
    if nx < 2 * h:
        raise ValueError(f"local block ({nx} rows) must be >= 2*halo ({2*h})")
    band = 3 * h  # received ghost h + own 2h rows per edge band

    states = jnp.stack(state_arrays)  # (5, nx, ny)
    consts_stack = jnp.stack([consts_w[name] for name in _CONST_NAMES])

    def kernel(consts_ref, states_ref, out_ref, *rest):
        (s_vmem, c_vmem, send_lo, send_hi, recv_lo, recv_hi,
         band_s, band_c, sems, send_sems, recv_sems) = rest

        my = jax.lax.axis_index(axis_name)
        n_dev = jnp.int32(jax.lax.axis_size(axis_name))
        left = jax.lax.rem(my - 1 + n_dev, n_dev)
        right = jax.lax.rem(my + 1, n_dev)

        # Round barrier with the ring neighbors: their previous round is
        # done, so their recv buffers are safe to write into.
        barrier = pltpu.get_barrier_semaphore()
        for neighbor in (left, right):
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=neighbor,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        pltpu.semaphore_wait(barrier, 2)

        # Stage my edge strips and launch the symmetric ring RDMA.
        cp_lo = pltpu.make_async_copy(
            states_ref.at[:, pl.ds(0, h), :], send_lo, sems.at[0]
        )
        cp_hi = pltpu.make_async_copy(
            states_ref.at[:, pl.ds(nx - h, h), :], send_hi, sems.at[1]
        )
        cp_lo.start()
        cp_hi.start()
        cp_lo.wait()
        cp_hi.wait()

        # My bottom strip becomes the LEFT neighbor's upper ghost; my top
        # strip becomes the RIGHT neighbor's lower ghost.
        rdma_lo = pltpu.make_async_remote_copy(
            src_ref=send_lo, dst_ref=recv_hi,
            send_sem=send_sems.at[0], recv_sem=recv_sems.at[0],
            device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma_hi = pltpu.make_async_remote_copy(
            src_ref=send_hi, dst_ref=recv_lo,
            send_sem=send_sems.at[1], recv_sem=recv_sems.at[1],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma_lo.start()
        rdma_hi.start()

        # ---- INTERIOR PASS (overlaps the RDMA flight) -------------------
        cp_s = pltpu.make_async_copy(states_ref, s_vmem, sems.at[2])
        cp_c = pltpu.make_async_copy(
            consts_ref.at[:, pl.ds(h, nx), :], c_vmem, sems.at[3]
        )
        cp_s.start()
        cp_c.start()
        cp_s.wait()
        cp_c.wait()

        kconsts = {
            name: c_vmem[idx] for idx, name in enumerate(_CONST_NAMES)
        }
        carry0 = tuple(s_vmem[k] for k in range(5))

        def body(_, carry):
            return local_solver.subcycle_body(carry, kconsts, dt)

        interior = jax.lax.fori_loop(0, n_sub, body, carry0)
        for k in range(5):
            s_vmem[k] = interior[k]

        # ---- EDGE BANDS (after the ghosts arrive) -----------------------
        rdma_lo.wait()
        rdma_hi.wait()

        # Closed global walls: the ring wrapped, but the true boundary
        # condition is zero ghosts — overwrite after arrival.
        @pl.when(my == 0)
        def _wall_lo():
            recv_lo[:] = jnp.zeros_like(recv_lo)

        @pl.when(my == n_dev - 1)
        def _wall_hi():
            recv_hi[:] = jnp.zeros_like(recv_hi)

        def run_band(ghost, own_rows, const_rows, ghost_first):
            cpb = pltpu.make_async_copy(
                states_ref.at[:, own_rows, :], band_s, sems.at[4]
            )
            cpc = pltpu.make_async_copy(
                consts_ref.at[:, const_rows, :], band_c, sems.at[5]
            )
            cpb.start()
            cpc.start()
            cpb.wait()
            cpc.wait()
            bconsts = {
                name: band_c[idx] for idx, name in enumerate(_CONST_NAMES)
            }
            bcarry = tuple(
                jnp.concatenate(
                    [ghost[k], band_s[k]] if ghost_first
                    else [band_s[k], ghost[k]],
                    axis=0,
                )
                for k in range(5)
            )
            return jax.lax.fori_loop(
                0, n_sub,
                lambda _, c: local_solver.subcycle_body(c, bconsts, dt),
                bcarry,
            )

        # lo band: [ghost h | own 2h] with consts_w rows [0, 3h).
        lo = run_band(recv_lo, pl.ds(0, 2 * h), pl.ds(0, band), True)
        # hi band: [own 2h | ghost h] with consts_w rows [nx - h, nx + 2h).
        hi = run_band(recv_hi, pl.ds(nx - 2 * h, 2 * h), pl.ds(nx - h, band), False)

        # ---- ASSEMBLE ----------------------------------------------------
        # lo band rows [h, 2h) are my rows [0, h); hi band rows [h, 2h)
        # are my rows [nx-h, nx).
        for k in range(5):
            s_vmem[k, :h, :] = lo[k][h : 2 * h, :]
            s_vmem[k, nx - h :, :] = hi[k][h : 2 * h, :]
        out_cp = pltpu.make_async_copy(s_vmem, out_ref, sems.at[6])
        out_cp.start()
        out_cp.wait()

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    strip = lambda: pltpu.VMEM((5, h, ny), dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((5, nx, ny), dtype),
        in_specs=[any_spec, any_spec],
        out_specs=any_spec,
        scratch_shapes=[
            pltpu.VMEM((5, nx, ny), dtype),   # state block
            pltpu.VMEM((7, nx, ny), dtype),   # local consts
            strip(), strip(),                  # send lo/hi
            strip(), strip(),                  # recv lo/hi
            pltpu.VMEM((5, 2 * h, ny), dtype),  # band own rows
            pltpu.VMEM((7, band, ny), dtype),   # band consts
            pltpu.SemaphoreType.DMA((7,)),
            pltpu.SemaphoreType.DMA((2,)),      # send sems
            pltpu.SemaphoreType.DMA((2,)),      # recv sems
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, collective_id=7,
        ),
        interpret=interpret,
    )(consts_stack, states)
    return tuple(out[k] for k in range(5))
