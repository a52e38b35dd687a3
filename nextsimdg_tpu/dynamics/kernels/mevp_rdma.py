"""RDMA halo exchange overlapped with interior compute for blocked mEVP.

The 'blocked' backend exchanges H-wide ghost zones with ONE ppermute pair
per axis per H subcycles — but the exchange is still exposed: XLA inserts
the collective before the round's compute, so every round pays the full
ICI latency + transfer time. This backend moves the exchange INSIDE a
Pallas kernel with ``pltpu.make_async_remote_copy`` and hides it behind
the round's own compute. Generalized to 1-D (x or y) and 2-D ('X','Y')
device meshes; per round (n_sub <= h subcycles), each device:

1. barriers with its ring neighbors (scratch buffers are reused across
   sequentially dispatched rounds — the barrier keeps a fast neighbor's
   round r+1 RDMA from landing in a recv buffer still being read);
2. DMAs its whole state + the (ppermute-prewidened, once per ~100
   subcycles) consts into VMEM, stages its h-row x edge strips and
   launches the symmetric x-ring RDMA;
3. while the strips fly over ICI, runs the n_sub subcycles on its WHOLE
   local block with zero ghosts — the [h, nx-h) x [h, ny-h) interior
   comes out exactly right (ring invalidation never reaches it);
4. waits the x ghosts (zeroing them at closed global walls), then builds
   the y strips EXTENDED by the just-received x ghosts — the extension
   carries the corner blocks from the diagonal neighbors — and launches
   the y-ring RDMA (phase 2 of the two-phase corner exchange);
5. re-runs the n_sub subcycles on the two [ghost h | own 2h] x-edge
   BANDS while the y strips fly; their rows patch the output edge rows;
6. waits the y ghosts and re-runs the two y-edge bands over the FULL
   x extent including the x ghosts — their columns (corners included)
   patch the output edge columns last.

Strip staging and band assembly are in-register vector slices, never
sliced DMAs: Mosaic requires lane-dim DMA slice shapes/offsets to be
128-multiples, which an h-wide y strip can never satisfy — vector
loads/stores have no such rule. Only full-buffer copies ride the DMA/RDMA
engines.

The redundant compute is the edge-band re-runs (~(4h + 12h^2/ny) / nx of
the block); in exchange the ICI transfer is fully hidden behind step 3.
Numerics are bit-identical to the 'blocked' ppermute path (same
``subcycle_body``, same ghost-zone invalidation argument;
tests/test_shardmap.py asserts it exactly). Validated in TPU-interpret
mode on a CPU device mesh (a single real chip cannot exercise a ring);
the Mosaic lowering is compile-checked on hardware via a 1-device
('X','Y') mesh whose ring RDMAs degenerate to self-copies.

Scope: uniform local meshes or LocalMeshView (non-uniform geometry rides
the widened metric const planes); closed or periodic global domains (the
ring wrap IS the periodic condition — wall zeroing is simply skipped);
CG1 (5 planes) and HO/CG2-dG1 (17 planes) via the ``body_fn`` adapter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024


def mevp_round_rdma(
    body_fn,  # one-subcycle body: (planes tuple, consts dict) -> planes
    state_arrays,  # N state planes, each local (nx, ny) — 5 CG1, 17 HO
    consts_w,  # the const planes widened by h on every SHARDED axis
    n_sub: int,  # subcycles this round (<= h)
    h: int,  # ghost width = max subcycles per round
    axes,  # (x_axis_name | None, y_axis_name | None) — at least one set
    periodic=(False, False),
    interpret=False,
):
    """One ghost-zone round with RDMA overlap; returns the state planes.

    Generic over the plane count: the CG1 solver passes its 5 planes and
    a ``subcycle_body`` adapter; the HO (CG2/dG1) solver passes its 17
    (flattened via ``mevp_ho_tiled._flatten_state``) — both bodies
    invalidate exactly one ghost ring per subcycle (CG1's strain/scatter
    pair, HO's gather(+1)/scatter(-1) pair), so the band argument is
    identical.
    """
    if interpret is True:
        # The generic Pallas interpreter has no remote-DMA semantics; the
        # TPU interpret machinery simulates them (incl. semaphores).
        interpret = pltpu.InterpretParams(dma_execution_mode="eager")
    ax_x, ax_y = axes
    px, py = periodic
    n_s = len(state_arrays)
    nx, ny = state_arrays[0].shape
    dtype = state_arrays[0].dtype
    if ax_x is not None and nx < 2 * h:
        raise ValueError(f"local block ({nx} rows) must be >= 2*halo ({2*h})")
    if ax_y is not None and ny < 2 * h:
        raise ValueError(f"local block ({ny} cols) must be >= 2*halo ({2*h})")
    nxw = nx + (2 * h if ax_x is not None else 0)
    nyw = ny + (2 * h if ax_y is not None else 0)
    hx = h if ax_x is not None else 0  # consts x offset of the owned block
    hy = h if ax_y is not None else 0
    nxe = nxw  # x extent of the extended y strips/bands

    states = jnp.stack(state_arrays)  # (n_s, nx, ny)
    # Generic over the per-step const planes (7/12 CG1, 29-37 HO; metric
    # planes for LocalMeshView meshes ride here like any other const).
    const_names = tuple(sorted(consts_w))
    consts_stack = jnp.stack([consts_w[name] for name in const_names])
    assert consts_stack.shape[1:] == (nxw, nyw), consts_stack.shape

    # Scratch layout (name -> shape), built to match the kernel unpack.
    scratch_shapes = [
        pltpu.VMEM((n_s, nx, ny), dtype),    # s_vmem: state block
        pltpu.VMEM((len(const_names), nxw, nyw), dtype),  # c_vmem: widened consts
        pltpu.SemaphoreType.DMA((4,)),       # local copy sems
    ]
    if ax_x is not None:
        scratch_shapes += [
            pltpu.VMEM((n_s, h, ny), dtype),   # send_x_lo
            pltpu.VMEM((n_s, h, ny), dtype),   # send_x_hi
            pltpu.VMEM((n_s, h, ny), dtype),   # recv_x_lo
            pltpu.VMEM((n_s, h, ny), dtype),   # recv_x_hi
            pltpu.SemaphoreType.DMA((2,)),   # x send sems
            pltpu.SemaphoreType.DMA((2,)),   # x recv sems
        ]
    if ax_y is not None:
        scratch_shapes += [
            pltpu.VMEM((n_s, nxe, h), dtype),  # send_y_lo (x-extended)
            pltpu.VMEM((n_s, nxe, h), dtype),  # send_y_hi
            pltpu.VMEM((n_s, nxe, h), dtype),  # recv_y_lo
            pltpu.VMEM((n_s, nxe, h), dtype),  # recv_y_hi
            pltpu.SemaphoreType.DMA((2,)),   # y send sems
            pltpu.SemaphoreType.DMA((2,)),   # y recv sems
        ]

    def kernel(consts_ref, states_ref, out_ref, *rest):
        it = iter(rest)
        s_vmem = next(it)
        c_vmem = next(it)
        sems = next(it)
        if ax_x is not None:
            send_x_lo, send_x_hi, recv_x_lo, recv_x_hi = (
                next(it), next(it), next(it), next(it)
            )
            x_send_sems, x_recv_sems = next(it), next(it)
        if ax_y is not None:
            send_y_lo, send_y_hi, recv_y_lo, recv_y_hi = (
                next(it), next(it), next(it), next(it)
            )
            y_send_sems, y_recv_sems = next(it), next(it)

        def ring(axis_name):
            my = jax.lax.axis_index(axis_name)
            n = jnp.int32(jax.lax.axis_size(axis_name))
            return my, n, jax.lax.rem(my - 1 + n, n), jax.lax.rem(my + 1, n)

        neighbors = []
        if ax_x is not None:
            my_x, n_x, left, right = ring(ax_x)
            neighbors += [("x", left), ("x", right)]
        if ax_y is not None:
            my_y, n_y, down, up = ring(ax_y)
            neighbors += [("y", down), ("y", up)]

        def device_id(axis, idx):
            """Neighbor differing on one mesh axis: a {axis_name: index}
            dict (DeviceIdType.MESH) — unspecified axes default to this
            device's own coordinates, which works on any mesh shape
            (incl. a 1-D sub-sharding of a 2-D device mesh)."""
            return {(ax_x if axis == "x" else ax_y): idx}

        # Round barrier with the ring neighbors: their previous round is
        # done, so their recv buffers are safe to write into.
        barrier = pltpu.get_barrier_semaphore()
        for axis, neighbor in neighbors:
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=device_id(axis, neighbor),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
        pltpu.semaphore_wait(barrier, len(neighbors))

        # Whole local state + widened consts into VMEM.
        cp_s = pltpu.make_async_copy(states_ref, s_vmem, sems.at[0])
        cp_c = pltpu.make_async_copy(consts_ref, c_vmem, sems.at[1])
        cp_s.start()
        cp_c.start()
        cp_s.wait()
        cp_c.wait()

        # Stage my x edge strips (vector slices) and launch the x ring:
        # my bottom strip becomes the LEFT neighbor's upper ghost; my top
        # strip becomes the RIGHT neighbor's lower ghost.
        if ax_x is not None:
            send_x_lo[:] = s_vmem[:, :h, :]
            send_x_hi[:] = s_vmem[:, nx - h :, :]
            rdma_x_lo = pltpu.make_async_remote_copy(
                src_ref=send_x_lo, dst_ref=recv_x_hi,
                send_sem=x_send_sems.at[0], recv_sem=x_recv_sems.at[0],
                device_id=device_id("x", left),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma_x_hi = pltpu.make_async_remote_copy(
                src_ref=send_x_hi, dst_ref=recv_x_lo,
                send_sem=x_send_sems.at[1], recv_sem=x_recv_sems.at[1],
                device_id=device_id("x", right),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma_x_lo.start()
            rdma_x_hi.start()
        elif ax_y is not None:
            # No x phase: the y strips carry no x extension — launch the
            # y ring immediately so it overlaps the interior pass.
            send_y_lo[:] = s_vmem[:, :, :h]
            send_y_hi[:] = s_vmem[:, :, ny - h :]
            rdma_y_lo = pltpu.make_async_remote_copy(
                src_ref=send_y_lo, dst_ref=recv_y_hi,
                send_sem=y_send_sems.at[0], recv_sem=y_recv_sems.at[0],
                device_id=device_id("y", down),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma_y_hi = pltpu.make_async_remote_copy(
                src_ref=send_y_hi, dst_ref=recv_y_lo,
                send_sem=y_send_sems.at[1], recv_sem=y_recv_sems.at[1],
                device_id=device_id("y", up),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma_y_lo.start()
            rdma_y_hi.start()

        # Band own-data staged (in registers) BEFORE the interior pass
        # overwrites s_vmem.
        if ax_x is not None:
            xband_own_lo = s_vmem[:, : 2 * h, :]
            xband_own_hi = s_vmem[:, nx - 2 * h :, :]
        if ax_y is not None:
            yband_own_lo = s_vmem[:, :, : 2 * h]
            yband_own_hi = s_vmem[:, :, ny - 2 * h :]

        kconsts = {
            name: c_vmem[idx, hx : hx + nx, hy : hy + ny]
            for idx, name in enumerate(const_names)
        }
        carry0 = tuple(s_vmem[k] for k in range(n_s))

        def body(_, carry):
            return body_fn(carry, kconsts)

        # ---- INTERIOR PASS (overlaps the RDMA flight) -------------------
        interior = jax.lax.fori_loop(0, n_sub, body, carry0)
        for k in range(n_s):
            s_vmem[k] = interior[k]

        def run_band(carry, consts):
            bconsts = {
                name: consts[idx] for idx, name in enumerate(const_names)
            }
            return jax.lax.fori_loop(
                0, n_sub,
                lambda _, c: body_fn(c, bconsts),
                carry,
            )

        if ax_x is not None:
            # ---- X GHOSTS ARRIVE -----------------------------------------
            rdma_x_lo.wait()
            rdma_x_hi.wait()
            if not px:
                # Closed global walls: the ring wrapped, but the true
                # boundary condition is zero ghosts — overwrite on arrival.
                @pl.when(my_x == 0)
                def _wall_x_lo():
                    recv_x_lo[:] = jnp.zeros_like(recv_x_lo)

                @pl.when(my_x == n_x - 1)
                def _wall_x_hi():
                    recv_x_hi[:] = jnp.zeros_like(recv_x_hi)

            if ax_y is not None:
                # Phase 2: y strips extended by the x ghosts — the
                # extensions carry the diagonal neighbors' corner blocks.
                send_y_lo[:] = jnp.concatenate(
                    [
                        recv_x_lo[:, :, :h],
                        yband_own_lo[:, :, :h],
                        recv_x_hi[:, :, :h],
                    ],
                    axis=1,
                )
                send_y_hi[:] = jnp.concatenate(
                    [
                        recv_x_lo[:, :, ny - h :],
                        yband_own_hi[:, :, h:],
                        recv_x_hi[:, :, ny - h :],
                    ],
                    axis=1,
                )
                rdma_y_lo = pltpu.make_async_remote_copy(
                    src_ref=send_y_lo, dst_ref=recv_y_hi,
                    send_sem=y_send_sems.at[0], recv_sem=y_recv_sems.at[0],
                    device_id=device_id("y", down),
                    device_id_type=pltpu.DeviceIdType.MESH,
                )
                rdma_y_hi = pltpu.make_async_remote_copy(
                    src_ref=send_y_hi, dst_ref=recv_y_lo,
                    send_sem=y_send_sems.at[1], recv_sem=y_recv_sems.at[1],
                    device_id=device_id("y", up),
                    device_id_type=pltpu.DeviceIdType.MESH,
                )
                rdma_y_lo.start()
                rdma_y_hi.start()

            # ---- X EDGE BANDS (overlap the y flight) ----------------------
            # lo band [ghost h | own 2h] x [0, ny): its rows [h, 2h) are my
            # rows [0, h); edge columns stay garbage until the y bands.
            lo = run_band(
                tuple(
                    jnp.concatenate([recv_x_lo[k], xband_own_lo[k]], axis=0)
                    for k in range(n_s)
                ),
                c_vmem[:, : 3 * h, hy : hy + ny],
            )
            hi = run_band(
                tuple(
                    jnp.concatenate([xband_own_hi[k], recv_x_hi[k]], axis=0)
                    for k in range(n_s)
                ),
                # Widened x coords: band [nx-2h, nx+h) + hx -> [nx-h, nx+2h).
                c_vmem[:, nx - h :, hy : hy + ny],
            )
            for k in range(n_s):
                s_vmem[k, :h, :] = lo[k][h : 2 * h, :]
                s_vmem[k, nx - h :, :] = hi[k][h : 2 * h, :]

        if ax_y is not None:
            # ---- Y GHOSTS (+ corners) ARRIVE ------------------------------
            rdma_y_lo.wait()
            rdma_y_hi.wait()
            if not py:
                @pl.when(my_y == 0)
                def _wall_y_lo():
                    recv_y_lo[:] = jnp.zeros_like(recv_y_lo)

                @pl.when(my_y == n_y - 1)
                def _wall_y_hi():
                    recv_y_hi[:] = jnp.zeros_like(recv_y_hi)

            # Own 2h columns, x-extended by the received x ghosts (real
            # data out to the band edge, so ALL owned rows survive n_sub).
            if ax_x is not None:
                ext_lo = jnp.concatenate(
                    [
                        recv_x_lo[:, :, : 2 * h],
                        yband_own_lo,
                        recv_x_hi[:, :, : 2 * h],
                    ],
                    axis=1,
                )
                ext_hi = jnp.concatenate(
                    [
                        recv_x_lo[:, :, ny - 2 * h :],
                        yband_own_hi,
                        recv_x_hi[:, :, ny - 2 * h :],
                    ],
                    axis=1,
                )
            else:
                ext_lo, ext_hi = yband_own_lo[:], yband_own_hi[:]

            lo = run_band(
                tuple(
                    jnp.concatenate([recv_y_lo[k], ext_lo[k]], axis=1)
                    for k in range(n_s)
                ),
                c_vmem[:, :, : 3 * h],
            )
            hi = run_band(
                tuple(
                    jnp.concatenate([ext_hi[k], recv_y_hi[k]], axis=1)
                    for k in range(n_s)
                ),
                # Widened y coords: band [ny-2h, ny+h) + hy -> [ny-h, ny+2h).
                c_vmem[:, :, ny - h :],
            )
            # Columns patch LAST over all rows — fixing the corners the x
            # bands left garbage.
            for k in range(n_s):
                s_vmem[k, :, :h] = lo[k][hx : hx + nx, h : 2 * h]
                s_vmem[k, :, ny - h :] = hi[k][hx : hx + nx, h : 2 * h]

        out_cp = pltpu.make_async_copy(s_vmem, out_ref, sems.at[2])
        out_cp.start()
        out_cp.wait()

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_s, nx, ny), dtype),
        in_specs=[any_spec, any_spec],
        out_specs=any_spec,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, collective_id=7,
        ),
        interpret=interpret,
    )(consts_stack, states)
    return tuple(out[k] for k in range(n_s))
