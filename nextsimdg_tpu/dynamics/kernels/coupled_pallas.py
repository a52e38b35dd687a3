"""Fully-fused dynamics step: mEVP subcycles + CG sampling + DG transport.

The coupled model's dynamics phase is three chained stages — N mEVP
subcycles, CG1-velocity sampling at quadrature points, and the (limited)
SSP-RK DG tracer step. Run separately they cost three kernel dispatches
and HBM round-trips of the velocity/tracer planes between stages; at the
256^2 headline size the non-mEVP stages are ~25% of the step. This kernel
traces ALL of it inside one ``pallas_call``: the final velocity never
leaves VMEM before the tracers consume it.

Requirements: uniform mesh, closed/periodic handled by the shared jnp
bodies (wall selects are iota-based, so they lower in Mosaic), CG1
solver, and the whole working set in VMEM: 12 mEVP planes +
(K x n_tracers) coefficient planes + 12 quad-velocity planes +
temporaries — ~40 plane-equivalents at dG1 x 3 tracers, fitting ~256^2
f32 comfortably. Land masks are supported: the mEVP side already rides
the ``active`` const plane, and coastline face masks enter as two more
constant planes multiplying the upwind fluxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Scoped-VMEM cap requested from Mosaic [bytes]. The Mosaic default is
#: 16 MB — at dG1 x 3 tracers the fused step measures ~66 f32
#: plane-equivalents (16.57 MB at 256^2), which used to cap it at ~192^2.
#: A v5e core has 128 MB of physical VMEM and a single-block pallas_call
#: is its only tenant, so request most of it and budget residents below.
_VMEM_LIMIT = 110 * 1024 * 1024
_VMEM_BUDGET = 96 * 1024 * 1024


def fused_dynamics_supported(model, n_tracers: int = 3) -> bool:
    """Whether the single-block fused dynamics kernel applies."""
    mesh = model.mesh
    if not mesh.uniform:
        return False
    if any(axis is not None for axis in model.spmd):
        return False
    if model.is_high_order:
        return False
    from ..freedrift import FreeDriftSolver

    if isinstance(model.mevp, FreeDriftSolver):
        return False
    # Calibrated on v5e: 12 mEVP planes + 12 quad-velocity planes + donated
    # tracer coeffs + ~33 Mosaic stack temporaries ~= 66 plane-equivalents.
    # Land-mask configs add the two coastline face-mask const planes.
    planes = 12 + 12 + model.transport.basis.n_dofs * n_tracers + 33
    if model.ocean_mask is not None:
        planes += 2
    if model.mevp.params.a_weighted_stress:
        planes += 1  # the a_node drag/wind weighting const plane
    itemsize = 4
    return mesh.nx * mesh.ny * itemsize * planes <= _VMEM_BUDGET


def fused_dynamics_pallas(
    model,  # CoupledModel (static: carries solver, transport, mesh)
    state_arrays,  # (u, v, s11, s22, s12)
    tracers,  # (K, n_tracers, nx, ny) stacked DG coefficients
    consts: dict,  # MEVPSolver.step_consts output
    dt: float,
    n_subcycles: int,
    face_masks=None,  # optional (face_x, face_y) coastline masks
    interpret: bool = False,
):
    """Returns ((u, v, s11, s22, s12), tracers) after one dynamics phase."""
    solver = model.mevp
    transport = model.transport
    mesh = model.mesh
    u = state_arrays[0]
    # Generic over the per-step const planes (7 on the uniform meshes this
    # kernel requires; +a_node when A-weighted stresses are enabled).
    const_names = tuple(sorted(consts))
    const_arrays = [consts[name] for name in const_names]
    n_consts = len(const_names)
    n_masks = 0 if face_masks is None else 2
    mask_arrays = [] if face_masks is None else list(face_masks)

    def kernel(*refs):
        const_refs = refs[:n_consts]
        mask_refs = refs[n_consts : n_consts + n_masks]
        state_refs = refs[n_consts + n_masks : n_consts + n_masks + 5]
        tracer_ref = refs[n_consts + n_masks + 5]
        out_state = refs[n_consts + n_masks + 6 : n_consts + n_masks + 11]
        out_tracer = refs[n_consts + n_masks + 11]

        kconsts = {
            name: ref[:] for name, ref in zip(const_names, const_refs)
        }
        kmasks = None
        if n_masks:
            kmasks = (mask_refs[0][:], mask_refs[1][:])

        def body(_, carry):
            return solver.subcycle_body(carry, kconsts, dt)

        final = jax.lax.fori_loop(
            0, n_subcycles, body, tuple(ref[:] for ref in state_refs)
        )
        for ref, value in zip(out_state, final):
            ref[:] = value

        from ..transport import cfl_substeps, velocity_from_cg

        qv = velocity_from_cg(mesh, transport.basis, final[0], final[1])
        tr = tracer_ref[:]
        if model.auto_substeps:
            # CFL-adaptive substep count computed IN-KERNEL from the final
            # velocity (already VMEM-resident); the dynamic trip count
            # lowers to a Mosaic while loop.
            k = cfl_substeps(
                qv, dt, mesh, transport.basis.degree,
                k_floor=model.transport_substeps,
            )
            dt_sub = dt / k.astype(tr.dtype)
            tr = jax.lax.fori_loop(
                0, k,
                lambda _, t: transport.step(
                    t, qv, dt_sub, limit=True, face_masks=kmasks
                ),
                tr,
            )
        else:
            k_sub = model.transport_substeps
            for _ in range(k_sub):
                tr = transport.step(
                    tr, qv, dt / k_sub, limit=True, face_masks=kmasks
                )
        out_tracer[:] = tr

    out_shapes = [jax.ShapeDtypeStruct(u.shape, u.dtype) for _ in range(5)] + [
        jax.ShapeDtypeStruct(tracers.shape, tracers.dtype)
    ]
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem() for _ in range(n_consts + n_masks + 6)],
        out_specs=[vmem() for _ in range(6)],
        # Single-block kernel: donating the state/tracer inputs halves
        # their VMEM footprint (reads all happen before the writes) — the
        # saving is what lets 256^2 fit the scoped-vmem budget.
        input_output_aliases={n_consts + n_masks + k: k for k in range(6)},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*const_arrays, *mask_arrays, *state_arrays, tracers)
    return tuple(outs[:5]), outs[5]
