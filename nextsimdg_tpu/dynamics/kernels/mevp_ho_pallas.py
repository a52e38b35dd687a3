"""Fused Pallas kernel for the higher-order (CG2/dG1) mEVP subcycle loop.

The HO discretization is the neXtSIM_DG dynamical core (CG2 velocity,
dG1 stress — cf. BASELINE.json north star); per subcycle its XLA path
re-streams ~46 (nx, ny) planes from HBM (17 state + 29 constants), which
made it ~4.4x the CG1 solver's cost at 256^2 despite only ~5x the dofs.

This kernel keeps EVERYTHING resident in VMEM for all N subcycles — the
same single-block strategy as ``mevp_pallas`` for the CG1 solver — and
traces the *identical* numerical body ``MEVPSolverHO.subcycle_body``
(bit-consistent with the XLA path; the gather/scatter shifts lower to
Mosaic sublane/lane rotations, the tiny dG/CG2 basis contractions stay
statically unrolled VPU multiply-adds via ``transport.apply_table``).

VMEM budget: 17 state planes + 29 const planes in/out plus the Mosaic
fori-loop stack for the body's live temporaries (the 9-node gathers, the
NQ=9 Gauss-point arrays for 3 strain + 3 stress components, and the
scatter accumulations — ~110 further plane-equivalents measured). Against
the raised 110 MB scoped-VMEM cap this covers ~256^2 per block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cg2basis import PLANES

_VMEM_LIMIT = 110 * 1024 * 1024
_VMEM_BUDGET = 96 * 1024 * 1024
#: Plane-equivalents held live beyond the consts: 17 state inputs + 17
#: outputs + ~65 loop temporaries of the traced HO body (the dominant
#: Gauss-point stacks halved with the 2x2 constitutive rule; validated on
#: hardware near the limit). Consts: 29 uniform, 33 graded/spherical.
_RESIDENT_EXTRA = 99


def ho_pallas_supported(nx: int, ny: int, itemsize: int = 4, n_consts: int = 29) -> bool:
    """Whether the fused HO kernel fits this grid in VMEM (f32: ~371^2)."""
    return nx * ny * itemsize * (n_consts + _RESIDENT_EXTRA) <= _VMEM_BUDGET


def ho_subcycles_pallas(
    solver,  # MEVPSolverHO (static; carries mesh + params + tables)
    carry0,  # (u: HOField, v: HOField, s11, s22, s12)
    consts: dict,  # the 29 per-step constant planes (step_consts)
    dt: float,
    n_subcycles: int,
    interpret: bool = False,
):
    """Run n_subcycles fused in one Pallas call; returns the carry tuple."""
    from ..mevp_ho import HOField

    u, v, s11, s22, s12 = carry0
    state_arrays = (
        [getattr(u, k) for k in PLANES]
        + [getattr(v, k) for k in PLANES]
        + [s11, s22, s12]
    )
    const_names = tuple(sorted(consts))
    const_arrays = [consts[name] for name in const_names]
    n_c = len(const_arrays)
    n_s = len(state_arrays)

    def kernel(*refs):
        const_refs = refs[:n_c]
        in_refs = refs[n_c : n_c + n_s]
        out_refs = refs[n_c + n_s :]
        kconsts = {
            name: ref[:] for name, ref in zip(const_names, const_refs)
        }
        vals = [ref[:] for ref in in_refs]
        carry = (
            HOField(**{k: vals[i] for i, k in enumerate(PLANES)}),
            HOField(**{k: vals[4 + i] for i, k in enumerate(PLANES)}),
            vals[8], vals[9], vals[10],
        )

        def body(_, c):
            return solver.subcycle_body(c, kconsts, dt)

        fu, fv, f11, f22, f12 = jax.lax.fori_loop(0, n_subcycles, body, carry)
        finals = (
            [getattr(fu, k) for k in PLANES]
            + [getattr(fv, k) for k in PLANES]
            + [f11, f22, f12]
        )
        for ref, value in zip(out_refs, finals):
            ref[:] = value

    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in state_arrays]
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem() for _ in range(n_c + n_s)],
        out_specs=[vmem() for _ in range(n_s)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*const_arrays, *state_arrays)
    return (
        HOField(**{k: outs[i] for i, k in enumerate(PLANES)}),
        HOField(**{k: outs[4 + i] for i, k in enumerate(PLANES)}),
        outs[8], outs[9], outs[10],
    )
