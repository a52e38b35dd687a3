"""Fused Pallas kernel for the mEVP subcycle loop.

The XLA path runs each subcycle as a chain of fused elementwise/stencil ops,
re-reading ~10 (nx, ny) arrays from HBM per subcycle. This kernel instead
keeps the ENTIRE subcycle state resident in VMEM for all N subcycles: the
9 constant fields plus 5 state fields at f32 are ~14 bytes/element, so up
to ~512x512 fits the ~16 MB VMEM of a TPU core; HBM is touched once on the
way in and once on the way out, a ~Nx reduction in memory traffic for the
dominant loop of the model.

The numerical body is ``MEVPSolver.subcycle_body`` — the exact same jnp
code as the XLA path (bit-identical math), traced inside the kernel; the
shifts lower to Mosaic sublane/lane rotations and concatenations.

Scope: single-block kernel — grids whose state fits VMEM. Larger grids
keep the XLA path (which GSPMD also shards over device meshes); a
halo-tiled multi-block variant is the planned follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Scoped-VMEM cap requested from Mosaic [bytes]. The Mosaic default is
#: 16 MB (a fraction of the 128 MB physical VMEM of a v5e core, left low
#: so XLA fusions can co-allocate); a pallas_call is the only tenant of
#: its core while it runs, so the fused kernel requests most of the chip.
_VMEM_LIMIT = 110 * 1024 * 1024
#: VMEM budget for the kernel's residents [bytes]. The Mosaic fori-loop
#: stack temporaries (~12 further planes) scale with the block and must
#: also fit: measured on v5e, 768^2 (47 MB of residents) compiles and
#: runs 1.18x over XLA, 1024^2 (84 MB) exceeds physical VMEM.
_VMEM_BUDGET = 48 * 1024 * 1024
#: Fields held resident: n_consts constants + 5 state + ~8 live
#: temporaries (7 consts uniform; +5 metric planes graded/spherical).
_RESIDENT_EXTRA = 13


def pallas_supported(nx: int, ny: int, itemsize: int = 4, n_consts: int = 7) -> bool:
    """Whether the single-block fused kernel fits this grid in VMEM."""
    return nx * ny * itemsize * (n_consts + _RESIDENT_EXTRA) <= _VMEM_BUDGET


def mevp_subcycles_pallas(
    solver,  # MEVPSolver (carries mesh + params; static)
    state_arrays,  # (u, v, s11, s22, s12)
    consts: dict,  # strength, m_safe, active, tau_au/av, u/v_ocean, u_n/v_n
    dt: float,
    n_subcycles: int,
    interpret: bool = False,
):
    """Run n_subcycles fused in one Pallas call; returns (u, v, s11, s22, s12)."""
    u, v, s11, s22, s12 = state_arrays
    # Sorted dynamic const set: 7 planes uniform, +5 metric planes on
    # graded/spherical meshes (step_consts).
    const_names = tuple(sorted(consts))
    const_arrays = [consts[name] for name in const_names]

    def kernel(*refs):
        const_refs = refs[: len(const_names)]
        in_state = refs[len(const_names) : len(const_names) + 5]
        out_state = refs[len(const_names) + 5 :]
        kconsts = {
            name: ref[:] for name, ref in zip(const_names, const_refs)
        }

        def body(_, carry):
            return solver.subcycle_body(carry, kconsts, dt)

        final = jax.lax.fori_loop(
            0, n_subcycles, body, tuple(ref[:] for ref in in_state)
        )
        for ref, value in zip(out_state, final):
            ref[:] = value

    out_shapes = [jax.ShapeDtypeStruct(u.shape, u.dtype) for _ in range(5)]
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem() for _ in range(len(const_names) + 5)],
        out_specs=[vmem() for _ in range(5)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*const_arrays, u, v, s11, s22, s12)
