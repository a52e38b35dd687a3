"""Large-grid mEVP backend comparison (XLA vs temporally-blocked tiled).

Times a scan of outer steps around a single dispatch so the ~25 ms axon
tunnel latency is amortized. Usage:

    python benchmarks/mevp_large.py [n ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

from nextsimdg_tpu.dynamics import MEVPParams, RectMesh
from nextsimdg_tpu.dynamics.mevp import DynamicsForcing, MEVPSolver, VelocityState


def bench(n, backend, n_sub=100, outer=None, reps=3, **tiled_kwargs):
    outer = outer or max(1, 2_000_000_000 // (n * n * n_sub))
    mesh = RectMesh(nx=n, ny=n, dx=4e6 / n, dy=4e6 / n)
    solver = MEVPSolver(mesh, MEVPParams(), backend=backend)
    if tiled_kwargs:
        # Force a specific tile/halo config by overriding the auto-tuner
        # (the solver passes auto_config's choice as explicit kwargs).
        from nextsimdg_tpu.dynamics.kernels import mevp_tiled
        g = tiled_kwargs.get
        cfg = (
            g("tile_x", g("tile", mevp_tiled.DEFAULT_TILE_X)),
            g("tile_y", g("tile", mevp_tiled.DEFAULT_TILE_Y)),
            g("halo_x", g("halo", mevp_tiled.DEFAULT_HALO_X)),
            g("halo_y", g("halo", mevp_tiled.DEFAULT_HALO_Y)),
        )
        mevp_tiled.auto_config = lambda nx, ny: cfg
    dtype = jnp.float32
    full = lambda v: jnp.full((n, n), v, dtype)
    state = VelocityState.zeros(n, n, dtype)
    df = DynamicsForcing(
        u_atm=full(8.0), v_atm=full(2.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )
    mask = solver.boundary_mask(dtype=dtype)
    h, a = full(1.0), full(0.9)

    @jax.jit
    def run(st):
        def body(s, _):
            return solver.step(s, h, a, df, mask, 600.0, n_sub), None

        out, _ = jax.lax.scan(body, st, None, length=outer)
        return out

    def run_synced(s):
        # block_until_ready through the axon tunnel can return while work
        # is still queued; fetching one scalar forces real completion.
        out = run(s)
        float(out.u[0, 0])
        return out

    st = run_synced(state)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st = run_synced(st)
        best = min(best, (time.perf_counter() - t0) / outer)
    print(
        f"n={n} backend={backend}: {best*1e3:.1f} ms / {n_sub} subcycles "
        f"({n*n*n_sub/best/1e9:.2f}G subcycle-elements/s, outer={outer})"
    )
    return best


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    for n in sizes:
        t_x = bench(n, "xla")
        t_t = bench(n, "pallas-tiled")
        print(f"  -> tiled/xla speedup at {n}: {t_x/t_t:.2f}x")
