"""Headline benchmark: mesh-element updates/s/chip for DG advection + mEVP.

Matches the driver metric (BASELINE.json): the wind-driven box configuration
on a 256x256 mesh, dG1 tracers, 100 mEVP subcycles per step, f32, run on one
real TPU chip. One JSON line is printed:

    {"metric": ..., "value": N, "unit": "elements/s", "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md: early-stage
single-threaded C++ on a 10x10 grid), so ``vs_baseline`` is reported against
a fixed reference-point constant: the measured throughput of this
framework's first TPU run (round 1), making cross-round progress visible.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 first-measurement anchor [element updates/s]; see module docstring.
# Measured 2026-08-17 on one TPU v5e chip with this harness and the unfused
# XLA mEVP path (backend="xla"): 7.217e7 elements/s. The default (fused
# Pallas mEVP kernel) reports its speedup against this anchor.
R1_BASELINE_ELEMENTS_PER_S = 7.217e7


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nextsimdg_tpu.coupled import CoupledModel
    from nextsimdg_tpu.dynamics import MEVPParams, RectMesh
    from nextsimdg_tpu.dynamics.mevp import DynamicsForcing
    from nextsimdg_tpu.state import Forcing

    n = 256
    n_subcycles = 100
    dt = 600.0
    dtype = jnp.float32

    mesh = RectMesh(nx=n, ny=n, dx=512e3 / n, dy=512e3 / n)
    model = CoupledModel(mesh, degree=1, mevp_params=MEVPParams(), n_subcycles=n_subcycles)
    state = model.initial_state(
        hice0=1.0, cice0=0.9, hsnow0=0.05, sst0=-1.6, sss0=32.0, dtype=dtype
    )
    # Wind 8 m/s (the BASELINE config-3 strong-drift box). Round 1 timed
    # wind 5 because 8 m/s exceeded the dG1/RK2 advective CFL by step ~800;
    # CFL-adaptive transport substepping (the default) now raises the
    # substep count in-kernel when the drift is fast, so the honest config
    # runs indefinitely. The adaptivity is ALSO the measured cost: fast
    # -drift steps advect twice at dt/2 (~25% below the wind-5/k=1 number).
    # Every timed run restarts from the initial state (identical work).
    full = lambda v: jnp.full((n, n), v, dtype=dtype)
    phys_forcing = Forcing(
        tair=full(-10.0), dew2m=full(-12.0), pair=full(1e5), sw_in=full(10.0),
        lw_in=full(250.0), mld=full(10.0), snowfall=full(1e-4), wind=full(8.0),
    )
    dyn_forcing = DynamicsForcing(
        u_atm=full(8.0), v_atm=full(2.0), u_ocean=full(0.02), v_ocean=full(0.0)
    )

    # Dynamics-only (BASELINE config 3: thermodynamics off) via lax.scan.
    # Fixed chunk size: the scan is compiled ONCE, warmed up, then timed, so
    # neither compilation nor the per-dispatch RPC latency (~25 ms through
    # the axon tunnel) pollutes the measurement.
    chunk = 1024

    def run(s):
        return model.run(
            s, phys_forcing, dyn_forcing, dt, chunk, do_thermo=False
        )

    def run_synced(s):
        """Run + HARD sync: through the axon tunnel, block_until_ready can
        return while work is still queued (observed: 0.2 ms "runs" after a
        warmup that was never fetched) — fetching a scalar forces real
        completion of everything that produced it."""
        out = run(s)
        probe = float(out.hice[0, 0, 0])
        return out, probe

    _, probe = run_synced(state)  # compile + warmup

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _, probe = run_synced(state)
        best = min(best, time.perf_counter() - t0)
    if not np.isfinite(probe):
        raise RuntimeError("benchmark state went non-finite")

    elements_per_s = n * n * chunk / best
    print(
        json.dumps(
            {
                "metric": "element updates/s/chip (dG1 advection + 100-subcycle mEVP, 256x256, f32)",
                "value": float(f"{elements_per_s:.4g}"),
                "unit": "elements/s",
                "vs_baseline": float(f"{elements_per_s / R1_BASELINE_ELEMENTS_PER_S:.4g}"),
            }
        )
    )


if __name__ == "__main__":
    main()
