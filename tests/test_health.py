"""Failure detection + elastic recovery (runtime/health.py).

The reference has no failure detection (SURVEY §5; the only resilience
is Model.cpp:40-53's best-effort restart write) — these tests cover the
production-side machinery the TPU build adds on top.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from nextsimdg_tpu.runtime.health import (
    HealthMonitor,
    NonFiniteStateError,
    finite_probe,
)


@dataclasses.dataclass
class ToyState:
    a: jnp.ndarray
    b: jnp.ndarray


import jax

jax.tree_util.register_pytree_node(
    ToyState,
    lambda s: ((s.a, s.b), None),
    lambda _, c: ToyState(*c),
)


def make_state(bad=False):
    a = jnp.ones((4, 4))
    b = jnp.zeros((4, 4))
    if bad:
        b = b.at[2, 2].set(jnp.nan)
    return ToyState(a, b)


def test_finite_probe_detects_nan_and_inf():
    assert finite_probe(make_state())
    assert not finite_probe(make_state(bad=True))
    inf_state = ToyState(jnp.ones(3).at[0].set(jnp.inf), jnp.zeros(3))
    assert not finite_probe(inf_state)
    # Non-array leaves (e.g. static metadata) are ignored, empty is fine.
    assert finite_probe({"meta": "name", "x": jnp.ones(2)})
    assert finite_probe({})


def test_monitor_records_good_and_probes_on_period():
    mon = HealthMonitor(period=2, mode="abort")
    mon.record_good(0, 0.0, make_state())
    assert mon.after_step(1, 600.0, make_state()) == "ok"  # not due
    assert not mon.due(1)
    assert mon.due(2)
    assert mon.after_step(2, 1200.0, make_state()) == "ok"
    assert mon.last_good[0] == 2


def test_monitor_abort_mode_raises_with_last_good():
    mon = HealthMonitor(period=1, mode="abort")
    mon.record_good(0, 0.0, make_state())
    mon.after_step(1, 600.0, make_state())
    with pytest.raises(NonFiniteStateError) as err:
        mon.after_step(2, 1200.0, make_state(bad=True))
    assert err.value.step == 2
    assert err.value.last_good[0] == 1
    assert finite_probe(err.value.last_good[2])


def test_monitor_retry_halved_schedules_replay_then_recovers():
    mon = HealthMonitor(period=2, mode="retry-halved")
    good = make_state()
    mon.record_good(0, 0.0, good)
    assert mon.after_step(1, 600.0, good) == "ok"
    assert mon.after_step(2, 1200.0, make_state(bad=True)) == "rollback"
    step, t, state = mon.rollback_target()
    assert (step, t) == (0, 0.0)
    assert state is good
    # Replay the 2-step segment as 4 half-steps; healthy at segment end.
    assert mon.recovering
    assert mon.after_step(0, 300.0, good) == "ok"
    assert mon.after_step(0, 600.0, good) == "ok"
    assert mon.after_step(1, 900.0, good) == "ok"
    assert mon.recovering
    assert mon.after_step(2, 1200.0, good) == "ok"  # segment-end probe
    assert not mon.recovering
    assert mon.last_good[0] == 2
    # The retry re-arms after a successful recovery: a later failure
    # rolls back again instead of aborting.
    assert mon.after_step(4, 2400.0, make_state(bad=True)) == "rollback"


def test_monitor_retry_halved_aborts_when_replay_fails_too():
    mon = HealthMonitor(period=1, mode="retry-halved")
    mon.record_good(0, 0.0, make_state())
    assert mon.after_step(1, 600.0, make_state(bad=True)) == "rollback"
    assert mon.after_step(0, 300.0, make_state(bad=True)) == "ok"  # mid-segment
    with pytest.raises(NonFiniteStateError):
        mon.after_step(1, 600.0, make_state(bad=True))  # segment-end probe


def test_monitor_disabled_when_period_zero():
    mon = HealthMonitor(period=0)
    # Never probes, never raises — even on a poisoned state.
    assert mon.after_step(5, 0.0, make_state(bad=True)) == "ok"
    assert not mon.due(5)


def test_monitor_rejects_unknown_mode():
    with pytest.raises(ValueError):
        HealthMonitor(period=1, mode="carry-on")


def test_finite_probe_is_cheap_scalar_fetch():
    """The probe reduces on device; only a bool crosses to the host."""
    big = ToyState(jnp.ones((256, 256)), jnp.ones((256, 256)))
    out = finite_probe(big)
    assert isinstance(out, bool) and out
    assert not finite_probe(
        ToyState(big.a, big.b.at[100, 200].set(np.inf))
    )
