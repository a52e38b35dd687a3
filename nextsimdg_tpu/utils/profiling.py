"""On-device profiling helpers.

The hierarchical host Timer (utils.timer) covers phase boundaries; for
on-device detail use ``jax.profiler`` traces, viewable in TensorBoard /
Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block.

    Example::

        with device_trace("/tmp/nextsim-trace"):
            state = model.run(state, pf, df, dt, 100)
            jax.block_until_ready(state)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for a region (shows up in the trace viewer)."""
    return jax.profiler.TraceAnnotation(name)
