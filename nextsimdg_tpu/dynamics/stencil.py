"""Neighbor-shift primitives with boundary conditions.

All dynamics fields use the *owned* layout: arrays are exactly (..., nx, ny).

* cell fields: value of element (i, j);
* node fields: value of CG node (i, j) — the i=nx / j=ny boundary nodes are
  not stored (for closed domains they are Dirichlet-zero; for periodic they
  wrap to index 0);
* x-edge fields: the face between elements (i-1, j) and (i, j) — the right
  domain-boundary face is implicit (zero flux when closed, wraps when
  periodic); y-edges analogous.

Uniform shapes mean uniform sharding over the device mesh and uniform
Pallas tiles; shifts become ``jnp.roll`` (a collective-permute under SPMD)
or zero-filled concatenations.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def shift_p(f, axis: int, periodic: bool):
    """f[i+1] along ``axis``: the +1 neighbor; zero-filled when closed.

    Static slices + concatenate (not gather) so the same code lowers both in
    XLA and inside Pallas/Mosaic kernels.
    """
    if periodic:
        return jnp.roll(f, -1, axis=axis)
    moved = lax.slice_in_dim(f, 1, f.shape[axis], axis=axis)
    pad = jnp.zeros_like(lax.slice_in_dim(f, 0, 1, axis=axis))
    return lax.concatenate([moved, pad], dimension=axis)


def shift_m(f, axis: int, periodic: bool):
    """f[i-1] along ``axis``: the -1 neighbor; zero-filled when closed."""
    if periodic:
        return jnp.roll(f, 1, axis=axis)
    moved = lax.slice_in_dim(f, 0, f.shape[axis] - 1, axis=axis)
    pad = jnp.zeros_like(lax.slice_in_dim(f, 0, 1, axis=axis))
    return lax.concatenate([pad, moved], dimension=axis)
