"""Device-mesh construction and field sharding rules.

Fields and their layouts:

* cell fields       ``(..., nx, ny)``  -> ``P(..., 'X', 'Y')``
* node (CG) fields  ``(nx+1, ny+1)``   -> ``P('X', 'Y')`` (GSPMD pads the
  ragged last block; halo reads become collective-permutes)
* quad-point velocity ``(NQ, nx, ny)`` / edge fields -> sharded on the two
  spatial dims.

The step functions themselves are ordinary jitted functions: sharded inputs
make XLA partition the whole program (SPMD), inserting the halo exchanges.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _blocked_shape_cost(
    local_nx: int, local_ny: int, n_consts: int = 7
) -> Tuple[int, float]:
    """(tier, per-element cost) of running the blocked mEVP path on one
    device's ``(local_nx, local_ny)`` block.

    Reuses the kernel selection's own measured cost model: widen the
    block by the auto exchange halo, then cost the inner engine that
    selection would pick — the fused VMEM-resident kernel (pure compute
    times the ghost-ring redundancy), the full-row tiled kernel
    (overlap-aware tile cost model times redundancy), the lane-halo
    fallback tiles (tier 1) or per-subcycle XLA streaming (tier 2).
    Lower tier always wins; within a tier, lower cost.
    """
    from ..dynamics.kernels.mevp_pallas import pallas_supported
    from ..dynamics.kernels.mevp_tiled import (
        _COMPUTE_PS_PER_EL,
        _tile_cost_per_element,
        auto_config,
    )
    from ..dynamics.mevp import pick_block_halo

    h = pick_block_halo(local_nx, local_ny, n_consts=n_consts)
    wx, wy = local_nx + 2 * h, local_ny + 2 * h
    redundancy = (wx * wy) / (local_nx * local_ny)
    # Exchange-frequency term: the blocked design pays one neighbor
    # exchange (≈4 messages) per h subcycles, so a clamped-small h on a
    # thin block multiplies the message count. The per-message latency
    # equivalent (2 µs) is NOMINAL — unmeasurable on one chip — but it
    # is negligible for production-size blocks (0.1 ps/el at local
    # 1024², h=64) and only steers tiny blocks away from degenerate
    # thin factorizations whose clamped h would thrash the interconnect.
    exchange = (4.0 / h) * 2e6 / (local_nx * local_ny)
    if pallas_supported(wx, wy, n_consts=n_consts):
        return (0, _COMPUTE_PS_PER_EL * redundancy + exchange)
    cfg = auto_config(wx, wy, n_consts=n_consts)
    if cfg is None:
        return (2, redundancy)
    tile_x, tile_y, halo_x, _halo_y = cfg
    if tile_y != wy:
        return (1, redundancy)  # lane-halo fallback tiles
    cost = _tile_cost_per_element(wx, wy, tile_x, halo_x, n_fields=n_consts + 5)
    return (0, cost * redundancy + exchange)


def pick_mesh_shape(
    n_devices: int, nx: int, ny: int, n_consts: int = 7
) -> Tuple[int, int]:
    """Grid-aware device-mesh factorization (px, py) for an (nx, ny) grid.

    Measured motivation (docs/performance.md, round-5 aspect-ratio
    section): the full-row tiled mEVP kernels hold every plane of a
    ``(tile_x + 2h) x local_ny`` block in VMEM, so wide LOCAL lane
    extents force narrow ``tile_x`` and real halo-redundancy cost — the
    same 16M elements run 15% faster at 1024 local lanes than at 4096.
    Rather than hard-coding "lanes <= 2048", score every factorization
    of the device count whose local block divides the grid with the
    kernel selection's own cost model (:func:`_blocked_shape_cost`) and
    take the argmin; ties break toward the squarest mesh (smallest halo
    perimeter). Falls back to the squarest factorization when no
    factorization divides the grid (GSPMD pads uneven shards).
    """
    best = None
    best_key = None
    for px in range(1, n_devices + 1):
        if n_devices % px:
            continue
        py = n_devices // px
        if nx % px or ny % py:
            continue
        tier, cost = _blocked_shape_cost(nx // px, ny // py, n_consts=n_consts)
        key = (tier, cost, abs(px - py))
        if best_key is None or key < best_key:
            best, best_key = (px, py), key
    if best is not None:
        return best
    px = int(np.floor(np.sqrt(n_devices)))
    while n_devices % px:
        px -= 1
    return (px, n_devices // px)


def make_spatial_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence] = None,
    grid_shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """Create a 2-D ('X', 'Y') device mesh.

    Default shape: as square as the device count allows (e.g. 8 -> 4x2).
    With ``grid_shape`` (the global (nx, ny) element grid) the
    factorization is chosen by :func:`pick_mesh_shape`'s measured cost
    model instead; an explicit ``shape`` always wins.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None and grid_shape is not None:
        shape = pick_mesh_shape(n, *grid_shape)
    if shape is None:
        px = int(np.floor(np.sqrt(n)))
        while n % px:
            px -= 1
        shape = (px, n // px)
    # Auto axis types: GSPMD decides layouts/collectives and supports
    # unevenly-divisible dims (the CG node arrays are (nx+1, ny+1)).
    return jax.make_mesh(
        shape,
        ("X", "Y"),
        devices=devices,
        axis_types=(jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto),
    )


class SpatialPartition:
    """Sharding helpers bound to one device mesh."""

    def __init__(self, mesh: Mesh) -> None:
        self.mesh = mesh

    def spec_for_rank(self, ndim: int) -> P:
        """Spatial spec: last two dims over ('X', 'Y'), leading dims local."""
        if ndim < 2:
            return P()
        return P(*([None] * (ndim - 2) + ["X", "Y"]))

    def sharding_for(self, array) -> NamedSharding:
        return NamedSharding(self.mesh, self.spec_for_rank(np.ndim(array)))

    def shard(self, tree):
        """device_put every array leaf with its spatial sharding."""
        return jax.tree.map(
            lambda leaf: jax.device_put(leaf, self.sharding_for(leaf)), tree
        )

    def constraint(self, tree):
        """Apply with_sharding_constraint inside jit (layout anchoring)."""
        return jax.tree.map(
            lambda leaf: jax.lax.with_sharding_constraint(
                leaf, self.sharding_for(leaf)
            ),
            tree,
        )
