"""Structured rectangular mesh for the dynamical core.

Beyond-snapshot component (SURVEY.md section 2.3/7.3): the reference's only
grid is a fixed 10x10 ``DevGrid``; the dynamics needs a parametric mesh
with geometry. Supports uniform spacing and tensor-graded (variable
resolution) spacing — ``dx`` may be a scalar or a length-nx array of
per-column widths, ``dy`` a scalar or per-row array — which covers
regionally refined pan-Arctic-style grids; fully curvilinear metrics are a
follow-up.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union

import numpy as np

Spacing = Union[float, tuple, np.ndarray]


def _as_spacing(value, count: int) -> np.ndarray:
    arr = np.asarray(value, dtype=np.float64).reshape(-1)
    if arr.size == 1:
        arr = np.full(count, float(arr[0]))
    if arr.size != count:
        raise ValueError(f"spacing has {arr.size} entries, expected {count}")
    return arr


class RectMesh:
    """nx x ny elements; dx per column / dy per row (scalars broadcast).

    ``periodic_x/periodic_y`` select wrap-around vs closed (no-flux /
    no-slip) boundaries.
    """

    def __init__(
        self, nx: int, ny: int, dx: Spacing, dy: Spacing,
        x0: float = 0.0, y0: float = 0.0,
        periodic_x: bool = False, periodic_y: bool = False,
    ) -> None:
        self.nx = int(nx)
        self.ny = int(ny)
        self._dx = _as_spacing(dx, self.nx)
        self._dy = _as_spacing(dy, self.ny)
        self.uniform = bool(
            np.all(self._dx == self._dx[0]) and np.all(self._dy == self._dy[0])
        )
        self.x0 = float(x0)
        self.y0 = float(y0)
        self.periodic_x = bool(periodic_x)
        self.periodic_y = bool(periodic_y)
        # Node positions (left/bottom edges of each element column/row).
        self._xn = self.x0 + np.concatenate([[0.0], np.cumsum(self._dx)])
        self._yn = self.y0 + np.concatenate([[0.0], np.cumsum(self._dy)])

    # Solvers close over mesh objects as static jit arguments.
    def __hash__(self) -> int:
        return hash((
            self.nx, self.ny, self.x0, self.y0, self.periodic_x, self.periodic_y,
            self._dx.tobytes(), self._dy.tobytes(),
        ))

    def __eq__(self, other) -> bool:
        return isinstance(other, RectMesh) and hash(self) == hash(other)

    # -- spacing accessors ---------------------------------------------------
    @property
    def dx(self):
        """Scalar spacing when uniform; (nx, 1) per-column widths otherwise."""
        return float(self._dx[0]) if self.uniform else self._dx[:, None]

    @property
    def dy(self):
        return float(self._dy[0]) if self.uniform else self._dy[None, :]

    @property
    def dx_array(self) -> np.ndarray:
        return self._dx

    @property
    def dy_array(self) -> np.ndarray:
        return self._dy

    @property
    def cell_area(self):
        """Element areas: scalar (uniform) or (nx, ny)."""
        if self.uniform:
            return float(self._dx[0] * self._dy[0])
        return self._dx[:, None] * self._dy[None, :]

    @property
    def n_elements(self) -> int:
        return self.nx * self.ny

    @property
    def lx(self) -> float:
        return float(self._dx.sum())

    @property
    def ly(self) -> float:
        return float(self._dy.sum())

    def element_centers(self):
        """(x, y) arrays of element centers, each (nx, ny)."""
        x = self._xn[:-1] + 0.5 * self._dx
        y = self._yn[:-1] + 0.5 * self._dy
        return np.meshgrid(x, y, indexing="ij")

    def node_coords(self):
        """(x, y) arrays of CG1 node coordinates, each (nx+1, ny+1)."""
        return np.meshgrid(self._xn, self._yn, indexing="ij")

    def edge_x_coords(self, s_edge):
        """Coordinates of vertical-edge quadrature points: (nx+1, ny, NE)."""
        ex = self._xn
        ey = self._yn[:-1][:, None] + s_edge[None, :] * self._dy[:, None]
        x = np.broadcast_to(ex[:, None, None], (self.nx + 1, self.ny, len(s_edge)))
        y = np.broadcast_to(ey[None, :, :], (self.nx + 1, self.ny, len(s_edge)))
        return x, y

    def edge_y_coords(self, s_edge):
        """Coordinates of horizontal-edge quadrature points: (nx, ny+1, NE)."""
        ex = self._xn[:-1][:, None] + s_edge[None, :] * self._dx[:, None]
        ey = self._yn
        x = np.broadcast_to(ex[:, None, :], (self.nx, self.ny + 1, len(s_edge)))
        y = np.broadcast_to(ey[None, :, None], (self.nx, self.ny + 1, len(s_edge)))
        return x, y

    def volume_quad_coords(self, xq_vol, yq_vol):
        """Coordinates of volume quadrature points: each (NQ, nx, ny)."""
        x = self._xn[:-1][None, :, None] + xq_vol[:, None, None] * self._dx[None, :, None]
        y = self._yn[:-1][None, None, :] + yq_vol[:, None, None] * self._dy[None, None, :]
        x = np.broadcast_to(x, (len(xq_vol), self.nx, self.ny))
        y = np.broadcast_to(y, (len(yq_vol), self.nx, self.ny))
        return x, y
