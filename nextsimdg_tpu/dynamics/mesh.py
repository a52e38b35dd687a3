"""Structured rectangular mesh for the dynamical core.

Beyond-snapshot component (SURVEY.md section 2.3/7.3): the reference's only
grid is a fixed 10x10 ``DevGrid``; the dynamics needs a parametric mesh with
geometry. Uniform rectangular for now (per-element metric terms reduce to
the constants dx, dy); coordinates are kept for forcing/benchmark setup.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class RectMesh:
    """nx x ny elements of size dx x dy; origin (x0, y0).

    ``periodic_x/periodic_y`` select wrap-around vs closed (no-flux /
    no-slip) boundaries.
    """

    nx: int
    ny: int
    dx: float
    dy: float
    x0: float = 0.0
    y0: float = 0.0
    periodic_x: bool = False
    periodic_y: bool = False

    @property
    def n_elements(self) -> int:
        return self.nx * self.ny

    @property
    def lx(self) -> float:
        return self.nx * self.dx

    @property
    def ly(self) -> float:
        return self.ny * self.dy

    def element_centers(self):
        """(x, y) arrays of element centers, each (nx, ny)."""
        x = self.x0 + (np.arange(self.nx) + 0.5) * self.dx
        y = self.y0 + (np.arange(self.ny) + 0.5) * self.dy
        return np.meshgrid(x, y, indexing="ij")

    def node_coords(self):
        """(x, y) arrays of CG1 node coordinates, each (nx+1, ny+1)."""
        x = self.x0 + np.arange(self.nx + 1) * self.dx
        y = self.y0 + np.arange(self.ny + 1) * self.dy
        return np.meshgrid(x, y, indexing="ij")

    def edge_x_coords(self, s_edge):
        """Coordinates of vertical-edge quadrature points: (nx+1, ny, NE)."""
        ex = self.x0 + np.arange(self.nx + 1) * self.dx
        ey = self.y0 + np.arange(self.ny)[:, None] * self.dy + s_edge[None, :] * self.dy
        x = np.broadcast_to(ex[:, None, None], (self.nx + 1, self.ny, len(s_edge)))
        y = np.broadcast_to(ey[None, :, :], (self.nx + 1, self.ny, len(s_edge)))
        return x, y

    def edge_y_coords(self, s_edge):
        """Coordinates of horizontal-edge quadrature points: (nx, ny+1, NE)."""
        ex = self.x0 + np.arange(self.nx)[:, None] * self.dx + s_edge[None, :] * self.dx
        ey = self.y0 + np.arange(self.ny + 1) * self.dy
        x = np.broadcast_to(ex[:, None, :], (self.nx, self.ny + 1, len(s_edge)))
        y = np.broadcast_to(ey[None, :, None], (self.nx, self.ny + 1, len(s_edge)))
        return x, y

    def volume_quad_coords(self, xq_vol, yq_vol):
        """Coordinates of volume quadrature points: each (NQ, nx, ny)."""
        x = self.x0 + (np.arange(self.nx)[None, :, None] + xq_vol[:, None, None]) * self.dx
        y = self.y0 + (np.arange(self.ny)[None, None, :] + yq_vol[:, None, None]) * self.dy
        x = np.broadcast_to(x, (len(xq_vol), self.nx, self.ny))
        y = np.broadcast_to(y, (len(yq_vol), self.nx, self.ny))
        return x, y
