"""Structured meshes for the dynamical core.

Beyond-snapshot component (SURVEY.md section 2.3/7.3): the reference's only
grid is a fixed 10x10 ``DevGrid``; the dynamics needs a parametric mesh
with geometry. Three geometries:

* uniform rectangular;
* tensor-graded (variable resolution): ``dx`` a per-column array, ``dy``
  per-row — regionally refined pan-Arctic-style grids;
* spherical lon-lat (:class:`SphericalMesh`): logical (i, j) =
  (longitude, latitude) with the zonal metric factor cos(phi) — element
  widths shrink poleward, zonal faces carry their own latitude's length,
  and element areas are the exact spherical-zone areas.

The transport/momentum solvers consume only the metric interface
(``dx``/``dy`` for in-element gradients, ``face_len_x``/``face_len_y`` for
shared-face flux lengths, ``cell_area``), so all three geometries ride the
same kernels.
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
        """Element areas: scalar (uniform) or broadcastable to (nx, ny)."""
        if self.uniform:
            return float(self._dx[0] * self._dy[0])
        return self._dx[:, None] * self._dy[None, :]

    # -- face metric (shared-face flux lengths) -------------------------------
    # The left (x) face of element (i, j) and the bottom (y) face are the
    # OWNED faces; neighbors read them via shifts, so both sides of a shared
    # face see the same length and face-flux exchange is conservative.
    @property
    def face_len_x(self):
        """Length of the left face of element (i, j); broadcastable."""
        return float(self._dy[0]) if self.uniform else self._dy[None, :]

    @property
    def face_len_y(self):
        """Length of the bottom face of element (i, j); broadcastable."""
        return float(self._dx[0]) if self.uniform else self._dx[:, None]

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


#: mean Earth radius [m], as used by ERA5/CF tooling.
EARTH_RADIUS = 6.371e6


class SphericalMesh(RectMesh):
    """Regular lon-lat mesh on the sphere: i ~ longitude, j ~ latitude.

    Metric treatment (piecewise-constant per element / per face):

    * in-element gradients use the element-center widths
      ``dx = R cos(phi_c) dlambda`` (a (1, ny) plane) and ``dy = R dphi``;
    * the zonal (bottom) face of element (i, j) has its OWN latitude's
      length ``R cos(phi_j) dlambda``, shared exactly with the (i, j-1)
      neighbor — face fluxes are conservative and a constant meridional
      velocity correctly converges poleward (the cos(phi) divergence);
    * element areas are the exact zone areas
      ``R^2 dlambda (sin(phi_{j+1}) - sin(phi_j))``.

    Curvature (tan(phi)/R) terms in the velocity-gradient tensor are
    neglected — O(dy/R) relative error, <1% for regional Arctic domains.
    Logical coordinates (``element_centers`` etc.) are arc lengths
    ``x = R*lambda``, ``y = R*phi``; ``lonlat_centers()`` gives degrees.
    """

    def __init__(
        self, nx: int, ny: int, lon0: float, lon1: float,
        lat0: float, lat1: float, radius: float = EARTH_RADIUS,
        periodic_x: bool = False,
    ) -> None:
        lam0, lam1 = np.radians(lon0), np.radians(lon1)
        phi0, phi1 = np.radians(lat0), np.radians(lat1)
        if not (-90.0 < lat0 < 90.0 and -90.0 < lat1 < 90.0):
            raise ValueError("latitudes must be strictly inside (-90, 90)")
        self.radius = float(radius)
        self.dlam = (lam1 - lam0) / nx
        self.dphi = (phi1 - phi0) / ny
        self.lam0 = lam0
        self.phi0 = phi0
        # Base init: logical arc-length spacings (x = R*lambda, y = R*phi).
        super().__init__(
            nx, ny, dx=radius * self.dlam, dy=radius * self.dphi,
            x0=radius * lam0, y0=radius * phi0,
            periodic_x=periodic_x, periodic_y=False,
        )
        self.uniform = False  # per-latitude metric
        phi_nodes = phi0 + np.arange(ny + 1) * self.dphi
        phi_centers = phi0 + (np.arange(ny) + 0.5) * self.dphi
        self._cos_node = np.cos(phi_nodes)  # (ny+1,)
        self._cos_center = np.cos(phi_centers)  # (ny,)
        self._zone_area = (
            radius * radius * self.dlam * np.diff(np.sin(phi_nodes))
        )  # (ny,) exact

    def __hash__(self) -> int:
        return hash((
            "spherical", self.nx, self.ny, self.radius,
            self.lam0, self.phi0, self.dlam, self.dphi, self.periodic_x,
        ))

    def __eq__(self, other) -> bool:
        return isinstance(other, SphericalMesh) and hash(self) == hash(other)

    # -- metric interface ------------------------------------------------------
    @property
    def dx(self):
        """Element-center zonal width R cos(phi_c) dlambda: (1, ny)."""
        return (self.radius * self.dlam) * self._cos_center[None, :]

    @property
    def dy(self):
        """Meridional spacing R dphi (latitude-independent)."""
        return float(self.radius * self.dphi)

    @property
    def cell_area(self):
        """Exact spherical zone areas: (1, ny)."""
        return self._zone_area[None, :]

    @property
    def face_len_x(self):
        """Meridional (left) faces all have length R dphi."""
        return float(self.radius * self.dphi)

    @property
    def face_len_y(self):
        """Zonal (bottom) face of row j: R cos(phi_j) dlambda, (1, ny)."""
        return (self.radius * self.dlam) * self._cos_node[None, :-1]

    def lonlat_centers(self):
        """(lat, lon) element-center arrays in degrees, each (nx, ny)."""
        lons = np.degrees(self.lam0 + (np.arange(self.nx) + 0.5) * self.dlam)
        lats = np.degrees(self.phi0 + (np.arange(self.ny) + 0.5) * self.dphi)
        lat2d = np.broadcast_to(lats[None, :], (self.nx, self.ny))
        lon2d = np.broadcast_to(lons[:, None], (self.nx, self.ny))
        return lat2d, lon2d
