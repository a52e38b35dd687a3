"""Configurable rectangular grid.

Beyond-snapshot structure (SURVEY.md section 7.3 item 6): generalises DevGrid
to an arbitrary nx x ny x nlayers rectangular mesh for the benchmark configs
(128^2, 256^2, ~1M, ~16M elements). Structure name ``"rectgrid"``; grid shape
comes from the restart file when loading, or from config keys
``rectgrid.{nx,ny,nlayers}`` when created empty.
"""

from __future__ import annotations

from ..config import Configured
from ..io.restart import RestartFields
from ..modules import register_implementation
from ..state import dummy_forcing, zeros_prognostic
from .structure import IStructure


@register_implementation("Nextsim::IStructure", "Nextsim::RectGrid")
class RectGrid(IStructure, Configured):
    structure_name = "rectgrid"

    def __init__(self, nx: int = 0, ny: int = 0, nlayers: int = 1) -> None:
        super().__init__()
        self._nx = nx
        self._ny = ny
        self._nlayers = nlayers

    def configure(self) -> None:
        self._nx = int(Configured.get_configuration("rectgrid.nx", self._nx or 128))
        self._ny = int(Configured.get_configuration("rectgrid.ny", self._ny or 128))
        self._nlayers = int(
            Configured.get_configuration("rectgrid.nlayers", self._nlayers or 1)
        )

    @property
    def nx(self) -> int:
        return self._nx

    @property
    def ny(self) -> int:
        return self._ny

    def n_ice_layers(self) -> int:
        return self._nlayers

    def load_restart(self, fields: RestartFields) -> None:
        self._nx = fields.nx
        self._ny = fields.ny
        self._nlayers = fields.n_ice_layers
        super().load_restart(fields)

    def init_empty(self) -> None:
        if not (self._nx and self._ny):
            self.configure()
        self.prognostic = zeros_prognostic(
            self._nx, self._ny, self._nlayers, dtype=self.dtype
        )

    def set_dummy_forcing(self) -> None:
        self.forcing = dummy_forcing(self._nx, self._ny, dtype=self.dtype)
