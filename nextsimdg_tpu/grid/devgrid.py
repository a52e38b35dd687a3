"""The development 10x10 grid.

Mirrors ``DevGrid`` (``core/src/modules/DevGrid.cpp``,
``modules/include/DevGrid.hpp``): fixed 10x10 elements, one ice layer,
structure name ``"devgrid"``. Registered as a module implementation of
``Nextsim::IStructure`` under the reference's name ``Nextsim::DevGrid``
(``core/src/modules/modules.json:9-14``).
"""

from __future__ import annotations

from ..modules import register_implementation
from ..state import dummy_forcing, zeros_prognostic
from .structure import IStructure


@register_implementation("Nextsim::IStructure", "Nextsim::DevGrid")
class DevGrid(IStructure):
    structure_name = "devgrid"

    NX = 10  #: DevGrid.cpp:20
    N_ICE_LAYERS = 1  #: DevGrid.hpp:49

    @property
    def nx(self) -> int:
        return self.NX

    @property
    def ny(self) -> int:
        return self.NX

    def n_ice_layers(self) -> int:
        return self.N_ICE_LAYERS

    def init_empty(self) -> None:
        self.prognostic = zeros_prognostic(
            self.nx, self.ny, self.N_ICE_LAYERS, dtype=self.dtype
        )

    def set_dummy_forcing(self) -> None:
        self.forcing = dummy_forcing(self.nx, self.ny, dtype=self.dtype)
