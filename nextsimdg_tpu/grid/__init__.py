"""Model structures (grids) and the structure factory."""

from .structure import IStructure
from .devgrid import DevGrid
from .rectgrid import RectGrid
from .factory import StructureFactory

__all__ = ["IStructure", "DevGrid", "RectGrid", "StructureFactory"]
