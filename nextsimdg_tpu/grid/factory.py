"""Structure factory.

Mirrors ``StructureFactory`` (``core/src/StructureFactory.cpp:20-59``):
``generate(name)`` walks the registered implementations of
``Nextsim::IStructure`` and matches the (case-insensitive) structure name,
raising on an unknown name; ``generate_from_file`` dispatches on the
``/structure@type`` attribute of a restart file.
"""

from __future__ import annotations

from ..io.restart import read_structure_type
from ..modules import ModuleRegistry
from .structure import IStructure

INTERFACE = "Nextsim::IStructure"


class StructureFactory:
    @staticmethod
    def generate(name: str) -> IStructure:
        loader = ModuleRegistry.get_loader()
        for impl_name in loader.list_implementations(INTERFACE):
            loader_impl = loader._factories[INTERFACE][impl_name]
            candidate = loader_impl()
            if candidate.handles_structure_name(name):
                return candidate
        raise ValueError(f"Invalid structure name: {name}")

    @staticmethod
    def generate_from_file(file_path: str) -> IStructure:
        structure_type = read_structure_type(file_path)
        structure = StructureFactory.generate(structure_type)
        structure.init(file_path)
        return structure
