"""Restart / checkpoint I/O."""

from .restart import RestartFields, read_restart, write_restart, read_structure_type

__all__ = ["RestartFields", "read_restart", "write_restart", "read_structure_type"]
