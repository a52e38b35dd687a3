"""Configuration subsystem.

Reimplements the reference's Boost.program_options-based configuration stack
(``core/src/Configurator.cpp``, ``core/src/include/Configured.hpp``,
``core/src/ConfiguredModule.cpp``, ``core/src/CommandLineParser.cpp``) with
identical semantics but no Boost:

* INI files / streams with ``[section]`` + ``key = value`` mapping to dotted
  option names (``section.key``);
* first-parsed-wins precedence: command line beats files, earlier files beat
  later files;
* unknown options are ignored; parse errors in one stream are reported and
  that stream skipped;
* per-consumer defaults.
"""

from .configurator import Configurator, OptionsDescription, ConfigOption
from .configured import Configured, try_configure
from .configured_module import ConfiguredModule
from .command_line import CommandLineParser

__all__ = [
    "Configurator",
    "OptionsDescription",
    "ConfigOption",
    "Configured",
    "try_configure",
    "ConfiguredModule",
    "CommandLineParser",
]
