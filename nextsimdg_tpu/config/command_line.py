"""Command-line parsing for the model driver.

Mirrors ``CommandLineParser`` (``core/src/CommandLineParser.cpp:23-66``):
recognises ``--help``, ``--config-file <file>`` and
``--config-files <file...>`` and preserves the order config files were given
(which Boost's variables_map does not, hence the reference's manual token
walk — here order preservation is natural).
"""

from __future__ import annotations

import sys
from typing import List, Sequence

USAGE = """\
nextsim [options]
Options:
  --help                 print help message
  --config-file FILE     specify a configuration file
  --config-files FILES   specify a list of configuration files
"""


class CommandLineParser:
    def __init__(self, argv: Sequence[str]) -> None:
        self._config_files: List[str] = []
        self.help_requested = False

        tokens = list(argv[1:])
        i = 0
        while i < len(tokens):
            token = tokens[i]
            if token == "--help":
                self.help_requested = True
                print(USAGE)
            elif token == "--config-file":
                if i + 1 < len(tokens):
                    self._config_files.append(tokens[i + 1])
                    i += 1
            elif token.startswith("--config-file="):
                self._config_files.append(token.partition("=")[2])
            elif token == "--config-files":
                while i + 1 < len(tokens) and not tokens[i + 1].startswith("--"):
                    self._config_files.append(tokens[i + 1])
                    i += 1
            i += 1

    def get_config_file_names(self) -> List[str]:
        """Config file names, in the order they appeared on the command line."""
        return list(self._config_files)
