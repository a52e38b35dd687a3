"""Model runtime: time-stepping iterator, model step, model facade, CLI."""

from .iterator import Iterator, Iterant, NullIterant
from .model_step import ModelStep
from .model import Model

__all__ = ["Iterator", "Iterant", "NullIterant", "ModelStep", "Model"]
