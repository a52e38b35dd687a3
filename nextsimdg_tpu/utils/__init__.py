"""Diagnostics utilities: hierarchical timers and logging."""

from .chrono import Chrono
from .timer import Timer, ScopedTimer, main_timer
from .logged import Logged

__all__ = ["Chrono", "Timer", "ScopedTimer", "main_timer", "Logged"]
