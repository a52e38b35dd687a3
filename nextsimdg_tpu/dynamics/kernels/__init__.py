"""Pallas TPU kernels for the dynamics hot paths."""

from .mevp_pallas import mevp_subcycles_pallas, pallas_supported

__all__ = ["mevp_subcycles_pallas", "pallas_supported"]
