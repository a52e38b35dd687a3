"""Seawater freezing-point modules.

Module interface ``Nextsim::IFreezingPoint``
(``core/src/modules/include/IFreezingPoint.hpp:14-28``), implementations
``LinearFreezing`` (default) and ``UnescoFreezing``
(``core/src/modules/include/{Linear,Unesco}Freezing.hpp``); registration order
follows ``core/src/modules/modules.json:2-8``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import Water
from ..modules import register_implementation

INTERFACE = "Nextsim::IFreezingPoint"


@register_implementation(INTERFACE, "Nextsim::LinearFreezing")
class LinearFreezing:
    """T_f = -mu * S (mu > 0, so the freezing point is below zero) [degC]."""

    def __call__(self, sss):
        return -Water.mu * sss


@register_implementation(INTERFACE, "Nextsim::UnescoFreezing")
class UnescoFreezing:
    """Fofonoff & Millard (UNESCO tech. papers 44, 1983) polynomial [degC]."""

    A0 = -0.0575
    A1 = +1.710523e-3
    A2 = -2.154996e-4
    B = -7.53e-4

    def __call__(self, sss):
        p0 = 0.0  # zero hydrostatic pressure
        return sss * (self.A0 + self.A1 * jnp.sqrt(sss) + self.A2 * sss) + self.B * p0
