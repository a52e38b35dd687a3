"""Ice/snow surface albedo modules.

Module interface ``Nextsim::IIceAlbedo``
(``physics/src/modules/include/IIceAlbedo.hpp:13-24``); implementations
mirror ``SMUIceAlbedo.cpp``, ``SMU2IceAlbedo.cpp`` and ``CCSMIceAlbedo.cpp``
(registration order = ``physics/src/modules/modules.json``, SMU default).

Each implementation is ``albedo(tice0, hsnow_true, i0) -> array`` over whole
grids; the scalar branches on snow cover become ``jnp.where`` masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Configured
from ..modules import register_implementation

INTERFACE = "Nextsim::IIceAlbedo"

_SMU_ICE_ALBEDO = 0.64
_SMU_SNOW_ALBEDO = 0.85


@register_implementation(INTERFACE, "Nextsim::SMUIceAlbedo")
class SMUIceAlbedo:
    """Semtner 76 / Maykut & Untersteiner 71 constant albedos with I0 term."""

    def albedo(self, temperature, snow_thickness, i0):
        bare_ice = _SMU_ICE_ALBEDO + 0.4 * (1.0 - _SMU_ICE_ALBEDO) * i0
        return jnp.where(snow_thickness > 0.0, _SMU_SNOW_ALBEDO, bare_ice)


@register_implementation(INTERFACE, "Nextsim::SMU2IceAlbedo")
class SMU2IceAlbedo:
    """SMU with a linear snow-depth ramp over 0.2 m."""

    def albedo(self, temperature, snow_thickness, i0):
        ramp = jnp.minimum(
            _SMU_SNOW_ALBEDO,
            _SMU_ICE_ALBEDO + (_SMU_SNOW_ALBEDO - _SMU_ICE_ALBEDO) * snow_thickness / 0.2,
        )
        bare_ice = _SMU_ICE_ALBEDO + 0.4 * (1.0 - _SMU_ICE_ALBEDO) * i0
        return jnp.where(snow_thickness > 0.0, ramp, bare_ice)


@register_implementation(INTERFACE, "Nextsim::CCSMIceAlbedo")
class CCSMIceAlbedo(Configured):
    """CCSM3 scheme: temperature decay above -1 degC, snow-fraction blend.

    Configurable base albedos ``CCSMIceAlbedo.{iceAlbedo,snowAlbedo}``
    (``CCSMIceAlbedo.cpp:38-42``).
    """

    ICE_ALBEDO0 = 0.538
    SNOW_ALBEDO0 = 0.8256

    def __init__(self) -> None:
        self.ice_albedo = self.ICE_ALBEDO0
        self.snow_albedo = self.SNOW_ALBEDO0

    def configure(self) -> None:
        self.ice_albedo = Configured.get_configuration(
            "CCSMIceAlbedo.iceAlbedo", self.ICE_ALBEDO0
        )
        self.snow_albedo = Configured.get_configuration(
            "CCSMIceAlbedo.snowAlbedo", self.SNOW_ALBEDO0
        )

    def albedo(self, temperature, snow_thickness, i0):
        t_limit = -1.0
        ice_albedo_t = self.ice_albedo - jnp.maximum(0.0, 0.075 * (temperature - t_limit))
        snow_albedo_t = self.snow_albedo - jnp.maximum(0.0, 0.124 * (temperature - t_limit))
        snow_cover = snow_thickness / (snow_thickness + 0.02)
        return snow_cover * snow_albedo_t + (1.0 - snow_cover) * ice_albedo_t
