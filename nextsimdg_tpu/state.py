"""Model state pytrees.

TPU-native replacement for the reference's per-element data model
(``core/src/include/{PrognosticData,ExternalData}.hpp``,
``physics/src/include/PhysicsData.hpp``, ``core/src/include/ElementData.hpp``):
instead of a ``std::vector<ElementData>`` of heap objects (AoS), state is a
structure-of-arrays pytree — one ``jnp`` array per field over the whole grid —
so the per-element physics becomes batched vector arithmetic on the VPU and
the per-element "loop" disappears into XLA.

Array layout: 2-D fields are ``(nx, ny)`` matching the restart-file dims
(``DevGridIO.cpp:169-201``); layered fields are ``(nlayers, nx, ny)`` with the
small layer dim leading so the big spatial dims map onto TPU (sublane, lane).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _pytree(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are leaves)."""
    return jax.tree_util.register_dataclass(
        cls,
        data_fields=[f.name for f in dataclasses.fields(cls)],
        meta_fields=[],
    )


@_pytree
@dataclass(frozen=True)
class PrognosticState:
    """Fields carried across timesteps (cf. ``PrognosticData.hpp:89-96``).

    ``hice`` and ``hsnow`` are *effective* (cell-mean) thicknesses; the
    per-ice-area "true" thicknesses are derived (``PrognosticData.hpp:56,75``).
    """

    hice: jax.Array  #: effective ice thickness [m], (nx, ny)
    cice: jax.Array  #: ice concentration [1], (nx, ny)
    hsnow: jax.Array  #: effective snow thickness [m], (nx, ny)
    sst: jax.Array  #: sea surface temperature [degC], (nx, ny)
    sss: jax.Array  #: sea surface salinity [psu], (nx, ny)
    tice: jax.Array  #: ice temperatures [degC], (nlayers, nx, ny)

    @property
    def n_ice_layers(self) -> int:
        return self.tice.shape[0]

    @property
    def shape(self):
        return self.hice.shape

    def ice_true_thickness(self) -> jax.Array:
        """True ice thickness: hice/cice, zero where there is no ice."""
        return safe_div(self.hice, self.cice)

    def snow_true_thickness(self) -> jax.Array:
        """True snow thickness over the ice-covered fraction."""
        return safe_div(self.hsnow, self.cice)


@_pytree
@dataclass(frozen=True)
class Forcing:
    """External forcing per element (cf. ``ExternalData.hpp:22-76``).

    ``wind`` is the 10 m wind speed, which the reference keeps in
    ``PhysicsData::windSpeed`` but which is an external input.
    """

    tair: jax.Array  #: 2 m air temperature [degC]
    dew2m: jax.Array  #: 2 m dew point temperature [degC]
    pair: jax.Array  #: sea level air pressure [Pa]
    sw_in: jax.Array  #: incoming shortwave flux [W m-2]
    lw_in: jax.Array  #: incoming longwave flux [W m-2]
    mld: jax.Array  #: ocean mixed layer depth [m]
    snowfall: jax.Array  #: snowfall rate [kg m-2 s-1]
    wind: jax.Array  #: wind speed [m s-1]

    def mixed_layer_bulk_heat_capacity(self) -> jax.Array:
        """Areal mixed-layer heat capacity mld*rho_ocean*cp [J K-1 m-2]."""
        from .constants import Water

        return self.mld * Water.rho_ocean * Water.cp


@_pytree
@dataclass(frozen=True)
class PhysicsDiagnostics:
    """Per-step physics fluxes and rates (cf. ``NextsimPhysics.hpp`` members).

    Pure outputs of one physics step, returned for coupling/diagnostics; only
    ``new_ice`` is carried across steps (the reference keeps ``m_newice`` as
    persistent per-element state that is only overwritten in the freezing
    branch, ``NextsimPhysics.cpp:244-253``).
    """

    evap: jax.Array  #: open-water evaporation rate [kg m-2 s-1]
    subl: jax.Array  #: sublimation rate [kg m-2 s-1]
    q_ow: jax.Array  #: net open-water heat flux [W m-2]
    q_ia: jax.Array  #: net ice-atmosphere heat flux [W m-2]
    q_io: jax.Array  #: ice-ocean heat flux [W m-2]
    dq_dt: jax.Array  #: d(q_ia)/d(T_surf) [W m-2 K-1]
    drag_pressure: jax.Array  #: wind drag pressure [Pa]
    new_ice: jax.Array  #: new-ice volume formed from supercooling [m]
    h_ice_from_snow: jax.Array  #: ice formed by flooded snow [m]


class PrognosticBuilder:
    """Fluent builder for prognostic states.

    SoA equivalent of ``PrognosticGenerator``
    (``core/src/include/PrognosticGenerator.hpp:17-90``): each setter accepts
    a scalar (broadcast over the grid) or a full array; ``build(nx, ny)``
    assembles the :class:`PrognosticState`.
    """

    def __init__(self, nx: int, ny: int, nlayers: int = 1, dtype=None):
        self._nx, self._ny, self._nlayers = nx, ny, nlayers
        self._dtype = dtype if dtype is not None else jnp.float64
        self._fields = {
            "hice": 0.0, "cice": 0.0, "hsnow": 0.0, "sst": 0.0, "sss": 0.0,
        }
        self._tice = 0.0

    def hice(self, value):
        self._fields["hice"] = value
        return self

    def cice(self, value):
        self._fields["cice"] = value
        return self

    def hsnow(self, value):
        self._fields["hsnow"] = value
        return self

    def sst(self, value):
        self._fields["sst"] = value
        return self

    def sss(self, value):
        self._fields["sss"] = value
        return self

    def tice(self, value):
        """Ice temperatures: scalar, (nlayers,) or (nlayers, nx, ny)."""
        self._tice = value
        return self

    def build(self) -> PrognosticState:
        shape = (self._nx, self._ny)
        to_field = lambda v: jnp.broadcast_to(
            jnp.asarray(v, dtype=self._dtype), shape
        )
        tice = jnp.asarray(self._tice, dtype=self._dtype)
        if tice.ndim == 0:
            tice = jnp.broadcast_to(tice, (self._nlayers, *shape))
        elif tice.ndim == 1:
            tice = jnp.broadcast_to(tice[:, None, None], (tice.shape[0], *shape))
        return PrognosticState(
            hice=to_field(self._fields["hice"]),
            cice=to_field(self._fields["cice"]),
            hsnow=to_field(self._fields["hsnow"]),
            sst=to_field(self._fields["sst"]),
            sss=to_field(self._fields["sss"]),
            tice=tice,
        )


def fetch_state(tree):
    """Device->host fetch of a pytree, fast on remote-device tunnels.

    Two pathologies of naive per-leaf ``np.asarray`` on tunneled devices:
    each leaf is a separate blocking round trip, and buffers that alias
    *uploaded* host data (e.g. jit outputs XLA aliased to unchanged inputs)
    take orders of magnitude longer to download than computed buffers.
    Copying through a jit breaks the aliasing; ``device_get`` batches the
    transfer.
    """
    if jax.process_count() > 1:
        # Multi-host: each process only addresses its own shards, so a
        # plain device_get of a global array fails. process_allgather
        # assembles the full global value on every process (a collective
        # — ALL processes must call fetch_state together, which the
        # checkpoint path does by construction: every host runs the
        # same program).
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda leaf: multihost_utils.process_allgather(leaf, tiled=True),
            tree,
        )
    copied = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(tree)
    return jax.device_get(copied)


def safe_div(num: jax.Array, den: jax.Array) -> jax.Array:
    """num/den where den != 0, else 0 — grad-safe masked division."""
    nonzero = den != 0
    den_safe = jnp.where(nonzero, den, 1.0)
    return jnp.where(nonzero, num / den_safe, 0.0)


def zeros_prognostic(nx: int, ny: int, nlayers: int = 1, dtype=jnp.float64) -> PrognosticState:
    """An all-zero prognostic state of the given grid size."""
    f2 = jnp.zeros((nx, ny), dtype=dtype)
    return PrognosticState(
        hice=f2, cice=f2, hsnow=f2, sst=f2, sss=f2,
        tice=jnp.zeros((nlayers, nx, ny), dtype=dtype),
    )


def dummy_forcing(nx: int, ny: int, dtype=jnp.float64) -> Forcing:
    """The reference's constant placeholder forcing
    (``DummyExternalData.hpp:22-34``): Tair=-1 C, dew=-4 C, P=1e5 Pa,
    SW=0 (night), LW=311 W m-2, MLD=10 m, no snowfall, calm wind."""
    full = lambda v: jnp.full((nx, ny), v, dtype=dtype)
    return Forcing(
        tair=full(-1.0), dew2m=full(-4.0), pair=full(1e5),
        sw_in=full(0.0), lw_in=full(311.0), mld=full(10.0),
        snowfall=full(0.0), wind=full(0.0),
    )
