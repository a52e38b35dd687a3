"""Abstract model structure.

Re-design of ``IStructure`` (``core/src/modules/include/IStructure.hpp:
32-137``). The reference couples a grid to an AoS element container and a
stateful cursor protocol; here a structure owns the SoA
:class:`~nextsimdg_tpu.state.PrognosticState` + :class:`Forcing` pytrees
directly — the cursor disappears because iteration over elements is vectorised
away. Restart ``init``/``dump`` and the case-insensitive structure-name check
are preserved.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..io.restart import RestartFields, read_restart, write_restart
from ..state import Forcing, PrognosticState


class IStructure:
    """Base class: grid geometry + model state + restart I/O."""

    #: Structure name written to / matched against ``/structure@type``.
    structure_name: str = ""

    def __init__(self) -> None:
        self.prognostic: Optional[PrognosticState] = None
        self.forcing: Optional[Forcing] = None

    # -- naming (IStructure.hpp:55-58) --------------------------------------
    @classmethod
    def handles_structure_name(cls, name: str) -> bool:
        """Case-insensitive match against this structure's name."""
        return name.lower() == cls.structure_name.lower()

    # -- geometry ------------------------------------------------------------
    @property
    def nx(self) -> int:
        raise NotImplementedError

    @property
    def ny(self) -> int:
        raise NotImplementedError

    def n_ice_layers(self) -> int:
        raise NotImplementedError

    @property
    def n_elements(self) -> int:
        return self.nx * self.ny

    # -- restart I/O ---------------------------------------------------------
    def init(self, file_path: str) -> None:
        """Initialise state; from the restart file if a path is given."""
        if file_path:
            self.load_restart(read_restart(file_path))
        else:
            self.init_empty()

    def init_empty(self) -> None:
        raise NotImplementedError

    def load_restart(self, fields: RestartFields) -> None:
        """Populate prognostic state from restart arrays (file layout x,y)."""
        dtype = self.dtype
        tice = jnp.asarray(
            np.moveaxis(fields.tice, 2, 0), dtype=dtype
        )  # (x,y,layer) file layout -> (layer,x,y) memory layout
        self.prognostic = PrognosticState(
            hice=jnp.asarray(fields.hice, dtype=dtype),
            cice=jnp.asarray(fields.cice, dtype=dtype),
            hsnow=jnp.asarray(fields.hsnow, dtype=dtype),
            sst=jnp.asarray(fields.sst, dtype=dtype),
            sss=jnp.asarray(fields.sss, dtype=dtype),
            tice=tice,
        )

    def dump(self, file_path: str) -> None:
        """Write the prognostic state as a restart file."""
        from ..state import fetch_state

        # One batched, alias-free device->host transfer (see fetch_state).
        prog = fetch_state(self.prognostic)
        fields = {
            "hice": np.asarray(prog.hice, dtype=np.float64),
            "cice": np.asarray(prog.cice, dtype=np.float64),
            "hsnow": np.asarray(prog.hsnow, dtype=np.float64),
            "sst": np.asarray(prog.sst, dtype=np.float64),
            "sss": np.asarray(prog.sss, dtype=np.float64),
        }
        tice = np.moveaxis(np.asarray(prog.tice, dtype=np.float64), 0, 2)
        write_restart(file_path, self.structure_name, fields, tice)

    # -- numerics ------------------------------------------------------------
    @property
    def dtype(self):
        """State dtype: f64 (reference double) when x64 is on, else f32."""
        import jax

        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
