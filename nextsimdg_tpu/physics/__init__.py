"""Column (1-D) sea-ice physics as pure, batched JAX functions.

Re-design of the reference physics component (``physics/src/modules/``): each
runtime-selectable module keeps its reference name and config keys, but its
math is expressed over whole-grid arrays with masked arithmetic instead of
per-element branches. Module selection happens *before* tracing, so the step
seen by ``jax.jit`` is a fully static, fusable call graph.
"""

from . import freezing  # noqa: F401 - registers freezing-point modules
from . import albedo  # noqa: F401 - registers albedo modules
from . import ice_ocean_heat_flux  # noqa: F401
from . import thermo_ice0  # noqa: F401
from . import thermo_winton  # noqa: F401
from . import concentration  # noqa: F401
from .nextsim_physics import NextsimPhysics  # noqa: F401  (registers IPhysics1d)

__all__ = ["NextsimPhysics"]
