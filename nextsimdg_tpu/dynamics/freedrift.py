"""Free-drift momentum solver (no internal ice stress).

The simplest dynamics closure: wind and ocean drag balance plus Coriolis,
solved implicitly per node — no subcycling, no stress state. Useful for
spin-up, testing, and thin-ice regimes, and as the second implementation of
the ``Nextsim::IDynamics`` module interface (the reference's module system
pattern extended to the dynamics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .mesh import RectMesh
from .mevp import DynamicsForcing, MEVPParams, VelocityState, cell_to_node


class FreeDriftSolver:
    def __init__(
        self,
        mesh: RectMesh,
        params: MEVPParams = MEVPParams(),
        backend: str = "auto",  # accepted for interface parity; unused
        spmd=(None, None),
        block_halo: int = 16,  # interface parity; unused
    ) -> None:
        self.mesh = mesh
        self.params = params
        self.spmd = tuple(spmd)

    @partial(jax.jit, static_argnames=("self", "dt", "n_subcycles"))
    def step(
        self,
        state: VelocityState,
        h,
        a,
        forcing: DynamicsForcing,
        mask,
        dt: float,
        n_subcycles: int = 1,  # fixed-point iterations of the drag balance
    ) -> VelocityState:
        p = self.params
        dtype = state.u.dtype

        m_node = p.rho_ice * cell_to_node(
            h, self.mesh.periodic_x, self.mesh.periodic_y, self.spmd
        )
        ice_node = m_node > p.min_ice_mass
        m_safe = jnp.maximum(m_node, p.min_ice_mass)
        active = mask * ice_node.astype(dtype)

        wind_speed = jnp.sqrt(forcing.u_atm**2 + forcing.v_atm**2)
        tau_au = p.rho_atm * p.cd_atm * wind_speed * forcing.u_atm
        tau_av = p.rho_atm * p.cd_atm * wind_speed * forcing.v_atm
        dt_m = dt / m_safe

        def iteration(_, carry):
            u, v = carry
            rel_u = forcing.u_ocean - u
            rel_v = forcing.v_ocean - v
            c_w = p.rho_ocean * p.cd_ocean * jnp.sqrt(rel_u**2 + rel_v**2)
            cor_u = p.f_coriolis * (v - forcing.v_ocean) if p.use_coriolis else 0.0
            cor_v = -p.f_coriolis * (u - forcing.u_ocean) if p.use_coriolis else 0.0
            u_new = (
                state.u + dt_m * (tau_au + c_w * forcing.u_ocean) + dt * cor_u
            ) / (1.0 + dt_m * c_w)
            v_new = (
                state.v + dt_m * (tau_av + c_w * forcing.v_ocean) + dt * cor_v
            ) / (1.0 + dt_m * c_w)
            return (u_new * active, v_new * active)

        u, v = jax.lax.fori_loop(
            0, max(1, n_subcycles), iteration, (state.u, state.v)
        )
        return VelocityState(u=u, v=v, s11=state.s11 * 0, s22=state.s22 * 0, s12=state.s12 * 0)

    def boundary_mask(self, dtype=jnp.float32):
        from .mevp import MEVPSolver

        return MEVPSolver(self.mesh, self.params, spmd=self.spmd).boundary_mask(dtype)
