"""The per-timestep model update.

Replaces ``DevStep`` (``core/src/DevStep.cpp:14-23``) — the reference's
element-cursor hot loop — with ONE jitted whole-grid physics step: the
time×elements double loop collapses to a host time loop around a compiled
XLA program (and, for multi-step on-device runs, a ``lax.scan``; see
``run_steps_scanned``).

Cross-step physics memory (``new_ice``; see NextsimPhysics docstring) is
carried here alongside the prognostic state.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..grid.structure import IStructure
from ..modules import ModuleRegistry
from ..state import Forcing, PrognosticState
from .iterator import Iterant


class ModelStep(Iterant):
    def __init__(self) -> None:
        self.structure: Optional[IStructure] = None
        self.physics = None
        self.new_ice = None
        self._jitted = None
        #: Periodic checkpointing during long runs (0 = final restart only,
        #: which is all the reference does); see Model config
        #: ``model.checkpoint_period`` / ``model.checkpoint_pattern``.
        self.checkpoint_period = 0
        self.checkpoint_pattern = "checkpoint.{step}.nc"
        self.step_count = 0
        #: Time-dependent forcing (model.forcing_file); None = dummy forcing.
        self.forcing_provider = None
        self.start_time = 0.0

    # -- IModelStep (IModelStep.hpp:16-34) -----------------------------------
    def set_initial_data(self, structure: IStructure) -> None:
        self.structure = structure
        self.new_ice = jnp.zeros_like(structure.prognostic.hice)

    def init(self) -> None:
        import nextsimdg_tpu.physics  # noqa: F401 - ensure modules registered

        loader = ModuleRegistry.get_loader()
        self.physics = loader.get_implementation("Nextsim::IPhysics1d")
        from ..config import try_configure

        try_configure(self.physics)

    def _ensure_physics(self) -> None:
        if self.physics is None:
            self.init()

    def step_fn(self):
        """The pure, jittable single-step function (compiled once per shape)."""
        self._ensure_physics()
        if self._jitted is None:
            physics = self.physics

            @functools.partial(jax.jit, static_argnames=("dt",))
            def step(prog: PrognosticState, forcing: Forcing, new_ice, dt: float):
                updated, diags = physics.step(prog, forcing, new_ice, dt)
                return updated, diags.new_ice

            self._jitted = step
        return self._jitted

    # -- Iterant -------------------------------------------------------------
    def iterate(self, dt) -> None:
        if self.forcing_provider is not None:
            t_now = self.start_time + self.step_count * float(dt)
            self.structure.forcing = self.forcing_provider.thermo_forcing(
                t_now, self.structure.nx, self.structure.ny
            )
        step = self.step_fn()
        prog, new_ice = step(
            self.structure.prognostic, self.structure.forcing, self.new_ice, float(dt)
        )
        self.structure.prognostic = prog
        self.new_ice = new_ice
        self.step_count += 1
        if self.checkpoint_period and self.step_count % self.checkpoint_period == 0:
            from ..utils.timer import main_timer

            with main_timer.scope("checkpoint-write"):
                self.structure.dump(self.checkpoint_pattern.format(step=self.step_count))

    # -- on-device multi-step ------------------------------------------------
    def run_steps_scanned(self, n_steps: int, dt: float) -> None:
        """Run n_steps entirely on device with ``lax.scan`` (no host sync)."""
        self._ensure_physics()
        physics = self.physics
        forcing = self.structure.forcing

        @functools.partial(jax.jit, static_argnames=("n", "dt"))
        def multi(prog, new_ice, n: int, dt: float):
            def body(carry, _):
                p, ni = carry
                updated, diags = physics.step(p, forcing, ni, dt)
                return (updated, diags.new_ice), None

            (prog_out, ni_out), _ = jax.lax.scan(body, (prog, new_ice), None, length=n)
            return prog_out, ni_out

        prog, self.new_ice = multi(
            self.structure.prognostic, self.new_ice, int(n_steps), float(dt)
        )
        self.structure.prognostic = prog
