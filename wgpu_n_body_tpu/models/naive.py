"""Naive O(N^2) backend (reference: src/sims/naive.rs + naive.wgsl).

Fully device-resident, like the reference (naive.rs "fully GPU-resident").
The reference's two ping-pong storage buffers + bind-group swap
(naive.rs:97-132) become a single pure step function compiled with buffer
donation. Particle order is preserved across steps, matching NaiveSim
(unlike TreeSim, which reorders — src/sims/tree.rs:564-602).
"""

from __future__ import annotations

import functools

import jax

from wgpu_n_body_tpu.models.base import Simulator, StepFn
from wgpu_n_body_tpu.ops.integrate import leapfrog_step
from wgpu_n_body_tpu.ops.naive_pallas import naive_forces_pallas
from wgpu_n_body_tpu.ops.naive_ref import naive_forces_ref
from wgpu_n_body_tpu.params import NaiveParams, ParticleState, SimParams


@functools.lru_cache(maxsize=None)
def _naive_step_fn(params: SimParams, ap: NaiveParams) -> StepFn:
    """Params are frozen dataclasses, so step functions (and therefore jit
    caches) are shared across NaiveSim instances with equal params."""
    if ap.use_pallas:

        def force(pos_new, pos_old, mass):
            return naive_forces_pallas(
                pos_new, pos_old, mass, params,
                tile_i=ap.tile_i, tile_j=ap.tile_j, mxu=ap.mxu,
            )

    else:

        def force(pos_new, pos_old, mass):
            return naive_forces_ref(pos_new, pos_old, mass, params)

    def step(state: ParticleState) -> ParticleState:
        return leapfrog_step(state, params, force)

    return step


@functools.lru_cache(maxsize=None)
def _compiled_naive_step(params: SimParams, ap: NaiveParams, donate: bool) -> StepFn:
    return jax.jit(
        _naive_step_fn(params, ap), donate_argnums=(0,) if donate else ()
    )


class NaiveSim(Simulator):
    """All-pairs softened gravity, one step per call."""

    def __init__(
        self, sim_params: SimParams, add_params: NaiveParams | None = None
    ):
        super().__init__(sim_params)
        self.add_params = add_params or NaiveParams()

    def step_fn(self) -> StepFn:
        return _naive_step_fn(self.sim_params, self.add_params)

    def make_step(self, donate: bool = True) -> StepFn:
        return _compiled_naive_step(self.sim_params, self.add_params, donate)
