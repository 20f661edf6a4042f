"""Backend protocol — the TPU-native analog of the `Simulator` trait.

Reference (src/sims/mod.rs:73-90) shape and its TPU translation:

    new(device, sim_params, add_params,     -> __init__(sim_params, add_params)
        mappable_primary_buffers, init_fn)     + init_state(key, init_fn)
    encode(&mut, device, queue)             -> step_fn(): pure
        -> CommandEncoder                      state -> state, compiled once by
                                               make_step() with buffer donation
                                               (XLA input-output aliasing is
                                               the ping-pong buffer pair of
                                               naive.rs:97-132)
    dest_particle_slice()                   -> the returned state itself —
                                               state is an ordinary pytree of
                                               device arrays, no buffer handle
                                               indirection needed
    cleanup()                               -> obsolete: no host arena exists;
                                               JAX async dispatch already
                                               overlaps host and device

A backend is constructed from parameter values and exposes a *pure* step
function; all mutability lives in the caller's state threading.
"""

from __future__ import annotations

import abc
from typing import Callable

import jax

from wgpu_n_body_tpu.params import ParticleState, SimParams

StepFn = Callable[[ParticleState], ParticleState]
InitFn = Callable[[jax.Array, SimParams], ParticleState]


class Simulator(abc.ABC):
    """Abstract simulation backend."""

    def __init__(self, sim_params: SimParams):
        self.sim_params = sim_params

    @abc.abstractmethod
    def step_fn(self) -> StepFn:
        """Return the pure (un-jitted) single-step function."""

    def make_step(self, donate: bool = True) -> StepFn:
        """Compile the step. ``donate=True`` aliases input and output state
        buffers (the XLA equivalent of the reference's ping-pong buffers)."""
        return jax.jit(
            self.step_fn(), donate_argnums=(0,) if donate else ()
        )

    def init_state(self, key: jax.Array, init_fn: InitFn) -> ParticleState:
        """Generate the initial state (reference: init_fn upload,
        naive.rs:97-111 / tree.rs:149-168 — here generation happens
        directly on device, no host->device copy of particle data)."""
        return init_fn(key, self.sim_params)
