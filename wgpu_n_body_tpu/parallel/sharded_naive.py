"""Multi-chip naive O(N^2) backend via shard_map.

Receivers are sharded over the particle axis; sources must be seen by every
chip. Two communication schedules:

- ``allgather``: one tiled all_gather of (old positions, masses) per step,
  then each chip runs the single-chip Pallas kernel on its receiver shard
  with the shard's global row offset for the self-mask. Memory: O(N) per
  chip for the gathered sources.
- ``ring``: P-1 ``ppermute`` rotations of the source shard around the ICI
  ring (the ring-attention communication pattern, SURVEY.md §2/§5): each
  chip accumulates local-receivers x rotating-source-shard partial forces
  while the next shard is in flight. Memory: O(N/P) per chip — required
  once N is too big to replicate.

Both produce bitwise-identical physics to the single-chip kernel up to
f32 accumulation order (ring accumulates shard-by-shard).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wgpu_n_body_tpu.models.base import Simulator, StepFn
from wgpu_n_body_tpu.ops.naive_pallas import naive_forces_pallas
from wgpu_n_body_tpu.ops.naive_ref import _pair_acc
from wgpu_n_body_tpu.params import NaiveParams, ParticleState, SimParams
from wgpu_n_body_tpu.parallel.mesh import PARTICLE_AXIS, state_sharding


def _local_forces(pos_new_l, pos_old, mass, row_offset, params, ap):
    """Local receiver shard vs given sources, with global self-mask."""
    if ap.use_pallas:
        return naive_forces_pallas(
            pos_new_l, pos_old, mass, params,
            tile_i=ap.tile_i, tile_j=ap.tile_j, row_offset=row_offset,
        )
    idx = row_offset + jnp.arange(pos_new_l.shape[0])
    return _pair_acc(pos_new_l, idx, pos_old, mass, params)


def make_sharded_naive_step(
    params: SimParams,
    mesh: Mesh,
    ap: NaiveParams | None = None,
    schedule: str = "allgather",
    donate: bool = True,
) -> StepFn:
    """Compile a sharded step: ParticleState (sharded) -> ParticleState."""
    ap = ap or NaiveParams()
    p_size = mesh.shape[PARTICLE_AXIS]
    spec = P(PARTICLE_AXIS)

    def step_shard(pos, vel, acc, mass):
        # pos/vel/acc: (N/P, 3) local shards; mass: (N/P,)
        half = params.dt / 2.0
        vel_h = vel + acc * half
        pos_new = pos + vel_h * params.dt
        my = lax.axis_index(PARTICLE_AXIS)
        n_local = pos.shape[0]
        row_off = (my * n_local).astype(jnp.int32)

        if schedule == "allgather":
            pos_old_all = lax.all_gather(pos, PARTICLE_AXIS, tiled=True)
            mass_all = lax.all_gather(mass, PARTICLE_AXIS, tiled=True)
            acc_new = _local_forces(
                pos_new, pos_old_all, mass_all, row_off, params, ap
            )
        elif schedule == "ring":
            perm = [(s, (s + 1) % p_size) for s in range(p_size)]

            def ring_step(k, carry):
                acc_sum, src_pos, src_mass = carry
                # source shard currently held = (my - k) mod P
                src_id = (my - k) % p_size
                src_off = (src_id * n_local).astype(jnp.int32)
                acc_sum = acc_sum + _local_forces(
                    pos_new, src_pos, src_mass, row_off - src_off, params, ap
                )
                src_pos = lax.ppermute(src_pos, PARTICLE_AXIS, perm)
                src_mass = lax.ppermute(src_mass, PARTICLE_AXIS, perm)
                return acc_sum, src_pos, src_mass

            acc0 = jnp.zeros_like(pos)
            acc_new, _, _ = lax.fori_loop(
                0, p_size, ring_step, (acc0, pos, mass)
            )
        else:
            raise ValueError(f"unknown schedule {schedule!r}")

        vel_new = vel_h + acc_new * half
        return pos_new, vel_new, acc_new, mass

    sharded = shard_map(
        step_shard,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
        check_vma=False,
    )

    def step(state: ParticleState) -> ParticleState:
        pos, vel, acc, mass = sharded(state.pos, state.vel, state.acc, state.mass)
        return ParticleState(pos=pos, vel=vel, acc=acc, mass=mass)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class ShardedNaiveSim(Simulator):
    """Multi-chip NaiveSim. ``init_state`` additionally shards the state."""

    def __init__(
        self,
        sim_params: SimParams,
        mesh: Mesh,
        add_params: NaiveParams | None = None,
        schedule: str = "allgather",
    ):
        super().__init__(sim_params)
        self.mesh = mesh
        self.add_params = add_params or NaiveParams()
        self.schedule = schedule

    def step_fn(self) -> StepFn:
        raise NotImplementedError("use make_step (shard_map requires jit)")

    def make_step(self, donate: bool = True) -> StepFn:
        return make_sharded_naive_step(
            self.sim_params, self.mesh, self.add_params, self.schedule, donate
        )

    def init_state(self, key, init_fn) -> ParticleState:
        state = init_fn(key, self.sim_params)
        sh = state_sharding(self.mesh)
        return jax.tree_util.tree_map(jax.device_put, state, sh)
