"""Multi-chip Barnes-Hut via shard_map.

v1 schedule ("replicated tree"): one tiled all_gather of the (old) state
per step; every chip runs the same deterministic Morton sort + octree
build, then walks only its 1/P slice of the *sorted* receiver axis and
outputs that slice. The walk — the dominant cost — scales with P; the
build is replicated (its cost is the single-chip build, independent of P).
Memory per chip is O(N), matching the reference's single-GPU budget.

Like single-chip TreeSim (and the reference), particles are reordered
every step; the sharded output is the globally Morton-sorted state split
evenly over chips, so chips own contiguous Morton ranges — exactly the
layout a future locally-essential-tree schedule (exchange coarse cells
instead of particles, SURVEY.md §5) needs.

fp note: per-particle forces are identical to single-chip for the
"per_particle" walk; the "group" walk tiles each chip's slice separately,
so conservative acceptance sets (and the fp error of the approximation)
can differ slightly at slice boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wgpu_n_body_tpu.models.base import Simulator, StepFn
from wgpu_n_body_tpu.ops.tree_build import build_tree, morton_order
from wgpu_n_body_tpu.ops.tree_walk import tree_forces
from wgpu_n_body_tpu.ops.tree_walk_group import group_tree_forces
from wgpu_n_body_tpu.params import ParticleState, SimParams, TreeParams
from wgpu_n_body_tpu.parallel.mesh import PARTICLE_AXIS, state_sharding


def make_sharded_tree_step(
    params: SimParams,
    mesh: Mesh,
    tp: TreeParams | None = None,
    donate: bool = True,
) -> StepFn:
    tp = tp or TreeParams()
    p_size = mesh.shape[PARTICLE_AXIS]
    spec = P(PARTICLE_AXIS)

    def step_shard(pos, vel, acc, mass):
        n_local = pos.shape[0]
        my = lax.axis_index(PARTICLE_AXIS)
        half = params.dt / 2.0
        # The half-kick is per-particle: fold vel+acc into vel_h BEFORE any
        # communication so only (pos, vel_h, mass) cross the ICI — 7
        # floats/particle gathered instead of 10 (pos/vel/acc/mass), and
        # no full sorted vel/acc copies are ever materialized.
        vel_h = vel + acc * half
        pos_all = lax.all_gather(pos, PARTICLE_AXIS, tiled=True)
        velh_all = lax.all_gather(vel_h, PARTICLE_AXIS, tiled=True)
        mass_all = lax.all_gather(mass, PARTICLE_AXIS, tiled=True)
        # deterministic: every chip computes the identical order + tree
        perm, bound, keys = morton_order(pos_all, tp.max_depth)
        pos_s = jnp.take(pos_all, perm, axis=0)
        mass_s = jnp.take(mass_all, perm)
        # build_tree reads only pos/mass; vel/acc slots alias pos (unused)
        tree = build_tree(
            ParticleState(pos=pos_s, vel=pos_s, acc=pos_s, mass=mass_s),
            keys, bound, tp,
        )

        start = (my * n_local).astype(jnp.int32)

        def sl(x):
            sizes = (n_local,) + x.shape[1:]
            starts = (start,) + (jnp.int32(0),) * (x.ndim - 1)
            return lax.dynamic_slice(x, starts, sizes)

        pos_l = sl(pos_s)
        mass_l = sl(mass_s)
        velh_l = jnp.take(velh_all, sl(perm), axis=0)  # only my slice
        # receivers are the local slice; sources/self indices are global
        self_idx = start + jnp.arange(n_local, dtype=jnp.int32)

        pos_new = pos_l + velh_l * params.dt
        if tp.walk == "group":
            local_keys = (sl(keys[0]), sl(keys[1]))
            acc_new, _stats = group_tree_forces(
                pos_new, pos_s, mass_s, tree,
                local_keys, params, tp, gid_offset=start,
            )
        else:
            acc_new = tree_forces(
                pos_new, pos_s, mass_s, tree, params,
                tp, self_idx=self_idx,
            )
        vel_new = velh_l + acc_new * half
        return pos_new, vel_new, acc_new, mass_l

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


class ShardedTreeSim(Simulator):
    """Multi-chip TreeSim (replicated build, sharded walk)."""

    def __init__(
        self,
        sim_params: SimParams,
        mesh: Mesh,
        add_params: TreeParams | None = None,
    ):
        super().__init__(sim_params)
        self.mesh = mesh
        self.add_params = add_params or TreeParams()

    def step_fn(self) -> StepFn:
        raise NotImplementedError("use make_step (shard_map requires jit)")

    def make_step(self, donate: bool = True) -> StepFn:
        return make_sharded_tree_step(
            self.sim_params, self.mesh, self.add_params, donate
        )

    def init_state(self, key, init_fn) -> ParticleState:
        state = init_fn(key, self.sim_params)
        sh = state_sharding(self.mesh)
        return jax.tree_util.tree_map(jax.device_put, state, sh)
