"""Morton re-sharding for the LET schedule (VERDICT r2 weak #2).

Particle ownership under schedule="let" is static between re-shards:
chips keep the slices they were given while particles move. The physics
stays theta-correct under any drift (export cuts are probed against the
destinations' actual per-step receiver bboxes), but once ownership
regions inter-penetrate, each chip's receiver bbox overlaps more remote
source regions, export row counts grow toward the whole remote tree, and
an undersized ``let_cap`` overflows (loudly, via
``ShardedTreeSim.check_overflow``). Re-sharding restores compact
ownership: re-partition particles into contiguous slices of the GLOBAL
Morton order, after which every chip again owns one tight spatial blob
and exports shrink back to pruned coarse cuts.

Mechanism (the gather -> global Morton sort -> re-slice option scoped in
sharded_tree.py's module docstring): one tiled all_gather of the full
SoA state per re-shard, a replicated deterministic Morton argsort, and
each chip keeps its 1/P slice of the permutation. O(N) transient bytes
per chip (40 B/particle gathered + the sort) — at the checkpoint-cadence
this runs at (every O(100-1000) steps), that transient is irrelevant
next to the step loop; an all_to_all range-repartition would save the
gather but needs dynamic send counts, which XLA's static shapes make
strictly worse than this.

Like the step itself (and the reference, tree.rs:564-602), re-sharding
reorders particles; trajectories are comparable as sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wgpu_n_body_tpu.ops.tree_build import morton_order
from wgpu_n_body_tpu.params import ParticleState, SimParams, TreeParams
from wgpu_n_body_tpu.parallel.mesh import PARTICLE_AXIS


def make_reshard(
    params: SimParams,
    mesh: Mesh,
    tp: TreeParams | None = None,
    donate: bool = True,
):
    """Compiled ``state -> state`` that re-partitions particles into
    contiguous global-Morton slices (a pure permutation of the system —
    no physics, no dtype changes)."""
    tp = tp or TreeParams()
    spec = P(PARTICLE_AXIS)

    def reshard_shard(pos, vel, acc, mass):
        n_local = pos.shape[0]
        my = lax.axis_index(PARTICLE_AXIS)
        pos_all = lax.all_gather(pos, PARTICLE_AXIS, tiled=True)
        vel_all = lax.all_gather(vel, PARTICLE_AXIS, tiled=True)
        acc_all = lax.all_gather(acc, PARTICLE_AXIS, tiled=True)
        mass_all = lax.all_gather(mass, PARTICLE_AXIS, tiled=True)
        # deterministic: every chip computes the identical global order
        # (same quantization the builds use, so slice boundaries align
        # with octree cells as tightly as the key resolution allows)
        perm, _bound, _keys = morton_order(pos_all, tp.max_depth)
        start = (my * n_local).astype(jnp.int32)
        perm_l = lax.dynamic_slice(perm, (start,), (n_local,))
        return (
            jnp.take(pos_all, perm_l, axis=0),
            jnp.take(vel_all, perm_l, axis=0),
            jnp.take(acc_all, perm_l, axis=0),
            jnp.take(mass_all, perm_l),
        )

    sharded = shard_map(
        reshard_shard,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
        check_vma=False,
    )

    def reshard(state: ParticleState) -> ParticleState:
        pos, vel, acc, mass = sharded(
            state.pos, state.vel, state.acc, state.mass
        )
        return ParticleState(pos=pos, vel=vel, acc=acc, mass=mass)

    return jax.jit(reshard, donate_argnums=(0,) if donate else ())
