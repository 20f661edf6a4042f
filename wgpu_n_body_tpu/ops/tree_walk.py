"""Vectorized theta-criterion tree walk (replaces tree.wgsl:41-90).

The WGSL kernel gives every particle an explicit 64-deep stack and pops
one octant at a time (tree.wgsl:44-49). On TPU, per-lane stacks mean
per-lane gathers of divergent depth — instead we exploit the DFS node
layout from ops/tree_build.py, which makes the traversal *stackless*:

    cur = 0
    while cur < num_nodes:
        accept/skip  -> cur = skip[cur]   (jump over the subtree)
        open         -> cur = cur + 1     (first child is DFS-adjacent)

``cur`` strictly increases, so the walk terminates in <= num_nodes steps;
all particles advance in lockstep (one `lax.while_loop`), each iteration
being one gathered node row + a few VPU ops per lane.

Semantics per node, matched to tree.wgsl with one deliberate fix:

- accept when width/dist < theta, contribution
  mass*g/(dist^3+e) * (cog-p)/dist * dt  — tree.wgsl:63-69 exactly
  (dt inside, same softening; fp association differs only in walk order:
  DFS here vs LIFO child order there).
- self-exclusion: the reference tests ``bodies==1 && dist<1e-6``
  (tree.wgsl:58-62) against the *post-drift* position, which normally
  fails (the drift exceeds 1e-6), after which the failed theta test makes
  it *open the leaf* and push ``children[0]`` — a particle index — as an
  octant index (tree.wgsl:71-87 with tree.rs:531-532), reading unrelated
  octants. That is an upstream bug; we implement the evident intent:
  particle i skips exactly its own leaf (index equality, like the naive
  kernel's i==index at naive.wgsl:30-32).
- leaves that fail the theta test are point-mass evaluated anyway — for
  singletons that IS the exact pairwise force, which is what opening the
  leaf should have produced.

theta -> 0 therefore degenerates to the exact all-pairs sum (every
non-leaf is opened), which the tests exploit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.ops.tree_build import (
    COG_X,
    COG_Y,
    COG_Z,
    IS_SINGLE,
    MASS,
    NO_CHILD,
    WIDTH,
    TreeArrays,
)
from wgpu_n_body_tpu.params import SimParams, TreeParams


def tree_forces(
    pos_new: jax.Array,
    tree: TreeArrays,
    params: SimParams,
    tree_params: TreeParams,
    active: jax.Array | None = None,
) -> jax.Array:
    """(N, 3) acc*dt via per-particle stackless DFS walks, in lockstep.

    ``active``: optional (N,) bool — lanes with False skip their walk and
    return zero (used as the fallback path for deferred group-walk tiles).
    """
    n = pos_new.shape[0]
    cap = tree.nodes_f32.shape[0] - 1
    theta = tree_params.theta
    gdt = params.g * params.dt

    px, py, pz = pos_new[:, 0], pos_new[:, 1], pos_new[:, 2]

    def cond(carry):
        cur, _ = carry
        return jnp.any(cur < tree.num_nodes)

    def body(carry):
        cur, acc = carry
        done = cur >= tree.num_nodes
        row = jnp.take(tree.nodes_f32, cur, axis=0)  # (n, 8) gathered rows
        nskip = jnp.take(tree.skip, cur)
        dx = row[:, COG_X] - px
        dy = row[:, COG_Y] - py
        dz = row[:, COG_Z] - pz
        r2 = dx * dx + dy * dy + dz * dz
        dist = jnp.sqrt(r2)
        is_self = cur == tree.leaf_self
        accept = (row[:, WIDTH] < theta * dist) | (row[:, NO_CHILD] > 0.0)
        contrib = accept & ~is_self & ~done
        # m*g/(d^3+e) * d_vec/d * dt (tree.wgsl:66-67); coincident non-self
        # pairs yield the same inf/NaN as WGSL normalize(0).
        w = jnp.where(
            contrib, row[:, MASS] * gdt / (r2 * dist + params.e) / dist, 0.0
        )
        acc = acc + jnp.stack([w * dx, w * dy, w * dz], axis=1)
        nxt = jnp.where(accept | is_self, nskip, cur + 1)
        cur = jnp.where(done, cur, nxt)
        return cur, acc

    if active is None:
        cur0 = jnp.zeros((n,), jnp.int32)
    else:
        cur0 = jnp.where(active, 0, tree.num_nodes).astype(jnp.int32)
    acc0 = jnp.zeros((n, 3), jnp.float32)
    _, acc = lax.while_loop(cond, body, (cur0, acc0))
    return acc
