"""Vectorized theta-criterion tree walk (replaces tree.wgsl:41-90).

The WGSL kernel gives every particle an explicit 64-deep stack and pops
one octant at a time (tree.wgsl:44-49). On TPU, per-lane stacks mean
per-lane gathers of divergent depth — instead we exploit the DFS node
layout from ops/tree_build.py, which makes the traversal *stackless*:

    cur = 0
    while cur < num_nodes:
        accept/skip  -> cur = skip[cur]   (jump over the subtree)
        open         -> cur = cur + 1     (first child is DFS-adjacent)

``cur`` never decreases and advances every iteration except while a lane
direct-sums an overfull terminal cell (a max-depth cell holding more than
leaf_bucket particles), which it consumes in bucket-sized chunks over
ceil(count/bucket) iterations before jumping to skip — so the walk
terminates in <= num_nodes + N/bucket steps. ``num_nodes`` is clamped to
the arena capacity by the build (overflow truncates + flags, never
hangs). All particles advance in lockstep (one `lax.while_loop`), each
iteration being one gathered node row + a few VPU ops per lane.

Semantics per node, matched to tree.wgsl with one deliberate fix:

- accept when width/dist < theta, contribution
  mass*g/(dist^3+e) * (cog-p)/dist * dt  — tree.wgsl:63-69 exactly
  (dt inside, same softening; fp association differs only in walk order:
  DFS here vs LIFO child order there).
- leaf buckets (subtrees of <= leaf_bucket particles, singletons for
  bucket=1) that FAIL the theta test are evaluated by exact direct
  summation over their particle range, with the self pair excluded by
  index — the naive kernel's ``i == index`` skip (naive.wgsl:30-32).
  The reference instead tests ``bodies==1 && dist<1e-6`` against the
  *post-drift* position (tree.wgsl:58-62), which normally fails (the
  drift exceeds 1e-6), after which the failed theta test makes it *open
  the leaf* and push ``children[0]`` — a particle index — as an octant
  index (tree.wgsl:71-87 with tree.rs:531-532), reading unrelated
  octants. That is an upstream bug; we implement the evident intent.
- theta-accepted buckets are point masses, exactly like the reference
  treats the same cell.

theta -> 0 therefore degenerates to the exact all-pairs sum (every
non-bucket is opened, every bucket direct-summed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.ops.tree_build import (
    MASS,
    NO_CHILD,
    WIDTH,
    TreeArrays,
)
from wgpu_n_body_tpu.params import SimParams, TreeParams


def tree_forces(
    pos_new: jax.Array,
    src_pos: jax.Array,
    src_mass: jax.Array,
    tree: TreeArrays,
    params: SimParams,
    tree_params: TreeParams,
    active: jax.Array | None = None,
    self_idx: jax.Array | None = None,
) -> jax.Array:
    """(B, 3) acc*dt via per-particle stackless DFS walks, in lockstep.

    pos_new:  (B, 3) post-drift receiver positions (any subset of lanes).
    src_pos:  (N, 3) pre-step source positions in SORTED order (the order
              the tree indexes; used for direct bucket evaluation).
    src_mass: (N,) sorted source masses.
    active:   optional (B,) bool — lanes with False skip their walk.
    self_idx: (B,) int32 — each receiver's index in the sorted order, for
              exact self-exclusion; defaults to arange (receivers == the
              full sorted set).
    """
    b = pos_new.shape[0]
    n = src_pos.shape[0]
    theta = tree_params.theta
    bucket = tree_params.leaf_bucket
    gdt = params.g * params.dt
    e = params.e
    if self_idx is None:
        self_idx = jnp.arange(b, dtype=jnp.int32)

    px, py, pz = pos_new[:, 0], pos_new[:, 1], pos_new[:, 2]
    # (n+1, 4) source table; row n is a zero-mass sentinel for masked lanes
    src = jnp.concatenate(
        [
            jnp.concatenate([src_pos, jnp.full((1, 3), 1e15, jnp.float32)]),
            jnp.concatenate([src_mass, jnp.zeros((1,), jnp.float32)])[:, None],
        ],
        axis=1,
    )

    def cond(carry):
        cur, _, _ = carry
        return jnp.any(cur < tree.num_nodes)

    def body(carry):
        cur, koff, acc = carry
        done = cur >= tree.num_nodes
        row = jnp.take(tree.nodes_f32, cur, axis=0)  # (B, 8)
        nskip = jnp.take(tree.skip, cur)
        dx = row[:, 0] - px
        dy = row[:, 1] - py
        dz = row[:, 2] - pz
        r2 = dx * dx + dy * dy + dz * dz
        dist = jnp.sqrt(r2)
        theta_ok = row[:, WIDTH] < theta * dist
        no_child = row[:, NO_CHILD] > 0.0
        far = theta_ok & ~done
        near = ~theta_ok & no_child & ~done
        # far: point mass, m*g/(d^3+e) * d_vec/d * dt (tree.wgsl:66-67)
        w = jnp.where(far, row[:, MASS] * gdt / (r2 * dist + e) / dist, 0.0)
        ax = w * dx
        ay = w * dy
        az = w * dz
        # near: exact direct sum over the cell's particle range, self
        # excluded by index (coincident distinct pairs NaN like upstream).
        # Summation is chunked by koff: overfull terminal cells (count >
        # bucket, possible only at max_depth) take ceil(count/bucket)
        # iterations, the lane staying on the node until exhausted.
        first = jnp.take(tree.first, cur)
        cnt = jnp.take(tree.count, cur)
        for k in range(bucket):
            j = jnp.where(near & (koff + k < cnt), first + koff + k, n)
            srow = jnp.take(src, j, axis=0)  # (B, 4)
            sdx = srow[:, 0] - px
            sdy = srow[:, 1] - py
            sdz = srow[:, 2] - pz
            sr2 = sdx * sdx + sdy * sdy + sdz * sdz
            is_self = j == self_idx
            sr2s = jnp.where(is_self, 1.0, sr2)
            sd = jnp.sqrt(sr2s)
            sw = srow[:, 3] * gdt / (sr2s * sd + e) / sd
            sw = jnp.where(is_self, 0.0, sw)
            ax = ax + sw * sdx
            ay = ay + sw * sdy
            az = az + sw * sdz
        acc = acc + jnp.stack([ax, ay, az], axis=1)
        more = near & (koff + bucket < cnt)  # overfull cell not exhausted
        koff = jnp.where(more, koff + bucket, 0)
        nxt = jnp.where(more, cur, jnp.where(far | near, nskip, cur + 1))
        cur = jnp.where(done, cur, nxt)
        return cur, koff, acc

    if active is None:
        cur0 = jnp.zeros((b,), jnp.int32)
    else:
        cur0 = jnp.where(active, 0, tree.num_nodes).astype(jnp.int32)
    koff0 = jnp.zeros((b,), jnp.int32)
    acc0 = jnp.zeros((b, 3), jnp.float32)
    _, _, acc = lax.while_loop(cond, body, (cur0, koff0, acc0))
    return acc
