"""Group (tile-shared) theta-walk — the fast path.

The per-particle walk (ops/tree_walk.py) is reference-exact but gathers one
node row per particle per visited node; measured XLA gather throughput on a
v5e (~3.6e8 rows/s) caps it around N*visits/3.6e8 seconds. This variant
amortizes traversal over *tiles* of Morton-adjacent particles (the classic
GPU Barnes-Hut formulation, cf. Bonsai — and the TPU analog of the
reference's workgroup-of-64 dispatch, sims/mod.rs:7):

  tiles    pieces of <= walk_tile consecutive Morton-sorted particles that
           never cross a Morton cell boundary at a coarse level L_t
           (level chosen so cells hold ~4*walk_tile particles). The cell
           bound keeps every tile's bounding box spatially tight — naive
           fixed-count tiles can straddle a Morton discontinuity, get a
           domain-sized bbox, and degenerate to visiting the whole tree.
  phase A  every tile walks the DFS arena once with a *conservative*
           acceptance test against its bbox: accept node iff
           width < theta * dmin(bbox, cog). Accepted nodes (and leaves)
           append to the tile's interaction list. Gathers: O(T * visits).
  phase B  dense evaluation: each tile's particles against its list in
           (G x chunk) VPU blocks with the exact per-particle force
           formula (tree.wgsl:66-67); a particle's own leaf is masked by
           index.
  fallback tiles that exhaust the traversal row budget (2*walk_list_cap
           visits) or spill past the static tile budget defer their
           particles to the reference-exact per-particle walk. The
           fallback runs under ``lax.cond`` — zero cost when nothing
           deferred (the common case).

Accuracy: dmin <= every member's own distance, so a group-accepted node
passes each member's own theta test — the group walk opens a superset of
the per-particle walk's nodes and is at least as accurate for every
particle. theta -> 0 still degenerates to the exact all-pairs sum.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.ops import morton
from wgpu_n_body_tpu.ops.tree_build import MASS, NO_CHILD, WIDTH, TreeArrays
from wgpu_n_body_tpu.ops.tree_walk import tree_forces
from wgpu_n_body_tpu.params import SimParams, TreeParams


class GroupWalkStats(NamedTuple):
    deferred: jax.Array  # () int32: particles sent down the fallback walk


def _tile_assignment(keys, n, depth, g_tile):
    """Split the sorted particle axis into cell-bounded pieces of <= g_tile.

    Returns (tile_id (n,) int32, t_cap static int). Pieces break at every
    cell boundary of level L_t and every g_tile particles within a cell.
    """
    # cells at L_t hold ~4*g_tile particles under uniform density
    lt = max(1, min(depth, int(math.floor(math.log(max(n / (4 * g_tile), 1.0), 8)))))
    hi, lo = keys
    ph, plo = morton.prefix_at_level(hi, lo, lt, depth)
    ii = jnp.arange(n, dtype=jnp.int32)
    cell_start = jnp.concatenate(
        [jnp.ones((1,), bool), (ph[1:] != ph[:-1]) | (plo[1:] != plo[:-1])]
    )
    rs = lax.cummax(jnp.where(cell_start, ii, jnp.int32(-1)))
    brk = cell_start | ((ii - rs) % g_tile == 0)
    tile_id = jnp.cumsum(brk).astype(jnp.int32) - 1
    # static budget: count-based pieces + one extra piece per nonempty cell
    t_cap = -(-n // g_tile) + max(8, -(-n // (2 * g_tile)))
    return tile_id, t_cap


def group_tree_forces(
    pos_new: jax.Array,
    tree: TreeArrays,
    keys: tuple[jax.Array, jax.Array],
    params: SimParams,
    tree_params: TreeParams,
) -> tuple[jax.Array, GroupWalkStats]:
    """Returns ((N,3) acc*dt, stats). ``keys`` are the Morton keys the
    particles are sorted by (from ops.tree_build.morton_sort)."""
    n = pos_new.shape[0]
    cap = tree.nodes_f32.shape[0] - 1
    g = tree_params.walk_tile
    l_cap = tree_params.walk_list_cap
    theta = tree_params.theta
    gdt = params.g * params.dt
    depth = tree_params.max_depth

    tile_id_raw, t_cap = _tile_assignment(keys, n, depth, g)
    spilled = tile_id_raw >= t_cap  # merged into the last tile id; deferred
    tile_id = jnp.minimum(tile_id_raw, t_cap - 1)
    ii = jnp.arange(n, dtype=jnp.int32)

    # piece boundaries via searchsorted (tile_id ascending)
    piece_start = jnp.searchsorted(tile_id, jnp.arange(t_cap, dtype=jnp.int32)).astype(
        jnp.int32
    )
    piece_end = jnp.concatenate([piece_start[1:], jnp.full((1,), n, jnp.int32)])
    piece_len = piece_end - piece_start
    slot = ii - piece_start[tile_id]
    slot_ovf = slot >= g  # only possible on the merged spill tile

    # padded per-tile particle blocks (T, G): invalid slots replicate the
    # piece's first particle (keeps bboxes tight, outputs unmapped)
    sidx = jnp.arange(g, dtype=jnp.int32)
    part_idx = jnp.clip(
        piece_start[:, None] + jnp.minimum(sidx[None, :], piece_len[:, None] - 1),
        0,
        max(n - 1, 0),
    )  # (T, G)
    tiles = pos_new[part_idx]  # (T, G, 3)
    ls_p = tree.leaf_self[part_idx]  # (T, G)
    valid_slot = sidx[None, :] < piece_len[:, None]
    ls_p = jnp.where(valid_slot, ls_p, cap)

    bbox_lo = jnp.min(tiles, axis=1)  # (T, 3)
    bbox_hi = jnp.max(tiles, axis=1)

    # ---- phase A: tile traversals -> interaction lists ----
    # Emission is ITERATION-indexed: traversal step k writes row k of an
    # (R, T) array with one in-place dynamic_update_slice per unrolled
    # block. Scatter-based per-tile append (at[slot].set on a carried
    # multi-MB array) copies the whole array every iteration on TPU —
    # measured 63 us/iter vs ~20 us for the in-place row write. Rows where
    # a tile did not accept hold the sentinel `cap` and cost only wasted
    # phase-B lanes (visits/accepts ~ 1.5x).
    # The iteration budget IS the list capacity: overflow cannot happen;
    # tiles not finished within R rows are deferred to the fallback.
    unroll = 16
    r_cap = -(-(2 * l_cap) // unroll) * unroll  # rows, multiple of unroll
    iter_cap = r_cap // unroll
    lists0 = jnp.full((r_cap, t_cap), cap, jnp.int32)

    def cond(carry):
        it, cur, _ = carry
        return (it < iter_cap) & jnp.any(cur < tree.num_nodes)

    def body(carry):
        it, cur, lists = carry
        block = []
        for _ in range(unroll):
            done = cur >= tree.num_nodes
            row = jnp.take(tree.nodes_f32, cur, axis=0)  # (T, 8)
            nskip = jnp.take(tree.skip, cur)
            cx, cy, cz = row[:, 0], row[:, 1], row[:, 2]
            dx = jnp.maximum(
                jnp.maximum(bbox_lo[:, 0] - cx, cx - bbox_hi[:, 0]), 0.0
            )
            dy = jnp.maximum(
                jnp.maximum(bbox_lo[:, 1] - cy, cy - bbox_hi[:, 1]), 0.0
            )
            dz = jnp.maximum(
                jnp.maximum(bbox_lo[:, 2] - cz, cz - bbox_hi[:, 2]), 0.0
            )
            dmin = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            take = (row[:, WIDTH] < theta * dmin) | (row[:, NO_CHILD] > 0.0)
            emit = take & ~done
            block.append(jnp.where(emit, cur, cap))
            nxt = jnp.where(take, nskip, cur + 1)
            cur = jnp.where(done, cur, nxt)
        lists = lax.dynamic_update_slice(
            lists, jnp.stack(block, axis=0), (it * unroll, jnp.int32(0))
        )
        return it + 1, cur, lists

    # empty tiles start done
    cur0 = jnp.where(piece_len > 0, 0, tree.num_nodes).astype(jnp.int32)
    it_end, cur_end, lists = lax.while_loop(
        cond, body, (jnp.int32(0), cur0, lists0)
    )
    tile_bad = cur_end < tree.num_nodes  # timed out within the row budget
    max_len = it_end * unroll

    # ---- phase B: dense tile x list evaluation, chunked over the rows ----
    chunk = min(256, r_cap)
    assert r_cap % chunk == 0
    e = params.e
    px = tiles[:, :, 0:1]
    py = tiles[:, :, 1:2]
    pz = tiles[:, :, 2:3]

    def eval_cond(carry):
        c0, _ = carry
        return c0 < max_len

    def eval_body(carry):
        c0, acc = carry
        idx_c = lax.dynamic_slice(
            lists, (c0, jnp.int32(0)), (chunk, t_cap)
        ).T  # (T, C)
        rows = jnp.take(tree.nodes_f32, idx_c.reshape(-1), axis=0).reshape(
            t_cap, chunk, 8
        )
        dx = rows[:, None, :, 0] - px  # (T, G, C)
        dy = rows[:, None, :, 1] - py
        dz = rows[:, None, :, 2] - pz
        r2 = dx * dx + dy * dy + dz * dz
        m_mask = (idx_c[:, None, :] == ls_p[:, :, None]) | (
            idx_c[:, None, :] >= cap
        )
        r2s = jnp.where(m_mask, 1.0, r2)
        inv_r = lax.rsqrt(r2s)
        r = r2s * inv_r
        w = rows[:, None, :, MASS] * gdt * inv_r / (r2s * r + e)
        w = jnp.where(m_mask, 0.0, w)
        ax = jnp.sum(w * dx, axis=2)
        ay = jnp.sum(w * dy, axis=2)
        az = jnp.sum(w * dz, axis=2)
        acc = acc + jnp.stack([ax, ay, az], axis=2)
        return c0 + chunk, acc

    acc0 = jnp.zeros((t_cap, g, 3), jnp.float32)
    _, acc_tiles = lax.while_loop(eval_cond, eval_body, (jnp.int32(0), acc0))

    # map back: particle i -> (tile_id[i], slot[i])
    acc = acc_tiles[tile_id, jnp.minimum(slot, g - 1)]  # (N, 3)

    # ---- fallback: reference-exact per-particle walk for deferred lanes ----
    deferred = spilled | slot_ovf | tile_bad[tile_id]
    n_deferred = jnp.sum(deferred.astype(jnp.int32))

    def with_fallback(acc):
        acc_fb = tree_forces(pos_new, tree, params, tree_params, active=deferred)
        return jnp.where(deferred[:, None], acc_fb, acc)

    acc = lax.cond(n_deferred > 0, with_fallback, lambda a: a, acc)
    return acc, GroupWalkStats(deferred=n_deferred)
