"""Group (tile-shared) theta-walk — the fast path.

The per-particle walk (ops/tree_walk.py) is reference-exact but gathers one
node row per particle per visited node; measured XLA gather throughput on a
v5e (~3.6e8 rows/s) caps it around N*visits/3.6e8 seconds. This variant
amortizes traversal over *tiles* of Morton-adjacent particles (the classic
GPU Barnes-Hut formulation, cf. Bonsai — and the TPU analog of the
reference's workgroup-of-64 dispatch, sims/mod.rs:7):

  tiles    pieces of <= walk_tile consecutive Morton-sorted particles that
           never leave their density-adaptive cell (_tile_assignment), so
           tile bounding boxes stay spatially tight at every local density
           — naive fixed-count tiles can straddle a Morton discontinuity,
           get a domain-sized bbox, and degenerate to visiting the whole
           tree.
  phase A  every tile walks the DFS arena once with a *conservative*
           acceptance test against its bbox: accept node iff
           width < theta * dmin(bbox, cog). theta-accepted nodes enter the
           tile's interaction list as far (point-mass) entries; opened
           leaf buckets enter as near (direct-sum) entries. Gathers:
           O(T * visits).
  phase B  dense evaluation: each tile's particles against its list in
           (G x chunk) VPU blocks — far entries with the exact point-mass
           formula (tree.wgsl:66-67), near entries by exact direct
           summation over their particle ranges with i==j excluded by
           global index (naive.wgsl:30-32 semantics).
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
    """Split the sorted particle axis into density-adaptive pieces.

    Each particle's *tile cell* is its deepest ancestor Morton cell still
    holding >= g_tile particles (so the cell holds < 8*g_tile — its extent
    adapts to local density). Pieces break at tile-cell changes and every
    g_tile particles within a cell. A fixed coarse level fails on skewed
    scenes: at N=1M a level-3 cell is 0.25 wide, and a sparse piece
    spanning one that also contains the galaxy core gets a huge bbox and
    must open the whole core (~100k visits per tile).

    Returns (tile_id (n,) int32, t_cap static int, t_blk static int).
    """
    hi, lo = keys
    ii = jnp.arange(n, dtype=jnp.int32)
    # per-particle deepest level with run count >= g_tile, and that cell id
    lstar = jnp.zeros((n,), jnp.int32)
    cell_hi = jnp.zeros_like(hi)
    cell_lo = jnp.zeros_like(lo)
    for lvl in range(depth + 1):
        ph, plo = morton.prefix_at_level(hi, lo, lvl, depth)
        if lvl == 0:
            start = ii == 0
        else:
            start = jnp.concatenate(
                [jnp.ones((1,), bool), (ph[1:] != ph[:-1]) | (plo[1:] != plo[:-1])]
            )
        rs = lax.cummax(jnp.where(start, ii, jnp.int32(-1)))
        nxt = jnp.where(start, ii, jnp.int32(n))
        ns = lax.cummin(nxt[::-1])[::-1]
        re = jnp.concatenate([ns[1:], jnp.full((1,), n, jnp.int32)])
        big = (re - rs) >= g_tile
        lstar = jnp.where(big, lvl, lstar)
        cell_hi = jnp.where(big, ph, cell_hi)
        cell_lo = jnp.where(big, plo, cell_lo)
    grp_start = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (lstar[1:] != lstar[:-1])
            | (cell_hi[1:] != cell_hi[:-1])
            | (cell_lo[1:] != cell_lo[:-1]),
        ]
    )
    rs_grp = lax.cummax(jnp.where(grp_start, ii, jnp.int32(-1)))
    brk = grp_start | ((ii - rs_grp) % g_tile == 0)
    tile_id = jnp.cumsum(brk).astype(jnp.int32) - 1
    # static budget: count chunks (N/G) + group starts. Maximal same-cell
    # groups interleave with >=G-particle subcells, so their number stays
    # O(N/G); the 2x slack covers skew, and spills defer (never corrupt).
    t_cap = -(-n // g_tile) + max(8, 2 * -(-n // g_tile))
    t_blk = min(256, t_cap)
    t_cap = -(-t_cap // t_blk) * t_blk
    # phase-A traversal block: Morton-contiguous groups of tiles walk in
    # their own while loop, so a block's iteration count is ITS max visits,
    # not the global max (visit counts are heavily skewed and spatially
    # correlated — galaxy-core tiles cluster into a few blocks)
    ta_blk = min(2048, t_cap)
    t_cap = -(-t_cap // ta_blk) * ta_blk
    return tile_id, t_cap, t_blk, ta_blk


def group_tree_forces(
    pos_new: jax.Array,
    src_pos: jax.Array,
    src_mass: jax.Array,
    tree: TreeArrays,
    keys: tuple[jax.Array, jax.Array],
    params: SimParams,
    tree_params: TreeParams,
    gid_offset: jax.Array | int = 0,
) -> tuple[jax.Array, GroupWalkStats]:
    """Returns ((B,3) acc*dt, stats).

    pos_new:  (B, 3) post-drift receiver positions, a contiguous slice of
              the sorted order (B == N single-chip; a shard otherwise).
    src_pos:  (N, 3) pre-step source positions, FULL sorted order (direct
              bucket evaluation reads these — the reference's src buffer).
    src_mass: (N,) sorted masses.
    keys:     Morton keys of the receivers (same slice as pos_new).
    gid_offset: global sorted index of receiver row 0 (shard offset).
    """
    n = pos_new.shape[0]  # receivers
    n_src = src_pos.shape[0]
    cap = tree.nodes_f32.shape[0] - 1
    g = tree_params.walk_tile
    l_cap = tree_params.walk_list_cap
    bucket = tree_params.leaf_bucket
    theta = tree_params.theta
    gdt = params.g * params.dt
    depth = tree_params.max_depth

    tile_id_raw, t_cap, t_blk, ta_blk = _tile_assignment(keys, n, depth, g)
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
    # GLOBAL sorted index per slot, for exact self-exclusion in direct
    # bucket sums; invalid (padding) slots get n_src (matches nothing)
    valid_slot = sidx[None, :] < piece_len[:, None]
    slot_gid = jnp.where(valid_slot, part_idx + gid_offset, n_src)  # (T, G)

    bbox_lo = jnp.min(tiles, axis=1)  # (T, 3)
    bbox_hi = jnp.max(tiles, axis=1)

    # (n_src+1, 4) source table [pos xyz, mass]; last row = zero-mass
    # sentinel
    src_tbl = jnp.concatenate(
        [
            jnp.concatenate([src_pos, jnp.full((1, 3), 1e15, jnp.float32)]),
            jnp.concatenate([src_mass, jnp.zeros((1,), jnp.float32)])[:, None],
        ],
        axis=1,
    )

    # ---- phase A: tile traversals -> interaction lists ----
    # Emission is ITERATION-indexed: traversal step k writes row k of an
    # (R, TA) array with one in-place dynamic_update_slice per unrolled
    # step group. Scatter-based per-tile append (at[slot].set on a carried
    # multi-MB array) copies the whole array every iteration on TPU —
    # measured 63 us/iter vs ~20 us for the in-place row write. Rows where
    # a tile did not accept hold the sentinel `cap` and cost only wasted
    # phase-B lanes (visits/accepts ~ 1.5x).
    # The iteration budget IS the list capacity: overflow cannot happen;
    # tiles not finished within R rows are deferred to the fallback.
    #
    # Node rows are gathered once per step from an int32 view of the node
    # table with the skip pointer in column 7 — one gather instead of two
    # (skip must never pass through f32 ops: small ints are denormals and
    # TPU flushes them to zero), and tiles traverse in Morton-contiguous
    # blocks of ta_blk, each bounded by its own slowest tile.
    unroll = 16
    # rows: multiple of 256 so the eval chunk (min(256, r_cap)) always
    # divides it and unroll (16) always divides the chunk
    r_cap = -(-(2 * l_cap) // 256) * 256
    iter_cap = r_cap // unroll
    tbl_i32 = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(tree.nodes_f32[:, :7], jnp.int32),
            tree.skip[:, None],
        ],
        axis=1,
    )  # (cap+1, 8) int32

    # empty tiles start done
    cur_init = jnp.where(piece_len > 0, 0, tree.num_nodes).astype(jnp.int32)
    chunk = min(256, r_cap)
    if r_cap % chunk or t_cap % t_blk or ta_blk % t_blk:
        raise ValueError(
            f"internal tiling mismatch: walk_list_cap={l_cap} -> r_cap="
            f"{r_cap}, chunk={chunk}, t_cap={t_cap}, t_blk={t_blk}, "
            f"ta_blk={ta_blk}"
        )
    e = params.e

    def walk_block(b, carry):
        acc_all, bad_all = carry
        t0 = b * ta_blk
        blo = lax.dynamic_slice(bbox_lo, (t0, 0), (ta_blk, 3))
        bhi = lax.dynamic_slice(bbox_hi, (t0, 0), (ta_blk, 3))
        cur0 = lax.dynamic_slice(cur_init, (t0,), (ta_blk,))

        def cond(carry):
            it, cur, _, _, _ = carry
            return (it < iter_cap) & jnp.any(cur < tree.num_nodes)

        def body(carry):
            it, cur, hit, lists, visits = carry
            rows = []
            for _ in range(unroll):
                done = cur >= tree.num_nodes
                raw = jnp.take(tbl_i32, cur, axis=0)  # (TA, 8) int32
                row = jax.lax.bitcast_convert_type(raw[:, :7], jnp.float32)
                nskip = raw[:, 7]
                cx, cy, cz = row[:, 0], row[:, 1], row[:, 2]
                dx = jnp.maximum(jnp.maximum(blo[:, 0] - cx, cx - bhi[:, 0]), 0.0)
                dy = jnp.maximum(jnp.maximum(blo[:, 1] - cy, cy - bhi[:, 1]), 0.0)
                dz = jnp.maximum(jnp.maximum(blo[:, 2] - cz, cz - bhi[:, 2]), 0.0)
                dmin = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                theta_ok = row[:, WIDTH] < theta * dmin
                take = theta_ok | (row[:, NO_CHILD] > 0.0)
                emit = take & ~done
                # Opened OVERFULL terminal cells (NO_CHILD == 2: max-depth
                # cell with count > leaf_bucket) exceed the eval pass's
                # static bucket unroll — defer the whole tile to the
                # per-particle walk, which direct-sums any count exactly.
                hit = hit | ((row[:, NO_CHILD] > 1.5) & ~theta_ok & ~done)
                # far entries: node index; near (opened bucket) entries:
                # -(node+1), direct-summed in the eval pass; sentinel: cap
                entry = jnp.where(theta_ok, cur, -(cur + 1))
                rows.append(jnp.where(emit, entry, cap))
                visits = visits + (~done).astype(jnp.int32)
                nxt = jnp.where(take, nskip, cur + 1)
                cur = jnp.where(done, cur, nxt)
            lists = lax.dynamic_update_slice(
                lists, jnp.stack(rows, axis=0), (it * unroll, jnp.int32(0))
            )
            return it + 1, cur, hit, lists, visits

        lists_b0 = jnp.full((r_cap, ta_blk), cap, jnp.int32)
        visits_b0 = jnp.zeros((ta_blk,), jnp.int32)
        hit_b0 = jnp.zeros((ta_blk,), bool)
        _, cur_b, hit_b, lists_b, visits_b = lax.while_loop(
            cond, body, (jnp.int32(0), cur0, hit_b0, lists_b0, visits_b0)
        )
        bad_all = lax.dynamic_update_slice(
            bad_all, (cur_b < tree.num_nodes) | hit_b, (t0,)
        )

        # ---- fused evaluation of this block's lists ----
        # The block's lists never leave this loop iteration — no global
        # (r_cap, t_cap) array exists at any point (it OOM'd HBM at N=4M).
        # Within the block, tiles are sorted by descending list length so
        # each t_blk sub-block chunks only to its own max (visit skew is
        # ~10x; unsorted sub-blocks re-pay the local max everywhere).
        ord_b = jnp.argsort(-visits_b).astype(jnp.int32)
        lists_bs = jnp.take(lists_b, ord_b, axis=1)
        visits_bs = jnp.take(visits_b, ord_b)
        tiles_bs = jnp.take(
            lax.dynamic_slice(tiles, (t0, 0, 0), (ta_blk, g, 3)), ord_b, axis=0
        )
        gid_bs = jnp.take(
            lax.dynamic_slice(slot_gid, (t0, 0), (ta_blk, g)), ord_b, axis=0
        )

        def sub_block(sb, acc_sorted_blk):
            s0 = sb * t_blk
            blk_tiles = lax.dynamic_slice(tiles_bs, (s0, 0, 0), (t_blk, g, 3))
            blk_gid = lax.dynamic_slice(gid_bs, (s0, 0), (t_blk, g))
            blk_max = visits_bs[s0]  # sorted desc: first tile has the max
            px = blk_tiles[:, :, 0:1]
            py = blk_tiles[:, :, 1:2]
            pz = blk_tiles[:, :, 2:3]

            def eval_cond(carry):
                c0, _ = carry
                return c0 < blk_max

            def eval_body(carry):
                c0, acc = carry
                idx_c = lax.dynamic_slice(
                    lists_bs, (c0, s0), (chunk, t_blk)
                ).T  # (TB, C)
                is_far = (idx_c >= 0) & (idx_c < cap)
                is_near = idx_c < 0
                node_ix = jnp.where(
                    is_near, -idx_c - 1, jnp.where(is_far, idx_c, cap)
                )
                rows = jnp.take(
                    tree.nodes_f32, node_ix.reshape(-1), axis=0
                ).reshape(t_blk, chunk, 8)
                # far entries: point-mass evaluation (tree.wgsl:66-67)
                dx = rows[:, None, :, 0] - px  # (TB, G, C)
                dy = rows[:, None, :, 1] - py
                dz = rows[:, None, :, 2] - pz
                r2 = dx * dx + dy * dy + dz * dz
                far_m = is_far[:, None, :]
                r2s = jnp.where(far_m, r2, 1.0)
                inv_r = lax.rsqrt(r2s)
                r = r2s * inv_r
                w = rows[:, None, :, MASS] * gdt * inv_r / (r2s * r + e)
                w = jnp.where(far_m, w, 0.0)
                ax = jnp.sum(w * dx, axis=2)
                ay = jnp.sum(w * dy, axis=2)
                az = jnp.sum(w * dz, axis=2)

                # near entries: exact direct sum over the bucket's
                # particles, self excluded by global index (naive.wgsl:
                # 30-32 semantics). Gated per chunk: most chunks carry no
                # near entries and the direct sum costs `bucket` sub-passes
                # of the chunk shape.
                def near_sum(args):
                    ax, ay, az = args
                    nfirst = jnp.take(
                        tree.first, node_ix.reshape(-1)
                    ).reshape(t_blk, chunk)
                    ncnt = jnp.take(
                        tree.count, node_ix.reshape(-1)
                    ).reshape(t_blk, chunk)
                    for k in range(bucket):
                        j = jnp.where(
                            is_near & (k < ncnt), nfirst + k, n_src
                        )
                        srow = jnp.take(
                            src_tbl, j.reshape(-1), axis=0
                        ).reshape(t_blk, chunk, 4)
                        sdx = srow[:, None, :, 0] - px
                        sdy = srow[:, None, :, 1] - py
                        sdz = srow[:, None, :, 2] - pz
                        sr2 = sdx * sdx + sdy * sdy + sdz * sdz
                        ok = (j[:, None, :] != blk_gid[:, :, None]) & (
                            j[:, None, :] < n_src
                        )
                        sr2s = jnp.where(ok, sr2, 1.0)
                        sinv = lax.rsqrt(sr2s)
                        sr = sr2s * sinv
                        sw = srow[:, None, :, 3] * gdt * sinv / (
                            sr2s * sr + e
                        )
                        sw = jnp.where(ok, sw, 0.0)
                        ax = ax + jnp.sum(sw * sdx, axis=2)
                        ay = ay + jnp.sum(sw * sdy, axis=2)
                        az = az + jnp.sum(sw * sdz, axis=2)
                    return ax, ay, az

                ax, ay, az = lax.cond(
                    jnp.any(is_near), near_sum, lambda a: a, (ax, ay, az)
                )
                return c0 + chunk, acc + jnp.stack([ax, ay, az], axis=2)

            acc_blk0 = jnp.zeros((t_blk, g, 3), jnp.float32)
            _, acc_blk = lax.while_loop(
                eval_cond, eval_body, (jnp.int32(0), acc_blk0)
            )
            return lax.dynamic_update_slice(
                acc_sorted_blk, acc_blk, (s0, 0, 0)
            )

        acc_sorted_blk = lax.fori_loop(
            0,
            ta_blk // t_blk,
            sub_block,
            jnp.zeros((ta_blk, g, 3), jnp.float32),
        )
        # unsort within the block and commit
        acc_unsorted = jnp.take(
            acc_sorted_blk, jnp.argsort(ord_b).astype(jnp.int32), axis=0
        )
        acc_all = lax.dynamic_update_slice(acc_all, acc_unsorted, (t0, 0, 0))
        return acc_all, bad_all

    acc_tiles, tile_bad = lax.fori_loop(
        0,
        t_cap // ta_blk,
        walk_block,
        (
            jnp.zeros((t_cap, g, 3), jnp.float32),
            jnp.zeros((t_cap,), bool),
        ),
    )

    # map back: particle i -> (tile_id[i], slot[i])
    acc = acc_tiles[tile_id, jnp.minimum(slot, g - 1)]  # (N, 3)

    # ---- fallback: reference-exact per-particle walk for deferred lanes ----
    deferred = spilled | slot_ovf | tile_bad[tile_id]
    n_deferred = jnp.sum(deferred.astype(jnp.int32))

    # Compact the deferred lanes into the smallest fitting static batch
    # (walk cost is O(batch * visits)); beyond the largest tier, walk
    # full-width. Typical scenes defer a couple of extreme-density tiles
    # (~hundreds of particles), so the small tier is the common case.
    def make_compact(b_cap):
        def fallback_compact(acc):
            idx = jnp.nonzero(deferred, size=b_cap, fill_value=n)[0]
            idx_c = jnp.minimum(idx, n - 1)
            acc_b = tree_forces(
                jnp.take(pos_new, idx_c, axis=0), src_pos, src_mass, tree,
                params, tree_params, active=idx < n,
                self_idx=gid_offset + idx_c,
            )
            return acc.at[idx].set(acc_b, mode="drop")

        return fallback_compact

    def fallback_full(acc):
        acc_fb = tree_forces(
            pos_new, src_pos, src_mass, tree, params, tree_params,
            active=deferred, self_idx=gid_offset + ii,
        )
        return jnp.where(deferred[:, None], acc_fb, acc)

    b_small = min(n, 4096)
    b_large = min(n, max(8192, -(-n // 16)))

    def dispatch(acc):
        return lax.cond(
            n_deferred <= b_small,
            make_compact(b_small),
            lambda a: lax.cond(
                n_deferred <= b_large, make_compact(b_large), fallback_full, a
            ),
            acc,
        )

    acc = lax.cond(n_deferred > 0, dispatch, lambda a: a, acc)
    return acc, GroupWalkStats(deferred=n_deferred)
