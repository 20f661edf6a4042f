"""Locally-essential-tree (LET) building blocks for the multi-chip
Barnes-Hut schedule (SURVEY.md §5 "exchange coarse locally-essential
cells"; the reference's multi-device roadmap, /root/reference/README.md:8).

Each chip owns a contiguous slice of particles, Morton-sorts and builds an
octree over ONLY its slice (O(N/P) build and memory), then runs one extra
DFS walk per remote chip with the remote chip's receiver bounding box as
the acceptance probe:

    width < theta * dmin(remote_bbox, cog)   -> export as TERMINAL point row
    leaf bucket failing the test            -> export its MEMBER particles
    internal node failing the test          -> export as INTERNAL row and
                                               descend (children follow)

Because every receiver tile on the remote chip is contained in that bbox,
its own dmin is >= the probe's, so every exported terminal row passes the
remote walk's theta test and is NEVER opened remotely: the export is a
*pruned subtree* that is theta-valid (at least as accurate as walking the
full tree) for every receiver on the destination chip.

Emission order is DFS, so pruned skip pointers come from one vectorized
searchsorted over the emitted original node indices. Exports are
fixed-size (P, let_cap) buffers exchanged with ONE all_to_all; the
receiver concatenates [its own arena | P import buffers] into a DFS
*forest* that the unchanged single-chip walks traverse end-to-end
(trailing sentinel rows jump straight to the next tree, the arena's
invalid tail jumps to the first import).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.ops.tree_build import NO_CHILD, WIDTH, TreeArrays

# Emission kinds. Round-5 export format (one unit per source-tree child,
# so the import forest is octet-walkable — VERDICT r4 missing #2):
#   _INTERNAL  cell that failed theta and descends; children follow in DFS.
#   _TERMINAL  theta-accepted cell: never opened remotely by the
#              bbox-domination argument, but receiver-side it reads as a
#              1-member "point" at its own row (first=row, count=1,
#              parts=cog/mass) so a conservatively-inflated group test
#              that does open it recovers the identical point mass.
#   _POINT     a single particle (near leaf with count 1): width 0 row
#              whose payload is the particle itself.
#   _HEADER    a near leaf with count >= 2: ONE row carrying the leaf's
#              cog/mass/width with the member count in node col 7; its
#              ``count`` payload rows follow immediately and the header's
#              skip jumps past them, so traversal sees one child unit per
#              octant (<= 8 children per internal node — the octet-table
#              invariant) while member expansion reads the payload rows.
#   _PAYLOAD   a member particle row owned by the preceding header;
#              never traversed (the header's skip clears it), it exists
#              to carry the particle in the node row (wire-derivable).
_SENTINEL, _INTERNAL, _TERMINAL, _POINT, _HEADER, _PAYLOAD = range(6)

# Pruned-skip ranking implementation. True: two per-lane lax.sorts + a
# cumsum (rank join — dense, sort-rate-bound). False: the vmapped
# jnp.searchsorted (log2(R) rounds of chained row gathers over (P, R) —
# the documented slow gather path). Flag kept for A/B measurement
# (tools/measure_let.py --component export).
_PRUNE_VIA_SORT = True

# Export-walk parallel fan-out: lanes per destination beyond the root
# lane (walk the root's 8 child subtrees as parallel lanes, re-sort the
# emissions into DFS order). Measured a LOSS on the real chip (r4,
# n_local=4M theta=0.75 octants, cap 98304): walk stage 0.170 s at
# fanout=8 vs 0.134 s single-lane, full export 0.210 vs 0.199 s — the
# while body's chained gather is ROW-throughput-bound (CLAUDE.md), so
# 9x lanes per step outweighs the ~4x fewer lockstep steps, the same
# law that killed the dual-wavefront walk. Default 0 (single lane);
# the fan-out path is kept bit-exact (test_export_fanout_matches_
# single_lane_exactly) for A/B via tools/measure_let.py --export-fanout.
_EXPORT_FANOUT = 0


def _rank_join(keys: jax.Array, queries: jax.Array) -> jax.Array:
    """Per-lane searchsorted(keys[l], queries[l], side="left") without
    binary-search gathers: tag keys 1 / queries 0, sort by (value, tag)
    so a query precedes equal keys (= side "left"), read each query's
    rank as the exclusive prefix count of key-tags, then sort back by
    (tag, query-index). Two (P, 2R) 3-column sorts + one cumsum — the
    sort rate is the fast path on TPU (measured 38 ms for 33M i32,
    PERF.md) where chained bulk gathers are the slow one. Requires
    nothing of the inputs' order (keys need not be pre-sorted)."""
    p, r = queries.shape
    qq = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[None, :], (p, r))
    val = jnp.concatenate([keys, queries], axis=1)
    tag = jnp.concatenate(
        [jnp.ones((p, keys.shape[1]), jnp.int32),
         jnp.zeros((p, r), jnp.int32)],
        axis=1,
    )
    pay = jnp.concatenate([qq[:, : keys.shape[1]], qq], axis=1)
    val_s, tag_s, pay_s = lax.sort(
        (val, tag, pay), num_keys=2, is_stable=False
    )
    prefix = jnp.cumsum(tag_s, axis=1) - tag_s  # keys strictly before
    _, _, rank_q = lax.sort(
        (tag_s, pay_s, prefix), num_keys=2, is_stable=False
    )
    return rank_q[:, :r]


def auto_let_cap(n_local: int, theta: float) -> int:
    """Export-buffer rows per destination, sized from measured need.

    A face-adjacent neighbor's export is boundary-surface detail:
    measured on v5e (tools/measure_let.py --geometry octants, uniform
    scene, n_local=4M, theta=0.75) the largest destination needs ~63.7k
    rows ~= 2.53 * n_local^(2/3); edge/corner neighbors need 57-1256.
    Opening-angle scaling: boundary cells are kept while
    width >= theta * dist, so the kept-detail depth along the shared
    face scales the row count ~ (1/theta)^2. 1.5x slack on the measured
    constant; floor 8192 (tiny-N tests and deep-drift safety); rounded
    to 4096 so forest tables keep friendly shapes. Overflow beyond the
    auto size is LOUD (ShardedTreeSim.check_overflow raises) and
    bounded by reshard() — this sizes the common case, not the
    adversarial one.
    """
    rows = 1.5 * 2.53 * (0.75 / theta) ** 2 * float(n_local) ** (2.0 / 3.0)
    return max(8192, -(-int(rows) // 4096) * 4096)


class LetExport(NamedTuple):
    """Per-destination pruned-subtree buffers (leading axis = P chips).

    nodes: (P, R, 8) f32 node-schema rows; skip/first/count: (P, R) int32
    (skip local to the buffer; first into the pair particle table);
    parts: (P, R, 4) f32 member payloads [x y z mass] (zero-mass sentinel
    on non-member rows); n_rows: (P,) emitted rows; overflow: (P,) bool —
    the destination's forces from this chip are truncated.
    """

    nodes: jax.Array
    skip: jax.Array
    first: jax.Array
    count: jax.Array
    parts: jax.Array
    n_rows: jax.Array
    overflow: jax.Array


def export_walk(
    tree: TreeArrays,
    src_pos: jax.Array,
    src_mass: jax.Array,
    bbox_lo: jax.Array,
    bbox_hi: jax.Array,
    self_index: jax.Array,
    theta: float,
    r_cap: int,
    stage: str = "full",
) -> LetExport:
    """Emit one pruned subtree per destination bbox (P lockstep lanes).

    bbox_lo/hi: (P, 3) post-drift receiver bounds per chip. The lane for
    ``self_index`` starts done (a chip walks its own tree in full and
    receives only an inert sentinel buffer from itself).

    ``stage`` is measurement-only plumbing (tools/measure_let.py): the
    emission stages after the DFS loop are cap-sized (the static-arena
    cost law — 0.075 s at 16k rows -> 0.357 at 128k on v5e, PERF.md) and
    this truncates the computation so each stage prices separately.
    "walk" returns after the DFS loop (payload columns zeroed; XLA
    removes the dead assembly), "payload" skips only the pruned-skip
    searchsorted (skips are wrong), "full" is the real export.
    """
    p = bbox_lo.shape[0]
    n_src = src_pos.shape[0]

    node_bits = lax.bitcast_convert_type(tree.nodes_f32, jnp.int32)
    tbl_walk = jnp.concatenate(
        [
            node_bits[:, :3],
            node_bits[:, WIDTH : WIDTH + 1],
            tree.nodes_f32[:, NO_CHILD].astype(jnp.int32)[:, None],
            tree.skip[:, None],
            tree.first[:, None],
            tree.count[:, None],
        ],
        axis=1,
    )

    unroll = 8
    iter_cap = r_cap // unroll
    if r_cap % unroll:
        raise ValueError(f"let_cap must be a multiple of {unroll}")

    fanout = _EXPORT_FANOUT
    if fanout:
        # Per-destination lane group [root lane | fanout child lanes]:
        # child starts come from the skip chain below the root (row 1 is
        # the first child; each child's skip is the next sibling);
        # missing children land at num_nodes, so their lanes start done.
        starts, ends = [], []
        s = jnp.minimum(jnp.int32(1), tree.num_nodes)
        for _ in range(fanout):
            starts.append(s)
            s = jnp.where(s < tree.num_nodes, tree.skip[s], tree.num_nodes)
            ends.append(s)  # subtree end = next sibling's start
        starts = jnp.stack(starts).astype(jnp.int32)  # (F,)
        ends = jnp.stack(ends).astype(jnp.int32)  # (F,)
        # Root decision per destination, same predicate as the body:
        # child lanes only walk when the root is INTERNAL for d (any
        # other root kind exports just the root row / its member chain,
        # which the root lane emits alone). Per-column element reads —
        # slicing one row of the big column-major table materializes a
        # padded copy (CLAUDE.md layout trap b).
        rx = tree.nodes_f32[:, 0][0]
        ry = tree.nodes_f32[:, 1][0]
        rz = tree.nodes_f32[:, 2][0]
        rw = tree.nodes_f32[:, WIDTH][0]
        rnc = tree.nodes_f32[:, NO_CHILD][0]
        dxr = jnp.maximum(
            jnp.maximum(bbox_lo[:, 0] - rx, rx - bbox_hi[:, 0]), 0.0
        )
        dyr = jnp.maximum(
            jnp.maximum(bbox_lo[:, 1] - ry, ry - bbox_hi[:, 1]), 0.0
        )
        dzr = jnp.maximum(
            jnp.maximum(bbox_lo[:, 2] - rz, rz - bbox_hi[:, 2]), 0.0
        )
        dminr = jnp.sqrt(dxr * dxr + dyr * dyr + dzr * dzr)  # (P,)
        root_internal = (rw >= theta * dminr) & (rnc <= 0.0)
        n_lane = 1 + fanout
        w_total = p * n_lane
        lane_dest = jnp.repeat(
            jnp.arange(p, dtype=jnp.int32), n_lane
        )  # (W,)
        lane_j = jnp.tile(jnp.arange(n_lane, dtype=jnp.int32), p)
        is_root_lane = lane_j == 0
        cur0 = jnp.where(
            lane_dest == self_index,
            tree.num_nodes,
            jnp.where(
                is_root_lane,
                0,
                jnp.where(
                    jnp.take(root_internal, lane_dest),
                    jnp.take(starts, jnp.maximum(lane_j - 1, 0)),
                    tree.num_nodes,
                ),
            ),
        ).astype(jnp.int32)
        # a child lane is done when it crosses its own subtree end —
        # the subtree's natural exit skip lands exactly on the next
        # sibling's start, which belongs to the sibling's lane
        end_w = jnp.where(
            is_root_lane,
            tree.num_nodes,
            jnp.take(ends, jnp.maximum(lane_j - 1, 0)),
        ).astype(jnp.int32)
        blo_w = jnp.take(bbox_lo, lane_dest, axis=0)  # (W, 3)
        bhi_w = jnp.take(bbox_hi, lane_dest, axis=0)
        width_w = w_total
    else:
        lanes = jnp.arange(p, dtype=jnp.int32)
        cur0 = jnp.where(
            lanes == self_index, tree.num_nodes, 0
        ).astype(jnp.int32)
        is_root_lane = None
        end_w = jnp.full((p,), tree.num_nodes, jnp.int32)
        blo_w, bhi_w = bbox_lo, bbox_hi
        width_w = p

    def cond(carry):
        it, cur, _, _, _, _ = carry
        return (it < iter_cap) & jnp.any(cur < tree.num_nodes)

    def body(carry):
        it, cur, koff, keys, kinds, membs = carry
        k_rows, kd_rows, m_rows = [], [], []
        for _ in range(unroll):
            done = cur >= end_w
            raw = jnp.take(tbl_walk, cur, axis=0)  # (W, 8)
            xyzw = lax.bitcast_convert_type(raw[:, :4], jnp.float32)
            nskip, nfirst, ncnt = raw[:, 5], raw[:, 6], raw[:, 7]
            dx = jnp.maximum(
                jnp.maximum(blo_w[:, 0] - xyzw[:, 0], xyzw[:, 0] - bhi_w[:, 0]),
                0.0,
            )
            dy = jnp.maximum(
                jnp.maximum(blo_w[:, 1] - xyzw[:, 1], xyzw[:, 1] - bhi_w[:, 1]),
                0.0,
            )
            dz = jnp.maximum(
                jnp.maximum(blo_w[:, 2] - xyzw[:, 2], xyzw[:, 2] - bhi_w[:, 2]),
                0.0,
            )
            dmin = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            theta_ok = xyzw[:, 3] < theta * dmin
            near = ~theta_ok & (raw[:, 4] > 0)
            # near leaves: count==1 emits the particle as ONE _POINT row;
            # count>=2 emits a _HEADER row (koff==0) then one _PAYLOAD
            # row per member (koff = member index + 1), the lane staying
            # on the leaf throughout.
            single = near & (ncnt == 1)
            multi = near & (ncnt > 1)
            hdr = multi & (koff == 0)
            payl = multi & (koff > 0)
            k_rows.append(jnp.where(done, tree.num_nodes, cur))
            kd_rows.append(
                jnp.where(
                    done,
                    _SENTINEL,
                    jnp.where(
                        theta_ok,
                        _TERMINAL,
                        jnp.where(
                            single,
                            _POINT,
                            jnp.where(
                                hdr,
                                _HEADER,
                                jnp.where(payl, _PAYLOAD, _INTERNAL),
                            ),
                        ),
                    ),
                ).astype(jnp.int32)
            )
            # membs: payload index for _POINT/_PAYLOAD rows; nfirst - 1
            # for _HEADER (sorts BEFORE its payloads in the fan-out
            # lane-merge, never read for parts); n_src otherwise.
            m_rows.append(
                jnp.where(
                    (single | payl) & ~done,
                    nfirst + jnp.maximum(koff - 1, 0),
                    jnp.where(hdr & ~done, nfirst - 1, n_src),
                )
            )
            exhausted = payl & (koff >= ncnt)
            koff = jnp.where(multi & ~exhausted & ~done, koff + 1, 0)
            nxt = jnp.where(
                theta_ok | single | exhausted,
                nskip,
                jnp.where(multi, cur, cur + 1),
            )
            if is_root_lane is not None:
                # a root lane emitting INTERNAL stops after that one row
                # (its children walk in the sibling lanes)
                nxt = jnp.where(
                    is_root_lane & ~theta_ok & ~near, tree.num_nodes, nxt
                )
            # finished lanes park at num_nodes so the loop cond (and the
            # overflow check) see them uniformly done even when their
            # subtree end is an interior row
            cur = jnp.where(done, tree.num_nodes, nxt)
        at = (it * unroll, jnp.int32(0))
        keys = lax.dynamic_update_slice(keys, jnp.stack(k_rows, axis=0), at)
        kinds = lax.dynamic_update_slice(kinds, jnp.stack(kd_rows, axis=0), at)
        membs = lax.dynamic_update_slice(membs, jnp.stack(m_rows, axis=0), at)
        return it + 1, cur, koff, keys, kinds, membs

    keys0 = jnp.full((r_cap, width_w), tree.num_nodes, jnp.int32)
    kinds0 = jnp.zeros((r_cap, width_w), jnp.int32)
    membs0 = jnp.full((r_cap, width_w), n_src, jnp.int32)
    _, cur_end, _, keys, kinds, membs = lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0),
            cur0,
            jnp.zeros((width_w,), jnp.int32),
            keys0,
            kinds0,
            membs0,
        ),
    )
    if fanout:
        # Reassemble each destination's lanes into DFS order: original
        # node index IS DFS rank, and a leaf's member rows carry
        # ascending payload indices, so one (key, memb) sort per
        # destination reproduces the single-lane emission order exactly;
        # sentinels (num_nodes, n_src) sink to the end. Truncation to
        # r_cap keeps the DFS prefix — identical to the single-lane
        # walk running out of buffer. A lane can never legitimately
        # overflow before its destination total does (lane rows <=
        # destination rows <= r_cap in every non-overflow case), so the
        # overflow semantics are unchanged.
        n_lane = 1 + fanout
        keys = keys.T.reshape(p, n_lane * r_cap)
        kinds = kinds.T.reshape(p, n_lane * r_cap)
        membs = membs.T.reshape(p, n_lane * r_cap)
        keys_s, membs_s, kinds_s = lax.sort(
            (keys, membs, kinds), num_keys=2, is_stable=False
        )
        total_rows = jnp.sum((kinds_s != _SENTINEL).astype(jnp.int32), axis=1)
        keys = keys_s[:, :r_cap]
        kinds = kinds_s[:, :r_cap]
        membs = membs_s[:, :r_cap]
        overflow = (
            jnp.any(
                (cur_end < tree.num_nodes).reshape(p, n_lane), axis=1
            )
            | (total_rows > r_cap)
        )
    else:
        overflow = cur_end < tree.num_nodes
        keys = keys.T  # (P, R)
        kinds = kinds.T
        membs = membs.T
    qq = jnp.arange(r_cap, dtype=jnp.int32)[None, :]

    # ---- payloads ----
    is_pt = (kinds == _POINT) | (kinds == _PAYLOAD)
    is_internal = kinds == _INTERNAL
    is_header = kinds == _HEADER
    is_node = (kinds == _TERMINAL) | is_internal | is_header
    n_rows = jnp.sum((kinds != _SENTINEL).astype(jnp.int32), axis=1)
    if stage == "walk":  # measurement-only: DFS loop + row counts alone
        zf = jnp.zeros((p, r_cap, 8), jnp.float32)
        zi = keys  # keep the loop outputs live
        return LetExport(
            nodes=zf, skip=zi, first=zi, count=kinds,
            parts=zf[:, :, :4], n_rows=n_rows, overflow=overflow,
        )

    src4 = jnp.concatenate(
        [
            jnp.concatenate([src_pos, jnp.full((1, 3), 1e15, jnp.float32)]),
            jnp.concatenate([src_mass, jnp.zeros((1,), jnp.float32)])[:, None],
        ],
        axis=1,
    )
    ppart = jnp.take(src4, jnp.where(is_pt, membs, n_src), axis=0)  # (P,R,4)
    nrow = jnp.take(tree.nodes_f32, keys, axis=0)  # (P, R, 8) (clamps)
    hdr_cnt = jnp.where(is_header, jnp.take(tree.count, keys), 0)

    # node-schema output rows, column-by-column:
    #   points/payloads -> particle rows (width 0, no_child 1);
    #   terminals -> original row (receiver-side a 1-member point at its
    #   own cog — see the kind table at the top of this module);
    #   headers -> original leaf row with the member count in col 7;
    #   internals -> original row with no_child 0;
    #   sentinels -> inert far row (cog 1e15, zero mass, no_child 1).
    cogm = jnp.where(
        is_pt[:, :, None],
        ppart,
        jnp.where(is_node[:, :, None], nrow[:, :, :4], 0.0),
    )
    cogm = jnp.where(
        (kinds == _SENTINEL)[:, :, None],
        jnp.concatenate(
            [jnp.full((1, 1, 1), 1e15), jnp.zeros((1, 1, 3))], axis=2
        ).astype(jnp.float32),
        cogm,
    )
    width = jnp.where(is_node, nrow[:, :, WIDTH], 0.0)
    single = jnp.where(is_pt, 1.0, jnp.where(is_node, nrow[:, :, 5], 0.0))
    no_child = jnp.where(is_internal, 0.0, 1.0)
    nodes_out = jnp.concatenate(
        [
            cogm,
            width[:, :, None],
            single[:, :, None],
            no_child[:, :, None],
            hdr_cnt.astype(jnp.float32)[:, :, None],
        ],
        axis=2,
    )

    # pruned skips: internal rows jump past their (pruned) subtree = the
    # number of emitted rows whose original DFS index precedes the
    # original skip (header/payload rows carry their leaf's DFS index, so
    # they count correctly); headers jump over their payload run; all
    # other rows are terminal (next row), and sentinel rows jump to the
    # buffer end so one hop reaches the next tree.
    if stage == "payload":  # measurement-only: skip the pruned ranking
        pruned = qq + jnp.zeros((p, 1), jnp.int32)
    elif _PRUNE_VIA_SORT:
        orig_skip = jnp.take(tree.skip, keys)  # (P, R)
        pruned = _rank_join(keys, orig_skip)
    else:
        orig_skip = jnp.take(tree.skip, keys)  # (P, R)
        pruned = jax.vmap(
            lambda k, s: jnp.searchsorted(k, s, side="left").astype(
                jnp.int32
            )
        )(keys, orig_skip)
    skip_out = jnp.where(
        is_internal,
        pruned,
        jnp.where(
            kinds == _SENTINEL,
            r_cap,
            jnp.where(is_header, qq + 1 + hdr_cnt, qq + 1),
        ),
    ).astype(jnp.int32)

    first_out, count_out, parts_out = derive_first_count_parts(nodes_out)
    return LetExport(
        nodes=nodes_out,
        skip=skip_out,
        first=first_out,
        count=count_out,
        parts=parts_out,
        n_rows=n_rows,
        overflow=overflow,
    )


def derive_first_count_parts(nodes: jax.Array) -> tuple:
    """Receiver-side derivation of (first, count, parts) from node rows
    alone — the single source of truth shared by ``export_walk`` (so its
    own outputs match) and ``import_from_wire`` (so the wire can drop
    those fields). Per row of the (P, R, 8) node buffer:

    - header (no_child > 0, col7 = k > 0): first = row + 1 (its payload
      run), count = k, parts = inert (a header inside a merged member
      run must contribute zero — its mass lives in the payload rows).
    - "pointish" (mass > 0 and either width == 0 [particle] or a
      terminal cell [no_child > 0, col7 == 0]): first = own row,
      count = 1, parts = own cog/mass — opening one is exactly its
      point-mass contribution, so conservative (inflated) group
      acceptance tests can open terminals without losing force.
    - internal / sentinel: count = 0, parts inert.

    A zero-mass source particle reads as non-pointish — its parts are
    inert, and its force contribution is zero either way."""
    p, r_cap, _ = nodes.shape
    qq = jnp.broadcast_to(
        jnp.arange(r_cap, dtype=jnp.int32)[None, :], (p, r_cap)
    )
    k7 = nodes[:, :, 7]
    nc = nodes[:, :, NO_CHILD]
    header = (nc > 0.0) & (k7 > 0.0)
    pointish = (nodes[:, :, 3] > 0.0) & (
        (nodes[:, :, WIDTH] == 0.0) | ((nc > 0.0) & (k7 == 0.0))
    )
    first = jnp.where(header, qq + 1, qq).astype(jnp.int32)
    count = jnp.where(
        header, k7.astype(jnp.int32), jnp.where(pointish, 1, 0)
    ).astype(jnp.int32)
    sent4 = jnp.concatenate(
        [jnp.full((1, 1, 3), 1e15, jnp.float32),
         jnp.zeros((1, 1, 1), jnp.float32)],
        axis=2,
    )
    parts = jnp.where(pointish[:, :, None], nodes[:, :, :4], sent4)
    return first, count, parts


def wire_arrays(exp: LetExport) -> tuple:
    """The subset of a LetExport that must actually cross the ICI:
    (nodes, skip, n_rows, overflow) — 36 B/row instead of the full
    struct's 60 B, and 4 collectives instead of 7.

    The dropped fields (first/count/parts) are receiver-derivable from
    the node rows alone — see ``derive_first_count_parts``, which both
    sides share so the round trip is bit-equal by construction."""
    return exp.nodes, exp.skip, exp.n_rows, exp.overflow


def import_from_wire(
    nodes: jax.Array,
    skip: jax.Array,
    n_rows: jax.Array,
    overflow: jax.Array,
) -> LetExport:
    """Rebuild the full LetExport from the wire arrays (see
    ``wire_arrays``) — bit-equal to exchanging every field."""
    first, count, parts = derive_first_count_parts(nodes)
    return LetExport(
        nodes=nodes,
        skip=skip,
        first=first,
        count=count,
        parts=parts,
        n_rows=n_rows,
        overflow=overflow,
    )


def assemble_forest(
    tree_l: TreeArrays,
    imp: LetExport,
    n_local: int,
) -> tuple[TreeArrays, int]:
    """Concatenate [local arena | P import buffers | sentinel] into one
    walkable DFS forest.

    Returns (forest TreeArrays, particle-table base layout): the caller
    must evaluate against the concatenated particle table
    [local sorted particles (n_local) | one zero row | import parts
    (P*R)], which is exactly how ``first`` columns are rewritten here.
    """
    p, r_cap = imp.skip.shape
    cap_l = tree_l.nodes_f32.shape[0] - 1
    base = cap_l + 1
    total = base + p * r_cap

    kk = jnp.arange(cap_l + 1, dtype=jnp.int32)
    # the arena's invalid tail (>= num_nodes, including the sentinel row)
    # flows into the first import; valid rows keep their skips
    skip_local = jnp.where(kk >= tree_l.num_nodes, base, tree_l.skip)
    offs = base + jnp.arange(p, dtype=jnp.int32) * r_cap  # (P,)

    nodes = jnp.concatenate(
        [
            tree_l.nodes_f32,
            imp.nodes.reshape(p * r_cap, 8),
            tree_l.nodes_f32[cap_l : cap_l + 1],  # final sentinel row
        ],
        axis=0,
    )
    skip = jnp.concatenate(
        [
            skip_local,
            (imp.skip + offs[:, None]).reshape(-1),
            jnp.full((1,), total, jnp.int32),
        ]
    )
    # local leaf ranges already index the local particle table; the
    # arena's invalid rows point at n_local — the zero row separating
    # local particles from import payloads. Import rows point at their
    # own buffer slot in the import region.
    part_offs = n_local + 1 + jnp.arange(p, dtype=jnp.int32) * r_cap
    first = jnp.concatenate(
        [
            tree_l.first,
            (imp.first + part_offs[:, None]).reshape(-1),
            jnp.full((1,), n_local, jnp.int32),
        ]
    )
    count = jnp.concatenate(
        [tree_l.count, imp.count.reshape(-1), jnp.zeros((1,), jnp.int32)]
    )
    forest = TreeArrays(
        nodes_f32=nodes,
        skip=skip,
        first=first,
        count=count,
        num_nodes=jnp.int32(total),
        root_width=tree_l.root_width,
        overflowed=tree_l.overflowed | jnp.any(imp.overflow),
    )
    return forest, total


def assemble_import_forest(imp: LetExport, part_base: int = 0) -> TreeArrays:
    """Concatenate ONLY the P import buffers into a walkable DFS forest.

    Used by the split LET walk: the local tree keeps its octet tables
    (the fast group-walk engine), so only the small import forest —
    P * let_cap rows of already-pruned subtrees — needs the generic
    skip-pointer walk, and gravity adds the two accelerations. Walking
    starts at buffer 0 row 0; each buffer's sentinel tail rows jump to
    the next buffer (one inert hop per boundary). The matching particle
    table is ``imp.parts`` flattened (plus ``part_base``): row
    ``first[k]`` of buffer b is payload ``part_base + b * let_cap + k``
    (exactly how ``first`` is rewritten here), and member payload
    indices never collide with receiver gids as long as callers pass
    ``gid_offset >= part_base + P * let_cap`` (or use a concatenated
    source table whose import region starts at ``part_base``).
    """
    p, r_cap = imp.skip.shape
    total = p * r_cap
    offs = jnp.arange(p, dtype=jnp.int32)[:, None]
    # trailing inert row (the group walk's list-sentinel target): far
    # zero-mass single, matching export_walk's in-buffer sentinel rows
    sent_row = jnp.concatenate(
        [
            jnp.full((1, 1), 1e15, jnp.float32),
            jnp.zeros((1, 3), jnp.float32),
            jnp.zeros((1, 1), jnp.float32),  # width
            jnp.ones((1, 1), jnp.float32),  # is_single
            jnp.ones((1, 1), jnp.float32),  # no_child
            jnp.zeros((1, 1), jnp.float32),
        ],
        axis=1,
    )
    return TreeArrays(
        nodes_f32=jnp.concatenate(
            [imp.nodes.reshape(total, 8), sent_row], axis=0
        ),
        skip=jnp.concatenate(
            [
                (imp.skip + offs * r_cap).reshape(-1),
                jnp.full((1,), total, jnp.int32),
            ]
        ),
        first=jnp.concatenate(
            [
                (imp.first + offs * r_cap + part_base).reshape(-1),
                jnp.full((1,), part_base + total, jnp.int32),
            ]
        ),
        count=jnp.concatenate(
            [imp.count.reshape(-1), jnp.zeros((1,), jnp.int32)]
        ),
        num_nodes=jnp.int32(total),
        root_width=jnp.float32(0.0),
        overflowed=jnp.any(imp.overflow),
    )


class CompactForest(NamedTuple):
    """``compact_import_forest`` result: the P import buffers packed
    back-to-back with their inter-buffer slack removed.

    forest:  skip-format TreeArrays over ``cap_forest`` (+1 sentinel)
             rows; ``first`` is ABSOLUTE into the caller's source table
             (``part_base`` + compacted row), skips are clamped to each
             buffer's extent so traversal chains buffer -> buffer and a
             per-particle walk from row 0 visits the whole forest.
    roots:   (P,) compacted row of each buffer's root (source root).
    extents: (P,) rows kept per buffer; 0 marks an inert buffer (the
             self lane) whose root must not be seeded.
    parts:   (cap_forest, 4) member payload rows aligned with forest
             rows (the caller appends these to its source table at
             ``part_base``).
    overflow: () bool — total real rows exceeded ``cap_forest`` (or an
             export already truncated): remote forces are truncated and
             the step driver must fail loudly (check_overflow).
    """

    forest: TreeArrays
    roots: jax.Array
    extents: jax.Array
    parts: jax.Array
    overflow: jax.Array


def compact_import_forest(
    imp: LetExport, cap_forest: int, part_base: int = 0
) -> CompactForest:
    """Pack the (P, R) import buffers into one slack-free forest.

    The fused LET walk (VERDICT r4 missing #2) builds octet tables for
    the import forest with IDENTITY row mapping (ops/import_octets.py),
    so table size — which prices both the chained phase-A gathers and
    the table build itself — must track REAL rows, not P*R. Real
    exports are boundary detail (~2.53 * n_local^(2/3) rows for a face
    neighbor, ~1e2-1e3 for edges/corners — PERF.md), so the packed
    forest is a few face-buffers big where P*R carries 8x the slack.

    Per buffer b: rows [0, n_rows_b) move to [off_b, off_b + n_b);
    within-buffer skip/first values shift by the same offset, clamped
    to the buffer extent first so every tail/sentinel jump lands
    exactly on the next buffer's root (the chaining the padded
    assembly got from its sentinel rows). Overflow clamps trailing
    buffers and raises the flag — truncated forces, surfaced loudly,
    never out-of-bounds reads.
    """
    p, r_cap = imp.skip.shape
    n_b = jnp.minimum(imp.n_rows, r_cap)  # (P,)
    off_raw = jnp.cumsum(n_b) - n_b  # exclusive prefix
    total_raw = jnp.sum(n_b)
    off = jnp.minimum(off_raw, cap_forest)
    n_eff = jnp.minimum(n_b, cap_forest - off)
    total = jnp.minimum(total_raw, cap_forest)
    overflow = (total_raw > cap_forest) | jnp.any(imp.overflow)

    jj = jnp.arange(cap_forest, dtype=jnp.int32)
    ends = off + n_eff
    b_of = jnp.clip(
        jnp.searchsorted(ends, jj, side="right").astype(jnp.int32), 0, p - 1
    )
    within = jj - jnp.take(off, b_of)
    valid = jj < total
    flat = jnp.where(valid, b_of * r_cap + within, p * r_cap)

    sent_node = jnp.zeros((1, 8), jnp.float32)
    sent_node = sent_node.at[0, 0].set(1e15).at[0, NO_CHILD].set(1.0)
    nodes_flat = jnp.concatenate(
        [imp.nodes.reshape(p * r_cap, 8), sent_node], axis=0
    )
    skip_flat = jnp.concatenate(
        [imp.skip.reshape(-1), jnp.full((1,), r_cap, jnp.int32)]
    )
    first_flat = jnp.concatenate(
        [imp.first.reshape(-1), jnp.zeros((1,), jnp.int32)]
    )
    count_flat = jnp.concatenate(
        [imp.count.reshape(-1), jnp.zeros((1,), jnp.int32)]
    )
    parts_flat = jnp.concatenate(
        [
            imp.parts.reshape(p * r_cap, 4),
            jnp.concatenate(
                [jnp.full((1, 3), 1e15, jnp.float32),
                 jnp.zeros((1, 1), jnp.float32)],
                axis=1,
            ),
        ],
        axis=0,
    )
    nodes_c = jnp.take(nodes_flat, flat, axis=0)
    nodes_c = jnp.where(valid[:, None], nodes_c, sent_node)
    n_eff_j = jnp.take(n_eff, b_of)
    off_j = jnp.take(off, b_of)
    skip_src = jnp.take(skip_flat, flat)
    first_src = jnp.take(first_flat, flat)
    first_cl = jnp.minimum(first_src, n_eff_j)
    count_c = jnp.clip(jnp.take(count_flat, flat), 0, n_eff_j - first_cl)
    skip_c = jnp.where(
        valid, jnp.minimum(skip_src, n_eff_j) + off_j, cap_forest
    )
    first_c = jnp.where(valid, first_cl + off_j, total) + part_base
    count_c = jnp.where(valid, count_c, 0)
    parts_c = jnp.take(parts_flat, flat, axis=0)

    forest = TreeArrays(
        nodes_f32=jnp.concatenate([nodes_c, sent_node], axis=0),
        skip=jnp.concatenate(
            [skip_c, jnp.full((1,), cap_forest, jnp.int32)]
        ),
        first=jnp.concatenate(
            [first_c, jnp.full((1,), part_base + cap_forest, jnp.int32)]
        ),
        count=jnp.concatenate([count_c, jnp.zeros((1,), jnp.int32)]),
        num_nodes=total,
        root_width=jnp.float32(0.0),
        overflowed=overflow,
    )
    return CompactForest(
        forest=forest, roots=off, extents=n_eff, parts=parts_c,
        overflow=overflow,
    )


def let_memory_bytes(
    n: int, p: int, tp, let_cap: int = 8192, walk_list_rows: int | None = None
) -> dict:
    """Per-chip LIVE bytes of the LET schedule's dominant arrays at N
    particles over P chips — the scalability budget (BASELINE config 4:
    N=32M on v5e-8 with 16 GB HBM/chip). Transient build scans add
    ~(depth+1) * n_l * 16 B, still O(N/P).
    """
    n_l = n // p
    cap_l = tp.capacity(n_l)
    r = let_cap
    g = tp.effective_walk_tile(n_l)
    t_cap = -(-n_l // g) + max(8, 2 * -(-n_l // g))
    rows = walk_list_rows or (-(-(2 * tp.walk_list_cap) // 256) * 256)
    ta_blk = min(2048, t_cap)
    fused = tp.walk_engine == "octet" and tp.let_fused
    cf = tp.let_forest_cap(p, r) if fused else p * r
    sizes = {
        # two generations of SoA state (donated ping-pong)
        "state": 2 * n_l * 40,
        "local_arena": (cap_l + 1) * (32 + 12),  # nodes_f32 + skip/first/count
        # import forest: compacted (fused walk) or padded P*R (split)
        "import_forest": (cf + 1) * (32 + 12) + (cf * 16 if fused else 0),
        "export_import": 2 * p * r * (32 + 12 + 16),  # exports + imports
        # local walk's comb table (octet engine: octet_pts + pair rows
        # over [local | imports]) plus (split) the import walk's tables
        "eval_tables": (3 * ((n_l + 1 + cf + 1) // 2)) * 32
        + (0 if fused else (p * r + 1 + p * r) * 32),
        "tiles": t_cap * g * 3 * 4 + t_cap * g * 4,  # tile pos + gid
        "phase_a_lists": rows * ta_blk * 4,
        "acc_tiles": t_cap * g * 3 * 4,
    }
    if tp.walk_engine == "octet":
        cap_oct = tp.octet_capacity(n_l)
        sizes["local_octets"] = cap_oct * 17 * 4 + (cap_oct * 12 + 2) * 32
        if fused:
            # identity-mapped import octet + pts tables + combined copies
            sizes["import_octets"] = cf * 17 * 4 + cf * 12 * 32
    sizes["total"] = sum(sizes.values())
    return sizes
