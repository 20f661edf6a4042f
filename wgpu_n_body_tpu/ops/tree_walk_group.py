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
  phase A  every tile traverses the tree once with a *conservative*
           acceptance test against its bbox: accept node iff
           width < theta * dmin(bbox, cog). theta-accepted nodes enter the
           tile's interaction list as point-mass rows; opened leaf buckets
           are EXPANDED into one member point row per particle. Two
           traversal engines produce identical lists:

           octet engine (default, needs TreeArrays.octets): XLA row
           gathers on TPU are LATENCY bound (~30 us per dependent step at
           any practical width, ~3-9 ns marginal per row), so the cost
           driver is the number of lockstep steps, not gathered bytes.
           Each step therefore gathers one *opened* node's octet row and
           theta-tests all 8 children at once, emitting up to 8 accepted
           point rows; opened-leaf member runs (Morton-adjacent leaf
           children merge into one contiguous particle range) stream 8
           member rows per step. Descent uses a (depth)-deep per-lane
           stack of resume items updated with select chains (at most ONE
           push per step: the parent is re-visited with a processed-
           children mask to pick up its next open/member child, a
           re-gather being far cheaper than multi-item pushes). Measured
           3.7x fewer lockstep steps than the skip-pointer engine at
           N=1M disc (host sim: 7.7k vs 29k).

           skip engine (fallback for octet-less trees — LET forests,
           host-built oracles): the stackless skip-pointer walk, one node
           visit per step, opened buckets expanded one member per step.

           Tiles are processed in DENSITY order (deepest adaptive cell
           first): lockstep visit counts within a block then match, where
           Morton-block order wasted ~8x on mixed blocks.
  phase B  dense evaluation: each tile's particles against its list in
           (G x chunk) VPU blocks with ONE uniform point-mass formula
           (tree.wgsl:66-67) — node rows and member rows read from one
           combined table; self-interaction is excluded by global index
           (naive.wgsl:30-32 semantics) via the member row's index column.
  fallback tiles that exhaust the traversal row budget defer their
           particles to the reference-exact per-particle walk, under
           ``lax.cond`` — zero cost when nothing deferred.

Accuracy: dmin <= every member's own distance, so a group-accepted node
passes each member's own theta test — the group walk opens a superset of
the per-particle walk's nodes and is at least as accurate for every
particle. Opened buckets of ANY count (including overfull max-depth cells)
are summed exactly via member expansion. theta -> 0 degenerates to the
exact all-pairs sum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.ops import morton, scan
from wgpu_n_body_tpu.ops.tree_build import (
    NO_CHILD,
    OCTET_CHILD_COLS,
    WIDTH,
    TreeArrays,
)
from wgpu_n_body_tpu.ops.tree_walk import tree_forces
from wgpu_n_body_tpu.params import SimParams, TreeParams


class GroupWalkStats(NamedTuple):
    deferred: jax.Array  # () int32: particles sent down the fallback walk


# Internal instrumentation: when True, phase B evaluation is skipped
# (forces come out zero) so profiling scripts can attribute walk time to
# traversal vs evaluation. Never set in production paths.
_DEBUG_SKIP_EVAL = False


def _tile_assignment(keys, n, depth, g_tile):
    """Split the sorted particle axis into density-adaptive pieces.

    Each particle's *tile cell* is its deepest ancestor Morton cell still
    holding >= g_tile particles (so the cell holds < 8*g_tile — its extent
    adapts to local density). Pieces break at tile-cell changes and every
    g_tile particles within a cell. A fixed coarse level fails on skewed
    scenes: at N=1M a level-3 cell is 0.25 wide, and a sparse piece
    spanning one that also contains the galaxy core gets a huge bbox and
    must open the whole core (~100k visits per tile).

    Run structure at all levels comes from one clz pass + two batched
    blocked scans (run starts nest across levels — see
    morton.split_levels), not a per-level loop.

    Returns (tile_id (n,), lstar (n,), t_cap, t_blk, ta_blk) — lstar is
    the per-particle adaptive-cell depth, the density key for phase-A
    block formation.
    """
    hi, lo = keys
    ii = jnp.arange(n, dtype=jnp.int32)
    s = morton.split_levels(hi, lo, depth)
    lv = jnp.arange(depth + 1, dtype=jnp.int32)[:, None]
    start_all = s[None, :] <= lv
    rs_all = scan.cummax_last(jnp.where(start_all, ii[None, :], jnp.int32(-1)))
    nxt = jnp.where(start_all, ii[None, :], jnp.int32(n))
    ns = scan.cummin_last(nxt[:, ::-1])[:, ::-1]
    re_all = jnp.concatenate(
        [ns[:, 1:], jnp.full((depth + 1, 1), n, jnp.int32)], axis=1
    )
    counts_dense = re_all - rs_all
    # deepest level whose containing run still holds >= g_tile particles
    lstar = jnp.sum((counts_dense >= g_tile).astype(jnp.int32), axis=0) - 1
    lstar = jnp.clip(lstar, 0, depth)
    # piece break where the adaptive cell changes (the key prefix at
    # lstar differs, or lstar itself changes) or every g_tile particles
    prev_lstar = jnp.concatenate([jnp.full((1,), -1, jnp.int32), lstar[:-1]])
    grp_start = (ii == 0) | (lstar != prev_lstar) | (s <= lstar)
    rs_grp = scan.cummax_last(jnp.where(grp_start, ii, jnp.int32(-1)))
    brk = grp_start | ((ii - rs_grp) % g_tile == 0)
    tile_id = jnp.cumsum(brk).astype(jnp.int32) - 1
    # static budget: count chunks (N/G) + group starts. Maximal same-cell
    # groups interleave with >=G-particle subcells, so their number stays
    # O(N/G); the 2x slack covers skew, and spills defer (never corrupt).
    t_cap = -(-n // g_tile) + max(8, 2 * -(-n // g_tile))
    t_blk = min(256, t_cap)
    t_cap = -(-t_cap // t_blk) * t_blk
    # phase-A traversal block: tiles are grouped by DENSITY (lstar), so a
    # block's lockstep iteration count is the max over similar tiles
    ta_blk = min(2048, t_cap)
    t_cap = -(-t_cap // ta_blk) * ta_blk
    return tile_id, lstar, t_cap, t_blk, ta_blk


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
    src_pos:  (N, 3) pre-step source positions, FULL sorted order (member
              rows read these — the reference's src buffer).
    src_mass: (N,) sorted masses.
    keys:     Morton keys of the receivers (same slice as pos_new).
    gid_offset: global sorted index of receiver row 0 (shard offset).
    """
    n = pos_new.shape[0]  # receivers
    n_src = src_pos.shape[0]
    cap = tree.nodes_f32.shape[0] - 1
    g = tree_params.walk_tile
    l_cap = tree_params.walk_list_cap
    theta = tree_params.theta
    gdt = params.g * params.dt
    depth = tree_params.max_depth
    e = params.e

    tile_id_raw, lstar, t_cap, t_blk, ta_blk = _tile_assignment(
        keys, n, depth, g
    )
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
    # GLOBAL sorted index per slot, for exact self-exclusion against
    # member rows; invalid (padding) slots get n_src (matches nothing)
    valid_slot = sidx[None, :] < piece_len[:, None]
    slot_gid = jnp.where(valid_slot, part_idx + gid_offset, n_src)  # (T, G)

    bbox_lo = jnp.min(tiles, axis=1)  # (T, 3)
    bbox_hi = jnp.max(tiles, axis=1)

    # DENSITY ordering: phase-A blocks traverse in lockstep, so a block's
    # cost is its max visit count. Tiles from the galaxy core visit ~10x
    # more rows than rim tiles; Morton-contiguous blocks mix them (r1:
    # ~8x lockstep waste measured at N=1M). Sorting tiles by adaptive-cell
    # depth (denser = deeper = more visits), Morton-stable within a depth,
    # makes blocks near-uniform. Everything tile-indexed below runs in
    # density order; results are unsorted once at the end.
    lstar_tile = jnp.where(
        piece_len > 0, lstar[jnp.clip(piece_start, 0, max(n - 1, 0))], -1
    )
    tt = jnp.arange(t_cap, dtype=jnp.int32)
    order = jnp.argsort(-(lstar_tile * t_cap) - (t_cap - tt)).astype(jnp.int32)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    tiles_d = jnp.take(tiles, order, axis=0)
    gid_d = jnp.take(slot_gid, order, axis=0)
    bbox_lo_d = jnp.take(bbox_lo, order, axis=0)
    bbox_hi_d = jnp.take(bbox_hi, order, axis=0)
    piece_len_d = jnp.take(piece_len, order)

    # ---- combined evaluation table: nodes ++ source particles ----
    # One int32 view (int columns must never ride through f32 selects —
    # denormal flushing, see tree_build) holding, per row:
    #   [x, y, z, mass] (f32 bits)  |  cols 4-6 unused  |  col 7 = global
    #   particle index for member rows, -1 for node rows (never equal to
    #   a receiver gid).
    # Node k's point-mass row IS row k; source particle j's row is
    # cap+1+j. Phase A emits row ids straight into the lists; phase B is
    # then a single uniform gather + point-mass pass, with the sentinel
    # (row cap: zero mass, cog 1e30) contributing exactly zero.
    node_bits = lax.bitcast_convert_type(tree.nodes_f32, jnp.int32)
    node_rows = jnp.concatenate(
        [node_bits[:, :7], jnp.full((cap + 1, 1), -1, jnp.int32)], axis=1
    )
    part_bits = lax.bitcast_convert_type(
        jnp.concatenate([src_pos, src_mass[:, None]], axis=1), jnp.int32
    )
    part_rows = jnp.concatenate(
        [
            part_bits,
            jnp.zeros((n_src, 3), jnp.int32),
            jnp.arange(n_src, dtype=jnp.int32)[:, None],
        ],
        axis=1,
    )
    comb_i32 = jnp.concatenate([node_rows, part_rows], axis=0)
    member_base = cap + 1

    # ---- traversal table: one 8-col int32 row gather per visited node ----
    # [cx, cy, cz, width] (f32 bits) | no_child | skip | first | count
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

    # ---- phase A: tile traversals -> interaction lists ----
    # Emission is ITERATION-indexed: traversal step k writes row block k of
    # an (R, TA) array with one in-place dynamic_update_slice per unrolled
    # step group. Scatter-based per-tile append (at[slot].set on a carried
    # multi-MB array) copies the whole array every iteration on TPU —
    # measured 63 us/iter vs ~20 us for the in-place row write. Rows where
    # a tile did not accept hold the sentinel `cap` and cost only wasted
    # phase-B lanes.
    # The iteration budget IS the list capacity: overflow cannot happen;
    # tiles not finished within R rows are deferred to the fallback.
    use_octet = tree.octets is not None
    k_slots = 8  # octet engine: emission rows per step
    if use_octet:
        # The octet body is ~450 elementwise ops per step: unrolling 8
        # steps amortizes TPU while-iteration overhead, but LLVM (the XLA
        # *CPU* backend) takes >9 min on the 8x body — tests and the
        # multichip dryrun run on CPU, so unroll shallow there.
        unroll = 8 if jax.default_backend() == "tpu" else 1
        # steps emit k_slots rows each (~50% slot occupancy vs ~55% row
        # occupancy for the skip engine), so the octet row budget is 2x
        r_cap = -(-(4 * l_cap) // 256) * 256
        iter_cap = (r_cap - k_slots) // (unroll * k_slots)
    else:
        unroll = 16
        # rows: multiple of 256 so the eval chunk (min(256, r_cap)) always
        # divides it and unroll (16) always divides the chunk
        r_cap = -(-(2 * l_cap) // 256) * 256
        iter_cap = r_cap // unroll

    chunk = min(256, r_cap)
    if r_cap % chunk or t_cap % t_blk or ta_blk % t_blk:
        raise ValueError(
            f"internal tiling mismatch: walk_list_cap={l_cap} -> r_cap="
            f"{r_cap}, chunk={chunk}, t_cap={t_cap}, t_blk={t_blk}, "
            f"ta_blk={ta_blk}"
        )

    # empty tiles start done
    cur_init = jnp.where(piece_len_d > 0, 0, tree.num_nodes).astype(jnp.int32)

    def phase_a_skip(t0, blo, bhi):
        """Skip-pointer engine: one node visit per lockstep step."""
        cur0 = lax.dynamic_slice(cur_init, (t0,), (ta_blk,))

        def cond(carry):
            it, cur, _, _, _ = carry
            return (it < iter_cap) & jnp.any(cur < tree.num_nodes)

        def body(carry):
            it, cur, koff, lists, visits = carry
            rows = []
            for _ in range(unroll):
                done = cur >= tree.num_nodes
                raw = jnp.take(tbl_walk, cur, axis=0)  # (TA, 8) int32
                xyzw = lax.bitcast_convert_type(raw[:, :4], jnp.float32)
                nskip = raw[:, 5]
                nfirst = raw[:, 6]
                ncnt = raw[:, 7]
                cx, cy, cz = xyzw[:, 0], xyzw[:, 1], xyzw[:, 2]
                dx = jnp.maximum(jnp.maximum(blo[:, 0] - cx, cx - bhi[:, 0]), 0.0)
                dy = jnp.maximum(jnp.maximum(blo[:, 1] - cy, cy - bhi[:, 1]), 0.0)
                dz = jnp.maximum(jnp.maximum(blo[:, 2] - cz, cz - bhi[:, 2]), 0.0)
                dmin = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                theta_ok = xyzw[:, 3] < theta * dmin
                near = ~theta_ok & (raw[:, 4] > 0)
                # far: the node's own point-mass row. near: one member
                # particle row per iteration — the lane stays on the
                # bucket until all `count` members are emitted (any
                # count, including overfull max-depth cells: exact).
                entry = jnp.where(
                    theta_ok,
                    cur,
                    jnp.where(near, member_base + nfirst + koff, cap),
                )
                rows.append(jnp.where(done, cap, entry))
                visits = visits + (~done).astype(jnp.int32)
                exhausted = koff + 1 >= ncnt
                koff = jnp.where(near & ~exhausted & ~done, koff + 1, 0)
                nxt = jnp.where(
                    theta_ok | (near & exhausted),
                    nskip,
                    jnp.where(near, cur, cur + 1),
                )
                cur = jnp.where(done, cur, nxt)
            lists = lax.dynamic_update_slice(
                lists, jnp.stack(rows, axis=0), (it * unroll, jnp.int32(0))
            )
            return it + 1, cur, koff, lists, visits

        lists_b0 = jnp.full((r_cap, ta_blk), cap, jnp.int32)
        visits_b0 = jnp.zeros((ta_blk,), jnp.int32)
        koff_b0 = jnp.zeros((ta_blk,), jnp.int32)
        _, cur_b, _, lists_b, visits_b = lax.while_loop(
            cond, body, (jnp.int32(0), cur0, koff_b0, lists_b0, visits_b0)
        )
        return lists_b, visits_b, cur_b < tree.num_nodes

    def phase_a_octet(t0, blo, bhi):
        """Octet engine: one *opened* node (8 child tests) per step.

        Per-lane item registers: kind (0 idle / 1 open / 2 members),
        ia (octet ptr | member first), ib (node first | members left),
        im (processed-children bitmask for resumed opens), iw (node
        width, f32). The resume stack holds one item per tree level
        (only descents push; the parent is re-entered with its mask to
        find the next open/member child), so S = max_depth + margin
        bounds it and overflow marks the lane deferred.
        """
        s_cap = depth + 4
        octets = tree.octets
        active0 = lax.dynamic_slice(piece_len_d, (t0,), (ta_blk,)) > 0
        # root classification (vector over lanes, outside the loop): the
        # root is the only node that is nobody's octet child.
        r_row = tree.nodes_f32[0]
        rdx = jnp.maximum(jnp.maximum(blo[:, 0] - r_row[0], r_row[0] - bhi[:, 0]), 0.0)
        rdy = jnp.maximum(jnp.maximum(blo[:, 1] - r_row[1], r_row[1] - bhi[:, 1]), 0.0)
        rdz = jnp.maximum(jnp.maximum(blo[:, 2] - r_row[2], r_row[2] - bhi[:, 2]), 0.0)
        r_acc = r_row[WIDTH] < theta * jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
        r_term = r_row[NO_CHILD] > 0.0
        kind0 = jnp.where(
            active0, jnp.where(r_acc, 0, jnp.where(r_term, 2, 1)), 0
        ).astype(jnp.int32)
        ia0 = jnp.where(kind0 == 2, tree.first[0], 0)
        ib0 = jnp.where(kind0 == 2, tree.count[0], tree.first[0])
        im0 = jnp.zeros((ta_blk,), jnp.int32)
        iw0 = jnp.broadcast_to(r_row[WIDTH], (ta_blk,))
        lists0 = jnp.full((r_cap, ta_blk), cap, jnp.int32)
        lists0 = lax.dynamic_update_slice(
            lists0,
            jnp.where(active0 & r_acc, 0, cap)[None, :],
            (0, jnp.int32(0)),
        )
        nrows0 = jnp.where(active0, k_slots, 0)

        def cond(carry):
            it, kind = carry[0], carry[1]
            return (it < iter_cap) & jnp.any(kind > 0)

        def body(carry):
            # The body is written as ELEMENTWISE (TA,)-shaped select chains
            # (python-unrolled over the 8 child slots and the stack depth)
            # on purpose: cross-slot reductions/one-hots (cumsum, argmax,
            # axis sums) each become their own TPU kernel inside the while
            # body, and the resulting launch storm measured ~100 us/step —
            # the elementwise form fuses into a handful of kernels.
            (it, kind, ia, ib, im, iw, sp, sk, sa, sb, sm, sw, lists,
             nrows, bad) = carry
            step_rows = []
            for _ in range(unroll):
                is_open = kind == 1
                is_mem = kind == 2
                act = kind > 0
                ptr = jnp.where(is_open, ia, 0)
                raw = jnp.take(octets, ptr, axis=0)  # (TA, 40) int32
                cw = iw * 0.5
                cid, ccnt, exists, cterm, cacc, cmem_l = [], [], [], [], [], []
                cfirst = []
                running = ib
                for c in range(8):
                    o = c * OCTET_CHILD_COLS
                    cx = lax.bitcast_convert_type(raw[:, o + 0], jnp.float32)
                    cy = lax.bitcast_convert_type(raw[:, o + 1], jnp.float32)
                    cz = lax.bitcast_convert_type(raw[:, o + 2], jnp.float32)
                    aux = raw[:, o + 4]
                    ex = (aux & 1) == 1
                    cnt = aux >> 2
                    dx = jnp.maximum(jnp.maximum(blo[:, 0] - cx, cx - bhi[:, 0]), 0.0)
                    dy = jnp.maximum(jnp.maximum(blo[:, 1] - cy, cy - bhi[:, 1]), 0.0)
                    dz = jnp.maximum(jnp.maximum(blo[:, 2] - cz, cz - bhi[:, 2]), 0.0)
                    dmin = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                    procd = ((im >> c) & 1) == 1
                    acc_c = ex & (cw < theta * dmin)
                    term_c = (aux & 2) == 2
                    cid.append(raw[:, o + 3])
                    ccnt.append(cnt)
                    exists.append(ex)
                    cterm.append(term_c)
                    cacc.append(acc_c)
                    cmem_l.append(ex & ~acc_c & term_c & ~procd)
                    cfirst.append(running)
                    running = running + cnt
                    if c == 0:
                        emit_l = [acc_c & ~procd]
                        copen_l = [ex & ~acc_c & ~term_c & ~procd]
                    else:
                        emit_l.append(acc_c & ~procd)
                        copen_l.append(ex & ~acc_c & ~term_c & ~procd)
                # maximal runs of adjacent member children merge into one
                # contiguous particle range (children partition the parent
                # run in slot = Morton order)
                run_start = [cmem_l[0]] + [
                    cmem_l[c] & ~cmem_l[c - 1] for c in range(1, 8)
                ]
                run_tot = [None] * 8
                run_msk = [None] * 8
                run_tot[7] = ccnt[7]
                run_msk[7] = jnp.where(cmem_l[7], jnp.int32(128), 0)
                for c in range(6, -1, -1):
                    nxt_in = cmem_l[c + 1]
                    run_tot[c] = ccnt[c] + jnp.where(nxt_in, run_tot[c + 1], 0)
                    run_msk[c] = jnp.int32(1 << c) | jnp.where(
                        nxt_in, run_msk[c + 1], 0
                    )
                # emission at natural slot positions (slots are fixed
                # K-wide, so compaction would buy nothing); member lanes
                # stream K contiguous ids
                open_lane = act & is_open
                mem_lane = act & is_mem
                for k in range(k_slots):
                    row_k = jnp.where(
                        open_lane & emit_l[k],
                        cid[k],
                        jnp.where(
                            mem_lane & (k < ib), member_base + ia + k, cap
                        ),
                    )
                    step_rows.append(row_k)
                # next open/member child = lowest candidate slot, via a
                # descending select chain
                n_kind = jnp.zeros((ta_blk,), jnp.int32)
                n_a = jnp.zeros((ta_blk,), jnp.int32)
                n_b = jnp.zeros((ta_blk,), jnp.int32)
                n_bits = jnp.zeros((ta_blk,), jnp.int32)
                any_cand = jnp.zeros((ta_blk,), bool)
                n_cand = jnp.zeros((ta_blk,), jnp.int32)
                done_bits = jnp.zeros((ta_blk,), jnp.int32)
                for c in range(7, -1, -1):
                    sel = copen_l[c] | (cmem_l[c] & run_start[c])
                    opn = copen_l[c]
                    n_kind = jnp.where(sel, jnp.where(opn, 1, 2), n_kind)
                    n_a = jnp.where(sel, jnp.where(opn, cid[c], cfirst[c]), n_a)
                    n_b = jnp.where(sel, jnp.where(opn, cfirst[c], run_tot[c]), n_b)
                    n_bits = jnp.where(
                        sel, jnp.where(opn, jnp.int32(1 << c), run_msk[c]), n_bits
                    )
                    any_cand = any_cand | sel
                    n_cand = n_cand + sel
                    done_bits = done_bits | jnp.where(
                        ~exists[c] | cacc[c], jnp.int32(1 << c), 0
                    )
                resume_mask = im | done_bits | n_bits
                cont = mem_lane & (ib > k_slots)
                descend = open_lane & any_cand
                push = descend & (n_cand > 1)
                pop = act & ~cont & ~descend & (sp > 0)
                overflow = push & (sp >= s_cap)
                push = push & ~overflow
                # single-slot stack write (push) + top read (pop): the
                # write is one fused where per register over the (S, TA)
                # stack; the read is an unrolled select chain (elementwise,
                # so it fuses — an axis-0 reduction would not)
                p_k = jnp.zeros((ta_blk,), jnp.int32)
                p_a = jnp.zeros((ta_blk,), jnp.int32)
                p_b = jnp.zeros((ta_blk,), jnp.int32)
                p_m = jnp.zeros((ta_blk,), jnp.int32)
                p_w = jnp.zeros((ta_blk,), jnp.float32)
                for d in range(s_cap):
                    rsel = sp == d + 1
                    p_k = jnp.where(rsel, sk[d], p_k)
                    p_a = jnp.where(rsel, sa[d], p_a)
                    p_b = jnp.where(rsel, sb[d], p_b)
                    p_m = jnp.where(rsel, sm[d], p_m)
                    p_w = jnp.where(rsel, sw[d], p_w)
                dd = jnp.arange(s_cap, dtype=jnp.int32)[:, None]
                wsel = push[None, :] & (sp[None, :] == dd)
                sk = jnp.where(wsel, 1, sk)
                sa = jnp.where(wsel, ia[None, :], sa)
                sb = jnp.where(wsel, ib[None, :], sb)
                sm = jnp.where(wsel, resume_mask[None, :], sm)
                sw = jnp.where(wsel, iw[None, :], sw)
                sp = sp + push.astype(jnp.int32) - pop.astype(jnp.int32)
                kind = jnp.where(
                    cont, 2, jnp.where(descend, n_kind, jnp.where(pop, p_k, 0))
                )
                ia = jnp.where(
                    cont,
                    ia + k_slots,
                    jnp.where(descend, n_a, jnp.where(pop, p_a, 0)),
                )
                ib = jnp.where(
                    cont,
                    ib - k_slots,
                    jnp.where(descend, n_b, jnp.where(pop, p_b, 0)),
                )
                im = jnp.where(
                    cont, 0, jnp.where(descend, 0, jnp.where(pop, p_m, 0))
                )
                iw = jnp.where(
                    cont, iw, jnp.where(descend, cw, jnp.where(pop, p_w, 0.0))
                )
                kind = jnp.where(overflow, 0, kind)
                bad = bad | overflow
                nrows = nrows + jnp.where(act, k_slots, 0)
            lists = lax.dynamic_update_slice(
                lists,
                jnp.stack(step_rows, axis=0),
                (k_slots + it * unroll * k_slots, jnp.int32(0)),
            )
            return (it + 1, kind, ia, ib, im, iw, sp, sk, sa, sb, sm, sw,
                    lists, nrows, bad)

        zi = jnp.zeros((s_cap, ta_blk), jnp.int32)
        carry0 = (
            jnp.int32(0), kind0, ia0, ib0, im0, iw0,
            jnp.zeros((ta_blk,), jnp.int32), zi, zi, zi, zi,
            jnp.zeros((s_cap, ta_blk), jnp.float32),
            lists0, nrows0, jnp.zeros((ta_blk,), bool),
        )
        out = lax.while_loop(cond, body, carry0)
        kind_end, lists_b, nrows_b, bad_b = out[1], out[12], out[13], out[14]
        return lists_b, nrows_b, bad_b | (kind_end > 0)

    def walk_block(b, carry):
        acc_all, bad_all = carry
        t0 = b * ta_blk
        blo = lax.dynamic_slice(bbox_lo_d, (t0, 0), (ta_blk, 3))
        bhi = lax.dynamic_slice(bbox_hi_d, (t0, 0), (ta_blk, 3))
        if use_octet:
            lists_b, visits_b, bad_b = phase_a_octet(t0, blo, bhi)
        else:
            lists_b, visits_b, bad_b = phase_a_skip(t0, blo, bhi)
        bad_all = lax.dynamic_update_slice(bad_all, bad_b, (t0,))

        # ---- fused evaluation of this block's lists ----
        # The block's lists never leave this loop iteration — no global
        # (r_cap, t_cap) array exists at any point (it OOM'd HBM at N=4M).
        # Within the block, tiles are sorted by descending list length so
        # each t_blk sub-block chunks only to its own max.
        ord_b = jnp.argsort(-visits_b).astype(jnp.int32)
        lists_bs = jnp.take(lists_b, ord_b, axis=1)
        visits_bs = jnp.take(visits_b, ord_b)
        tiles_bs = jnp.take(
            lax.dynamic_slice(tiles_d, (t0, 0, 0), (ta_blk, g, 3)), ord_b, axis=0
        )
        gid_bs = jnp.take(
            lax.dynamic_slice(gid_d, (t0, 0), (ta_blk, g)), ord_b, axis=0
        )

        def sub_block(sb, acc_sorted_blk):
            if _DEBUG_SKIP_EVAL:  # profiling-only: traversal cost alone
                return acc_sorted_blk + jnp.float32(1e-30) * jnp.sum(
                    lists_bs
                ).astype(jnp.float32)
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
                ).T  # (TB, C) combined row ids
                raw = jnp.take(
                    comb_i32, idx_c.reshape(-1), axis=0
                ).reshape(t_blk, chunk, 8)
                rows = lax.bitcast_convert_type(raw[:, :, :4], jnp.float32)
                jcol = raw[:, :, 7]
                # ONE uniform point-mass pass (tree.wgsl:66-67): node rows
                # and member rows are both (pos, mass) points; self pairs
                # (member row index == receiver gid) are excluded exactly
                # like the naive kernel's i == index skip (naive.wgsl:
                # 30-32); the sentinel row's zero mass contributes zero.
                dx = rows[:, None, :, 0] - px  # (TB, G, C)
                dy = rows[:, None, :, 1] - py
                dz = rows[:, None, :, 2] - pz
                r2 = dx * dx + dy * dy + dz * dz
                is_self = jcol[:, None, :] == blk_gid[:, :, None]
                r2s = jnp.where(is_self, 1.0, r2)
                inv_r = lax.rsqrt(r2s)
                r = r2s * inv_r
                w = rows[:, None, :, 3] * gdt * inv_r / (r2s * r + e)
                w = jnp.where(is_self, 0.0, w)
                ax = jnp.sum(w * dx, axis=2)
                ay = jnp.sum(w * dy, axis=2)
                az = jnp.sum(w * dz, axis=2)
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

    acc_tiles_d, tile_bad_d = lax.fori_loop(
        0,
        t_cap // ta_blk,
        walk_block,
        (
            jnp.zeros((t_cap, g, 3), jnp.float32),
            jnp.zeros((t_cap,), bool),
        ),
    )
    # back to Morton tile order
    acc_tiles = jnp.take(acc_tiles_d, inv_order, axis=0)
    tile_bad = jnp.take(tile_bad_d, inv_order)

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
