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
           member rows per step. Descent uses a bounded per-lane stack
           of items updated with select chains, with CANDIDATE CACHING:
           each open step extracts the node's first TWO unprocessed
           open/member children; a descend pushes candidate #2 as a
           direct item (popping it needs no parent re-gather), and a
           parent-resume entry (processed-children mask) is pushed
           underneath only when a third candidate remains. Measured
           3.7x fewer lockstep steps than the skip-pointer engine at
           N=1M disc (host sim: 7.7k vs 29k), and caching cut another
           17-19% (tools/walk_sim.py).

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
from wgpu_n_body_tpu.ops.tree_build import NO_CHILD, WIDTH, TreeArrays
from wgpu_n_body_tpu.ops.tree_walk import tree_forces
from wgpu_n_body_tpu.params import SimParams, TreeParams


class GroupWalkStats(NamedTuple):
    deferred: jax.Array  # () int32: particles sent down the fallback walk


# Internal instrumentation: when True, phase B evaluation is skipped
# (forces come out zero) so profiling scripts can attribute walk time to
# traversal vs evaluation. Never set in production paths.
_DEBUG_SKIP_EVAL = False

# Internal instrumentation: when True, phase B performs its row gathers
# but replaces the pair-point force math with a trivial reduction
# (forces are garbage) — isolates gather+loop cost from VPU eval cost.
_DEBUG_EVAL_GATHER_ONLY = False

# Testing hook: the two-pass straggler scheduler (early pass-1 stop +
# compacted wide-emission re-walk) normally runs only on TPU — the second
# phase-A instantiation doubles the painful LLVM (XLA CPU) compile. Tests
# set this True to exercise the pass-2 path (incl. its wider k_slots) on
# the CPU backend.
_FORCE_TWO_PASS = False

# TPU octet-engine while-body unroll (gathers per while iteration); 8
# measured best (see comment at use site). Module-level for experiments.
_OCTET_UNROLL = 8

# Pass-1 blocks stop once fewer than ta_blk/_ACT_FLOOR_DIV lanes remain
# active (see act_floor1 at the use site). Pass-2 width scales with the
# floor, so unlike the pre-resize 1/8 cliff (CLAUDE.md) this is a safe
# knob — swept on v5e 2026-08-18 at N=2M theta=0.5 disc: div 8: 1.250 s,
# 16: 1.221, 32: 1.214 (flat within same-session noise; 16 kept).
# Module-level for experiments.
_ACT_FLOOR_DIV = 16

# Fallback batch tiers: deferral counts <= _FB_SMALL_CAP walk one
# compacted batch (the common couple-of-dense-tiles case); anything
# larger runs the chunked while loop in batches of max(2x this, n/16).
# Module-level so tests can shrink the tiers and exercise the chunked
# path on tiny scenes.
_FB_SMALL_CAP = 4096

# Internal instrumentation: when True, eval_block skips the per-lane
# compaction sort and evaluates over the raw emitted slots (forces stay
# EXACT — sentinel rows contribute zero — but eval scans ~1.8x rows).
# Isolates the sort's cost vs its eval saving on the real chip.
_DEBUG_SKIP_COMPACT = False

# Internal instrumentation: when True, each octet-walk step issues a
# SECOND dependent gather of the octet table (at the first-child pointer
# of the row just fetched) and folds its value into the traversal chain
# at 1e-30 scale (numerically a no-op, but un-DCE-able and serialized).
# The step-time delta vs baseline = the marginal per-step hop cost on the
# real workload — the only trustworthy gather instrument on this tunnel
# (standalone microbenches contradict in-step sweeps; CLAUDE.md).
_DEBUG_EXTRA_GATHER = False

# Internal instrumentation: when True, each octet-walk step's row gather
# fetches 2*TA rows in ONE launch (the real pointers plus a second,
# equally data-dependent index vector) and folds the extra half into the
# chain at 1e-30 scale. Prices the marginal cost of DOUBLED gather rows
# per launch — the gating question for a 2-items-per-step engine (pop two
# independent stack items per lane per step: halves lockstep steps IFF a
# 2x-row launch costs like a 1x one). Compare against baseline and
# _DEBUG_EXTRA_GATHER (the serialized-second-launch alternative).
_DEBUG_DOUBLE_GATHER = False

# Internal instrumentation: when True, phase A's per-step emission writes
# go through a TRUE per-element scatter (data-dependent 2-D indices) at
# the SAME positions the dynamic_update_slice would use — forces stay
# bit-exact; only the write PATTERN changes. Prices the write side of a
# padding-free compact-emission engine (per-lane row cursor => lane-
# indexed scatter into the carried lists array; VERDICT r3 next #3): the
# step-time delta vs baseline is the scatter tax that a compact emitter
# would pay every step, to weigh against the ~214 ms compaction sort +
# the ~1.8x padded row budget it would remove (N=2M theta=0.5 numbers).
_DEBUG_CURSOR_EMIT = False

# Internal instrumentation: when True, the straggler pass (phase-A pass 2
# + its eval) is skipped entirely AND straggler tiles' bad flags are
# cleared (their forces are simply wrong/partial) so profiling scripts
# can attribute walk time to pass 1 vs the straggler restart without
# mass-deferring the stragglers into the per-particle fallback (which is
# the known 16x cliff and can wedge the tunneled worker). Never set in
# production paths.
_DEBUG_SKIP_PASS2 = False

# Internal instrumentation: when True, phase B skips force evaluation and
# instead reports, through the returned (B, 3) acc array, the
# post-compaction list-adjacency statistic that prices the r3 stretch
# lever "phase-B consecutive-entry row packing" (VERDICT r3 #8) BEFORE
# building it. Per lane (written on tile slot 0, so summing the returned
# acc over axis 0 yields totals):
#   col 0  real rows after compaction (== visits)
#   col 1  aligned merge pairs: comb rows 2t and 2t+1 both present — the
#          rows a (T/2, 16)-paired comb table would fuse into one gather
#          row; new row count = col0 - col1
#   col 2  any-adjacency pairs (id, id+1 both present, no alignment) —
#          upper bound for a slice_sizes=(2,8) gather variant
# Decision law (CLAUDE.md measured gather costs): 16-col rows cost 1.52x
# an 8-col row, so the packed gather wins only if col1/col0 > 0.342; the
# eval VPU work per row doubles, so dummy halves on unmerged rows eat the
# win unless col1/col0 >= ~0.5 (the quad-row wash, PERF.md r2).
_DEBUG_MERGE_STAT = False


def _tile_assignment(keys, n, depth, g_tile, ta_blk_max=2048):
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
    # eval sub-block width: each sub-block evaluates ALL its tiles to the
    # sub-block's max list length, so narrower sub-blocks (after the
    # visit-count sort) waste fewer padded rows on the light tiles. Swept
    # on v5e 2026-08: 256 -> 32 is -37% full step at N=100k disc, -4-5%
    # at N=1-2M, neutral at N=4M; 16 gained nothing further. Launch
    # overhead of the extra sub-block iterations stays negligible because
    # each iteration still gathers t_blk*chunk >= 16k rows.
    t_blk = min(32, t_cap)
    t_cap = -(-t_cap // t_blk) * t_blk
    # phase-A traversal block: tiles are grouped by DENSITY (lstar), so a
    # block's lockstep iteration count is the max over similar tiles
    ta_blk = min(ta_blk_max, t_cap)
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
    imports=None,
) -> tuple[jax.Array, GroupWalkStats]:
    """Returns ((B,3) acc*dt, stats).

    pos_new:  (B, 3) post-drift receiver positions, a contiguous slice of
              the sorted order (B == N single-chip; a shard otherwise).
    src_pos:  (N, 3) pre-step source positions, FULL sorted order (member
              rows read these — the reference's src buffer).
    src_mass: (N,) sorted masses.
    keys:     Morton keys of the receivers (same slice as pos_new).
    gid_offset: global sorted index of receiver row 0 (shard offset).
    imports:  optional ops.import_octets.ImportSet — a LET import forest
              fused INTO this walk (octet engine only): its roots ride
              each lane's traversal stack as extra seeds, its octet/pts
              tables are appended to the local ones, and its member
              payloads live at rows [part_base, part_base + cap_forest)
              of the CALLER-CONCATENATED src_pos/src_mass. One walk then
              covers local + remote gravity — the group machinery's
              fixed budgets are paid once instead of twice (the split
              walk's measured 0.33 s overhead, PERF.md).
    """
    n = pos_new.shape[0]  # receivers
    n_src = src_pos.shape[0]
    cap = tree.nodes_f32.shape[0] - 1
    if imports is not None and tree.octets is None:
        raise ValueError("imports fusion requires the octet engine")
    g = tree_params.effective_walk_tile(n)
    l_cap = tree_params.walk_list_cap
    theta = tree_params.theta
    gdt = params.g * params.dt
    depth = tree_params.max_depth
    e = params.e

    tile_id_raw, lstar, t_cap, t_blk, ta_blk = _tile_assignment(
        keys, n, depth, g, tree_params.walk_block
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
    # Skip engine: node k's point-mass row IS row k; row `cap` is the
    # sentinel. Octet engine: node rows come from the build's child-
    # indexed octet_pts (entry slot*cap_oct + ptr for singles, sibling-pair
    # rows behind them; root and sentinel follow).
    # Either way phase A emits row ids straight into the lists and phase
    # B is one uniform gather + point-mass pass, with the sentinel (zero
    # mass, far cog) contributing exactly zero.
    node_bits = lax.bitcast_convert_type(tree.nodes_f32, jnp.int32)
    if tree.octets is not None:
        # Octet engine: ALL comb rows are TWO-point rows
        # [x1 y1 z1 m1 x2 y2 z2 m2]. Member entries reference PAIR rows
        # (pair j = sorted particles 2j, 2j+1), so each emission slot
        # carries two members; left-/right-only variants (the other point
        # a massless far dummy) cover odd run boundaries, and gids are
        # arithmetic in the row index — no index columns anywhere.
        cap_oct = tree.octets.shape[0]
        spair_base = cap_oct * 8  # sibling-pair node rows (build-emitted)
        if imports is not None:
            cap_imp = imports.octets.shape[0]
            n_ir = imports.roots.shape[0]
            imp_base = cap_oct * 12  # import pts sections follow local's
        else:
            cap_imp = 0
            n_ir = 0
            imp_base = 0
        cap_tot = cap_oct + cap_imp
        root_pt = cap_oct * 12 + cap_imp * 12
        imp_root_base = root_pt + 1
        sent = root_pt + 1 + n_ir
        pair_base = sent + 1
        n_pairs = (n_src + 1) // 2
        member_base = 0  # unused by the octet engine
        far_pt = jnp.concatenate(
            [
                jnp.full((1, 1), 1e15, jnp.float32),
                jnp.zeros((1, 3), jnp.float32),
            ],
            axis=1,
        )
        # Assemble (n_pairs, 8) from stride-2 column slices, NOT via
        # p4.reshape(n_pairs, 8): the reshape forces XLA to materialize
        # the (n, 4) operand row-major-tiled, padding the 4-wide rows to
        # 128 lanes — a 32x-expanded HLO temp (11.4 GB at N=24M; the
        # single-chip OOM wall) plus a 16x-padded reshape output.
        if n_pairs * 2 > n_src:
            src_pos_e = jnp.concatenate([src_pos, far_pt[:, :3]], axis=0)
            src_mass_e = jnp.concatenate([src_mass, far_pt[0, 3:4]], axis=0)
        else:
            src_pos_e, src_mass_e = src_pos, src_mass
        pa, pb = src_pos_e[0::2], src_pos_e[1::2]
        ma, mb = src_mass_e[0::2, None], src_mass_e[1::2, None]
        far_col = jnp.broadcast_to(far_pt, (n_pairs, 4))
        pair_rows = jnp.concatenate(
            [
                jnp.concatenate([pa, ma, pb, mb], axis=1),
                jnp.concatenate([pa, ma, far_col], axis=1),  # keep 2j
                jnp.concatenate([far_col, pb, mb], axis=1),  # keep 2j+1
            ],
            axis=0,
        )
        if imports is None:
            comb_i32 = jnp.concatenate(
                [
                    tree.octet_pts,
                    lax.bitcast_convert_type(pair_rows, jnp.int32),
                ],
                axis=0,
            )
        else:
            # Fused layout: [local pts sections | import pts sections |
            # local root | P import roots | sentinel | member pairs].
            # Root/sentinel rows are re-synthesized (element reads — the
            # build's layout lesson) instead of slicing octet_pts' tail.
            far_bits_i = lax.bitcast_convert_type(
                jnp.float32(1e15), jnp.int32
            )
            far_tail1 = jnp.concatenate(
                [
                    jnp.full((1, 1), far_bits_i, jnp.int32),
                    jnp.zeros((1, 3), jnp.int32),
                ],
                axis=1,
            )
            root_bits = lax.bitcast_convert_type(
                jnp.stack([tree.nodes_f32[:, c][0] for c in range(4)])[
                    None, :
                ],
                jnp.int32,
            )
            root_comb = jnp.concatenate([root_bits, far_tail1], axis=1)
            sent_comb = jnp.concatenate([far_tail1, far_tail1], axis=1)
            iroot_nodes = jnp.take(
                imports.forest.nodes_f32, imports.roots, axis=0
            )  # (P, 8)
            iroot_comb = jnp.concatenate(
                [
                    lax.bitcast_convert_type(
                        iroot_nodes[:, 0:4], jnp.int32
                    ),
                    jnp.broadcast_to(far_tail1, (n_ir, 4)),
                ],
                axis=1,
            )
            comb_i32 = jnp.concatenate(
                [
                    tree.octet_pts[: cap_oct * 12],
                    imports.pts,
                    root_comb,
                    iroot_comb,
                    sent_comb,
                    lax.bitcast_convert_type(pair_rows, jnp.int32),
                ],
                axis=0,
            )
    else:
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
        node_rows = jnp.concatenate(
            [node_bits[:, :7], jnp.full((cap + 1, 1), -1, jnp.int32)], axis=1
        )
        sent = cap
        member_base = cap + 1
        comb_i32 = jnp.concatenate([node_rows, part_rows], axis=0)

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
    # Octet emission slots per step: 4, every slot a TWO-point row —
    # member slots carry member-PAIR rows and theta-accepted sibling
    # pairs share one build-emitted pair row (see phase_a_octet), so a
    # slot streams up to two entities and 8 accepted children always
    # fit. Phase B is ~half gather, ~half padded VPU lanes: ROWS are the
    # cost, so two-entity rows halve it. Wider emission was measured
    # (2026-08, k2=16 + 2x rows): the heaviest tiles are LIST-CAPACITY
    # bound, so wide slots mostly burn row budget on sentinel padding —
    # at N=2M theta=0.5 the budget exhausted and mass-deferred to the
    # per-particle fallback (the 16x-cliff CLAUDE.md warns about).
    # Narrower k trades phase-B rows for phase-A steps (host sim k=2:
    # rows -27%, steps +52% — a net loss at ~30 us/step). Keep k=4 in
    # pass 1; the straggler pass gets a bigger ROW budget
    # (TreeParams.walk_straggler_budget) and optionally wider slots
    # (walk_straggler_slots) — with eval-side compaction the padding
    # from wide slots costs row budget only, not phase-B time.
    k_slots = 4
    k_slots2 = tree_params.walk_straggler_slots if use_octet else 4
    if use_octet:
        # The octet body is ~450 elementwise ops per step: unrolling 8
        # steps amortizes TPU while-iteration overhead, but LLVM (the XLA
        # *CPU* backend) takes >9 min on the 8x body — tests and the
        # multichip dryrun run on CPU, so unroll shallow there.
        unroll = _OCTET_UNROLL if jax.default_backend() == "tpu" else 1
        r_cap = -(-(2 * l_cap) // 256) * 256
        # initial emission rows: the local root plus (fused LET) one row
        # per import root, rounded up to the slot stride
        init_rows1 = -(-(1 + n_ir) // k_slots) * k_slots
        init_rows2 = -(-(1 + n_ir) // k_slots2) * k_slots2
        iter_cap = (r_cap - init_rows1) // (unroll * k_slots)
        # straggler-pass row budget: the pass is narrow (n2 tiles), so a
        # bigger lists array is cheap memory-wise; the eval cost of the
        # extra rows is the real trade (see TreeParams docstring)
        r_cap2 = tree_params.walk_straggler_budget * r_cap
        iter_cap2 = (r_cap2 - init_rows2) // (unroll * k_slots2)
    else:
        unroll = 16
        # rows: multiple of 256 so the eval chunk (256 or 512, see below)
        # always divides it and unroll (16) always divides the chunk
        r_cap = -(-(2 * l_cap) // 256) * 256
        iter_cap = r_cap // unroll
        r_cap2 = r_cap
        iter_cap2 = iter_cap

    # Eval chunk: each eval_body iteration has fixed cost (launch +
    # slice overhead) on top of its gather+VPU volume, so bigger chunks
    # amortize it, while sub-block lists round up to chunk granularity
    # (the extra padding is sentinel rows). Swept on v5e with the 32-tile
    # sub-blocks (2026-08): 256 beats 512 by ~1.3% and 128 by ~1.3% at
    # N=2M theta=0.5 (512 was best back when sub-blocks were 256 tiles
    # and padding dominated). Must divide r_cap (the clamped
    # dynamic_slice would otherwise re-read real rows and double-count);
    # r_cap is always a multiple of 256.
    chunk = min(256, r_cap)
    if r_cap % chunk or t_cap % t_blk or ta_blk % t_blk:
        raise ValueError(
            f"internal tiling mismatch: walk_list_cap={l_cap} -> r_cap="
            f"{r_cap}, chunk={chunk}, t_cap={t_cap}, t_blk={t_blk}, "
            f"ta_blk={ta_blk}"
        )

    def phase_a_skip(blo, bhi, active0, width, budget, act_floor):
        """Skip-pointer engine: one node visit per lockstep step.

        Stops once fewer than ``act_floor`` lanes remain active (the
        stragglers restart from scratch in the narrow second pass) or
        the iteration ``budget`` runs out.
        """
        cur0 = jnp.where(active0, 0, tree.num_nodes).astype(jnp.int32)

        def cond(carry):
            it, cur, _, _, _ = carry
            n_act = jnp.sum((cur < tree.num_nodes).astype(jnp.int32))
            return (it < budget) & (n_act > act_floor)

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

        lists_b0 = jnp.full((r_cap, width), cap, jnp.int32)
        visits_b0 = jnp.zeros((width,), jnp.int32)
        koff_b0 = jnp.zeros((width,), jnp.int32)
        _, cur_b, _, lists_b, visits_b = lax.while_loop(
            cond, body, (jnp.int32(0), cur0, koff_b0, lists_b0, visits_b0)
        )
        return lists_b, visits_b, cur_b < tree.num_nodes

    def phase_a_octet(
        blo, bhi, active0, width, budget, act_floor, k_slots, rows_cap
    ):
        """Octet engine: one *opened* node (8 child tests) per step.

        Per-lane item registers: kind (0 idle / 1 open / 2 members);
        OPEN items carry (ia=octet row, ib=first particle, ic=count,
        im=processed-children bitmask, iw=cell width, ix/iy/iz=cell
        center); MEMBERS items reuse (ia=absolute member index,
        ib=members left). Child geometry decodes from the packed octet
        columns: cell center = parent center +- w/4 by the stored octant
        digit, cog = the 9-bit cell-relative quantization, with the
        theta test inflated by the sqrt(3)/1024 dequantization bound so
        acceptance stays conservative. The resume stack holds AT MOST
        TWO items per level of the current path: a descend pushes the
        node's *second* candidate child directly (a fresh item — the pop
        installs it with no parent re-gather) plus, when three or more
        candidates remain, one classic parent-resume entry whose mask
        covers both consumed candidates. Candidate caching removes the
        1-revisit-per-node floor of the single-push design: host sim
        (tools/walk_sim.py) measured ~34% of lockstep steps were parent
        revisits, and caching cut lockstep steps 17-19% (disc theta=0.5
        / uniform theta=0.75) for a stack-depth rise of only ~1.5x
        (8 -> 12 entries at N=65k). S = 2*(max_depth + 2) is the HARD
        bound (a descend pushes at most 2 entries per level of the
        current path: candidate #2 + parent-resume), so overflow —
        which defers the lane to the exact fallback — can only fire on
        paths deeper than max_depth, i.e. never. The extra stack rows
        over the old empirical 1.5*(depth+4) cost < 1 MB per block.
        """
        # Fused LET imports (ops/import_octets.py) add one stack seed
        # per import-forest root (bottom of the stack, walked after the
        # local tree drains) and one potential initial emission row
        # each; S grows by n_ir. Import items are recognized by octet
        # row >= cap_oct and use the identity-mapped import table:
        # child octet row = parent row + off[c] instead of fc+popcount.
        s_cap = 2 * (depth + 2) + n_ir
        octets = octets_cat
        q_scale = jnp.float32(1.0 / 512.0)
        accf = jnp.float32(1.0 + 0.002 * theta)
        # root classification (vector over lanes, outside the loop): the
        # root is the only node that is nobody's octet child.
        # Root row/first/count are read from the HOISTED copies computed
        # before the block loop, NOT tree.nodes_f32[0] here: this code
        # traces inside walk_block's fori_loop, and slicing the arena
        # in-loop makes XLA carry the WHOLE (cap+1, 8) f32 arena through
        # the loop in a row-major layout whose 8-wide rows pad to 128
        # lanes — a 16x-expanded 7.6 GB carry at N=32M.
        r_row = root_row_f32
        rdx = jnp.maximum(jnp.maximum(blo[:, 0] - r_row[0], r_row[0] - bhi[:, 0]), 0.0)
        rdy = jnp.maximum(jnp.maximum(blo[:, 1] - r_row[1], r_row[1] - bhi[:, 1]), 0.0)
        rdz = jnp.maximum(jnp.maximum(blo[:, 2] - r_row[2], r_row[2] - bhi[:, 2]), 0.0)
        r_acc = r_row[WIDTH] < theta * jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
        r_term = r_row[NO_CHILD] > 0.0
        kind0 = jnp.where(
            active0, jnp.where(r_acc, 0, jnp.where(r_term, 2, 1)), 0
        ).astype(jnp.int32)
        ia0 = jnp.where(kind0 == 2, root_first, 0)
        ib0 = jnp.where(kind0 == 2, root_count, root_first)
        ic0 = jnp.broadcast_to(root_count, (width,))
        im0 = jnp.zeros((width,), jnp.int32)
        iw0 = jnp.broadcast_to(r_row[WIDTH], (width,))
        zf0 = jnp.zeros((width,), jnp.float32)  # root cell center: origin
        init_rows = -(-(1 + n_ir) // k_slots) * k_slots
        init_list = [jnp.where(active0 & r_acc, root_pt, sent)]
        szi = jnp.zeros((s_cap, width), jnp.int32)
        szf = jnp.zeros((s_cap, width), jnp.float32)
        sp0 = jnp.zeros((width,), jnp.int32)
        sk0 = sa0 = sb0 = sc0 = sm0 = szi
        sw0 = sx0 = sy0 = sz0 = szf
        if imports is not None:
            # Classify and seed each import root per lane: theta-accepted
            # roots emit their comb row up front; open/member roots push
            # compacted stack entries (dead entries are never pushed — a
            # popped kind-0 entry would strand the lane idle forever).
            # Import roots are the source chips' level-0 cells: center
            # origin, width = the shared global root width.
            dd0 = jnp.arange(s_cap, dtype=jnp.int32)[:, None]
            for b_ir in range(n_ir):
                bx = iroot_vals[:, 0][b_ir]
                by = iroot_vals[:, 1][b_ir]
                bz = iroot_vals[:, 2][b_ir]
                bw = iroot_vals[:, WIDTH][b_ir]
                bnc = iroot_vals[:, NO_CHILD][b_ir]
                dxb = jnp.maximum(
                    jnp.maximum(blo[:, 0] - bx, bx - bhi[:, 0]), 0.0
                )
                dyb = jnp.maximum(
                    jnp.maximum(blo[:, 1] - by, by - bhi[:, 1]), 0.0
                )
                dzb = jnp.maximum(
                    jnp.maximum(blo[:, 2] - bz, bz - bhi[:, 2]), 0.0
                )
                dmin_b = jnp.sqrt(dxb * dxb + dyb * dyb + dzb * dzb)
                acc_b = bw < theta * dmin_b
                alive_b = active0 & iroot_has[b_ir]
                k_b = jnp.where(
                    alive_b,
                    jnp.where(
                        acc_b, 0, jnp.where(bnc > 0.0, 2, 1)
                    ),
                    0,
                ).astype(jnp.int32)
                init_list.append(
                    jnp.where(alive_b & acc_b, imp_root_base + b_ir, sent)
                )
                want = k_b > 0
                a_b = jnp.where(k_b == 1, iroot_ptr[b_ir], iroot_first[b_ir])
                bb_b = jnp.where(
                    k_b == 1, iroot_first[b_ir], iroot_count[b_ir]
                )
                wsel0 = want[None, :] & (dd0 == sp0[None, :])
                sk0 = jnp.where(wsel0, k_b[None, :], sk0)
                sa0 = jnp.where(wsel0, a_b[None, :], sa0)
                sb0 = jnp.where(wsel0, bb_b[None, :], sb0)
                sc0 = jnp.where(wsel0, iroot_ext[b_ir], sc0)
                sw0 = jnp.where(wsel0, bw, sw0)
                sp0 = sp0 + want.astype(jnp.int32)
        lists0 = jnp.full((rows_cap, width), sent, jnp.int32)
        lists0 = lax.dynamic_update_slice(
            lists0, jnp.stack(init_list, axis=0), (0, jnp.int32(0))
        )
        nrows0 = jnp.where(active0, init_rows, 0)

        def cond(carry):
            it, kind = carry[0], carry[1]
            n_act = jnp.sum((kind > 0).astype(jnp.int32))
            return (it < budget) & (n_act > act_floor)

        def body(carry):
            # ELEMENTWISE select chains on purpose: cross-slot reductions
            # (cumsum/argmax/axis sums) each become their own TPU kernel
            # inside the while body, and the resulting launch storm
            # measured ~100 us/step; this form fuses into a few kernels.
            (it, kind, ia, ib, ic, im, iw, ix, iy, iz, sp,
             sk, sa, sb, sc, sm, sw, sx, sy, sz, lists, nrows, bad) = carry
            step_rows = []
            for _ in range(unroll):
                is_open = kind == 1
                is_mem = kind == 2
                act = kind > 0
                ptr = jnp.clip(jnp.where(is_open, ia, 0), 0, cap_tot - 1)
                if _DEBUG_DOUBLE_GATHER:
                    # one launch, 2x rows; the second half's indices ride
                    # the same dependency chain (derived from ptr) so the
                    # launch cannot start earlier than the real one would
                    ptr2 = jnp.clip(ptr * 2 + 1, 0, cap_tot - 1)
                    raw2 = jnp.take(
                        octets, jnp.concatenate([ptr, ptr2]), axis=0
                    )  # (2*TA, 17) int32
                    raw = raw2[:width]
                    ix = ix + jnp.float32(1e-30) * (
                        raw2[width:, 0].astype(jnp.float32)
                    )
                else:
                    raw = jnp.take(octets, ptr, axis=0)  # (TA, 17) int32
                if _DEBUG_EXTRA_GATHER:
                    # second dependent hop at the fetched first-child
                    # pointer; 1e-30*value folded into the traversal
                    # chain is numerically exact (product ~1e-21 rounds
                    # away against O(1) cell centers) but un-DCE-able,
                    # so the hop serializes like a real table access
                    ptr2 = jnp.clip(raw[:, 16], 0, cap_tot - 1)
                    raw2 = jnp.take(octets, ptr2, axis=0)
                    ix = ix + jnp.float32(1e-30) * (
                        raw2[:, 0].astype(jnp.float32)
                    )
                # fused-LET import items: octet rows past the local table
                is_imp_it = (ia >= cap_oct) if imports is not None else None
                cw = iw * 0.5
                hq = iw * 0.25
                cell_q = cw * q_scale
                col0 = [raw[:, c] for c in range(8)]
                off = [raw[:, 8 + c] for c in range(8)]
                exists = [c0 < 0 for c0 in col0]
                # BFS-ranked table: internal children are contiguous
                # rows, child c's octet row = fc + #(internal slots < c)
                fc = raw[:, 16]
                int_pref = []
                run_int = jnp.zeros((width,), jnp.int32)
                for c in range(8):
                    int_pref.append(run_int)
                    run_int = run_int + (
                        exists[c] & (((col0[c] >> 30) & 1) == 0)
                    ).astype(jnp.int32)
                # children are slot-compact (absent only at the tail), so
                # the next offset is the next slot's, or parent count last
                off_next = [None] * 8
                off_next[7] = ic
                for c in range(6, -1, -1):
                    off_next[c] = jnp.where(exists[c + 1], off[c + 1], ic)
                cterm, cacc, cmem_l, copen_l, emit_l = [], [], [], [], []
                ccx, ccy, ccz, cfirst = [], [], [], []
                for c in range(8):
                    c0 = col0[c]
                    term_c = ((c0 >> 30) & 1) == 1
                    digit = (c0 >> 27) & 7
                    qx = (c0 & 511).astype(jnp.float32)
                    qy = ((c0 >> 9) & 511).astype(jnp.float32)
                    qz = ((c0 >> 18) & 511).astype(jnp.float32)
                    cx = jnp.where((digit & 1) == 1, ix + hq, ix - hq)
                    cy = jnp.where((digit & 2) == 2, iy + hq, iy - hq)
                    cz = jnp.where((digit & 4) == 4, iz + hq, iz - hq)
                    gx = (cx - hq) + (qx + 0.5) * cell_q
                    gy = (cy - hq) + (qy + 0.5) * cell_q
                    gz = (cz - hq) + (qz + 0.5) * cell_q
                    dx = jnp.maximum(jnp.maximum(blo[:, 0] - gx, gx - bhi[:, 0]), 0.0)
                    dy = jnp.maximum(jnp.maximum(blo[:, 1] - gy, gy - bhi[:, 1]), 0.0)
                    dz = jnp.maximum(jnp.maximum(blo[:, 2] - gz, gz - bhi[:, 2]), 0.0)
                    dmin = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                    ex = exists[c]
                    procd = ((im >> c) & 1) == 1
                    acc_c = ex & (cw * accf < theta * dmin)
                    cterm.append(term_c)
                    cacc.append(acc_c)
                    emit_l.append(acc_c & ~procd)
                    copen_l.append(ex & ~acc_c & ~term_c & ~procd)
                    cmem_l.append(ex & ~acc_c & term_c & ~procd)
                    ccx.append(cx)
                    ccy.append(cy)
                    ccz.append(cz)
                    cfirst.append(ib + off[c])
                # maximal runs of adjacent member children merge into one
                # contiguous particle range (slot order = Morton order)
                run_start = [cmem_l[0]] + [
                    cmem_l[c] & ~cmem_l[c - 1] for c in range(1, 8)
                ]
                run_end = [None] * 8
                run_msk = [None] * 8
                run_end[7] = off_next[7]
                run_msk[7] = jnp.where(cmem_l[7], jnp.int32(128), 0)
                for c in range(6, -1, -1):
                    nxt_in = cmem_l[c + 1]
                    run_end[c] = jnp.where(nxt_in, run_end[c + 1], off_next[c])
                    run_msk[c] = jnp.int32(1 << c) | jnp.where(
                        nxt_in, run_msk[c + 1], 0
                    )
                # accepted-emission prefix (elementwise over the 8 slots);
                # >K accepted spill to a same-node revisit (emission itself
                # happens after candidate selection, so free slots can be
                # filled with members of the chosen run)
                open_lane = act & is_open
                mem_lane = act & is_mem
                # Sibling-pair emission units: when children (2p, 2p+1)
                # are BOTH accepted, ONE pre-built pair row carries them
                # (build rows spair_base + ptr*4 + p), halving phase-B
                # rows for the common both-accepted case. A pair
                # contributes at most one unit, so an open step's
                # accepted children always fit k_slots=4 — acceptance
                # alone can no longer spill.
                both_l = [emit_l[2 * p] & emit_l[2 * p + 1] for p in range(4)]
                unit_l = [
                    emit_l[c] if c % 2 == 0 else emit_l[c] & ~both_l[c // 2]
                    for c in range(8)
                ]
                pos = []
                running_e = jnp.zeros((width,), jnp.int32)
                for c in range(8):
                    pos.append(running_e)
                    running_e = running_e + unit_l[c]
                spill = open_lane & (running_e > k_slots)
                # emitted child c places iff its carrying unit placed
                placed = []
                for c in range(8):
                    if c % 2 == 0:
                        placed.append(unit_l[c] & (pos[c] < k_slots))
                    else:
                        placed.append(
                            (both_l[c // 2] & placed[c - 1])
                            | (unit_l[c] & (pos[c] < k_slots))
                        )
                # next open/member child = lowest candidate slot, via a
                # descending select chain; candidate #2 (second-lowest
                # slot) rides the same chain — each hit shifts the old
                # #1 registers into the #2 registers before overwriting
                n_kind = jnp.zeros((width,), jnp.int32)
                n_a = jnp.zeros((width,), jnp.int32)
                n_b = jnp.zeros((width,), jnp.int32)
                n_c = jnp.zeros((width,), jnp.int32)
                n_bits = jnp.zeros((width,), jnp.int32)
                n_cx = jnp.zeros((width,), jnp.float32)
                n_cy = jnp.zeros((width,), jnp.float32)
                n_cz = jnp.zeros((width,), jnp.float32)
                n2_kind = jnp.zeros((width,), jnp.int32)
                n2_a = jnp.zeros((width,), jnp.int32)
                n2_b = jnp.zeros((width,), jnp.int32)
                n2_c = jnp.zeros((width,), jnp.int32)
                n2_bits = jnp.zeros((width,), jnp.int32)
                n2_cx = jnp.zeros((width,), jnp.float32)
                n2_cy = jnp.zeros((width,), jnp.float32)
                n2_cz = jnp.zeros((width,), jnp.float32)
                any_cand = jnp.zeros((width,), bool)
                n_cand = jnp.zeros((width,), jnp.int32)
                done_bits = jnp.zeros((width,), jnp.int32)
                for c in range(7, -1, -1):
                    sel = copen_l[c] | (cmem_l[c] & run_start[c])
                    opn = copen_l[c]
                    n2_kind = jnp.where(sel, n_kind, n2_kind)
                    n2_a = jnp.where(sel, n_a, n2_a)
                    n2_b = jnp.where(sel, n_b, n2_b)
                    n2_c = jnp.where(sel, n_c, n2_c)
                    n2_bits = jnp.where(sel, n_bits, n2_bits)
                    n2_cx = jnp.where(sel, n_cx, n2_cx)
                    n2_cy = jnp.where(sel, n_cy, n2_cy)
                    n2_cz = jnp.where(sel, n_cz, n2_cz)
                    n_kind = jnp.where(sel, jnp.where(opn, 1, 2), n_kind)
                    # open-child octet row: BFS fc + popcount locally;
                    # identity-mapped parent row + off for import items
                    if imports is not None:
                        chptr = jnp.where(
                            is_imp_it, ia + off[c], fc + int_pref[c]
                        )
                    else:
                        chptr = fc + int_pref[c]
                    n_a = jnp.where(
                        sel,
                        jnp.where(opn, chptr, cfirst[c]),
                        n_a,
                    )
                    n_b = jnp.where(
                        sel,
                        jnp.where(opn, cfirst[c], run_end[c] - off[c]),
                        n_b,
                    )
                    n_c = jnp.where(sel, off_next[c] - off[c], n_c)
                    n_bits = jnp.where(
                        sel, jnp.where(opn, jnp.int32(1 << c), run_msk[c]), n_bits
                    )
                    n_cx = jnp.where(sel, ccx[c], n_cx)
                    n_cy = jnp.where(sel, ccy[c], n_cy)
                    n_cz = jnp.where(sel, ccz[c], n_cz)
                    any_cand = any_cand | sel
                    n_cand = n_cand + sel
                    # processed = absent, previously handled (already in
                    # im), or accepted AND emitted this step; spilled
                    # accepted children stay unprocessed for the revisit
                    done_bits = done_bits | jnp.where(
                        ~exists[c] | placed[c],
                        jnp.int32(1 << c),
                        0,
                    )
                # member drain: an open step's free emission slots carry
                # the leading member PAIRS of the chosen run — most member
                # streaming rides along with traversal for free. A fully
                # drained run turns into a same-node revisit (stay) so the
                # mask machinery picks up the node's next candidate.
                def pair_slot(a, lim, j):
                    # pair j covers sorted particles (2j, 2j+1); clip to
                    # the consumed range [a, lim) via the one-point
                    # variants (regions: both | keep-2j | keep-2j+1)
                    start2 = 2 * j
                    right = start2 < a
                    left = (start2 + 1 >= lim) & ~right
                    reg = jnp.where(
                        right, 2 * n_pairs, jnp.where(left, n_pairs, 0)
                    )
                    return jnp.where(
                        start2 < lim, pair_base + j + reg, sent
                    )

                chose_mem = any_cand & (n_kind == 2)
                n_emit = jnp.minimum(running_e, k_slots)
                drain_cap = jnp.maximum(
                    2 * (k_slots - n_emit) - (n_a & 1), 0
                )
                drained = jnp.where(
                    open_lane & chose_mem & ~spill,
                    jnp.minimum(drain_cap, n_b),
                    0,
                )
                stay_drain = open_lane & (drained > 0) & (drained >= n_b)
                n_a_eff = jnp.where(chose_mem, n_a + drained, n_a)
                n_b_eff = jnp.where(chose_mem, n_b - drained, n_b)
                # member lanes consume up to 2K - parity members per step
                c_mem = jnp.minimum(ib, 2 * k_slots - (ia & 1))
                # emission: accepted children compacted to the front,
                # drained run pairs behind them; member lanes stream pairs
                for k in range(k_slots):
                    v = jnp.full((width,), sent, jnp.int32)
                    for c in range(8):
                        if c % 2 == 0:
                            rid = jnp.where(
                                both_l[c // 2],
                                spair_base + (c // 2) * cap_oct + ia,
                                c * cap_oct + ia,
                            )
                        else:
                            rid = c * cap_oct + ia
                        if imports is not None:
                            ia_rel = ia - cap_oct
                            if c % 2 == 0:
                                rid_i = jnp.where(
                                    both_l[c // 2],
                                    imp_base
                                    + (8 + c // 2) * cap_imp
                                    + ia_rel,
                                    imp_base + c * cap_imp + ia_rel,
                                )
                            else:
                                rid_i = imp_base + c * cap_imp + ia_rel
                            rid = jnp.where(is_imp_it, rid_i, rid)
                        v = jnp.where(unit_l[c] & (pos[c] == k), rid, v)
                    v = jnp.where(
                        (k >= n_emit) & (drained > 0),
                        pair_slot(n_a, n_a + drained, (n_a >> 1) + k - n_emit),
                        v,
                    )
                    row_k = jnp.where(
                        open_lane,
                        v,
                        jnp.where(
                            mem_lane,
                            pair_slot(ia, ia + c_mem, (ia >> 1) + k),
                            sent,
                        ),
                    )
                    step_rows.append(row_k)
                cont = mem_lane & (ib > c_mem)
                descend = open_lane & any_cand & ~spill & ~stay_drain
                # candidate caching: a descend pushes candidate #2 as a
                # DIRECT item (its pop needs no parent re-gather); the
                # parent-resume entry is pushed underneath only when a
                # third candidate remains. A fully-drained chosen run
                # (stay_drain) installs candidate #2 in the same step
                # instead of a stay/revisit — or pops immediately when
                # nothing is left.
                take2 = stay_drain & (n_cand >= 2)
                push_c2 = descend & (n_cand > 1)
                push_par = (descend | take2) & (n_cand > 2)
                pop = (
                    act & ~cont & ~spill & ~descend & ~take2 & (sp > 0)
                )
                npush = push_par.astype(jnp.int32) + push_c2.astype(
                    jnp.int32
                )
                overflow = (sp + npush) > s_cap
                push_par = push_par & ~overflow
                push_c2 = push_c2 & ~overflow
                # recompute from the masked flags so sp stays in
                # [0, s_cap] even on overflowed (deferred) lanes — a
                # stale npush left the carry inconsistent (sp up to 2
                # past s_cap), a trap if such lanes were ever resumed
                npush = push_par.astype(jnp.int32) + push_c2.astype(
                    jnp.int32
                )
                # two-slot stack write (parent at sp, candidate #2 above
                # it) + top read (pop): each write is one fused where
                # pair per register over the (S, TA) stack; the read is
                # an unrolled elementwise select chain
                p_k = jnp.zeros((width,), jnp.int32)
                p_a = jnp.zeros((width,), jnp.int32)
                p_b = jnp.zeros((width,), jnp.int32)
                p_c = jnp.zeros((width,), jnp.int32)
                p_m = jnp.zeros((width,), jnp.int32)
                p_w = jnp.zeros((width,), jnp.float32)
                p_x = jnp.zeros((width,), jnp.float32)
                p_y = jnp.zeros((width,), jnp.float32)
                p_z = jnp.zeros((width,), jnp.float32)
                for d in range(s_cap):
                    rsel = sp == d + 1
                    p_k = jnp.where(rsel, sk[d], p_k)
                    p_a = jnp.where(rsel, sa[d], p_a)
                    p_b = jnp.where(rsel, sb[d], p_b)
                    p_c = jnp.where(rsel, sc[d], p_c)
                    p_m = jnp.where(rsel, sm[d], p_m)
                    p_w = jnp.where(rsel, sw[d], p_w)
                    p_x = jnp.where(rsel, sx[d], p_x)
                    p_y = jnp.where(rsel, sy[d], p_y)
                    p_z = jnp.where(rsel, sz[d], p_z)
                dd = jnp.arange(s_cap, dtype=jnp.int32)[:, None]
                sp_c2 = sp + push_par.astype(jnp.int32)
                wsel_p = push_par[None, :] & (sp[None, :] == dd)
                wsel_2 = push_c2[None, :] & (sp_c2[None, :] == dd)
                # the parent entry is only pushed when candidates #1 AND
                # #2 are both being consumed this step, so its resume
                # mask covers both
                parent_mask = im | done_bits | n_bits | n2_bits
                sk = jnp.where(wsel_p, 1, jnp.where(wsel_2, n2_kind[None, :], sk))
                sa = jnp.where(
                    wsel_p, ia[None, :], jnp.where(wsel_2, n2_a[None, :], sa)
                )
                sb = jnp.where(
                    wsel_p, ib[None, :], jnp.where(wsel_2, n2_b[None, :], sb)
                )
                sc = jnp.where(
                    wsel_p, ic[None, :], jnp.where(wsel_2, n2_c[None, :], sc)
                )
                sm = jnp.where(
                    wsel_p, parent_mask[None, :], jnp.where(wsel_2, 0, sm)
                )
                sw = jnp.where(
                    wsel_p, iw[None, :], jnp.where(wsel_2, cw[None, :], sw)
                )
                sx = jnp.where(
                    wsel_p, ix[None, :], jnp.where(wsel_2, n2_cx[None, :], sx)
                )
                sy = jnp.where(
                    wsel_p, iy[None, :], jnp.where(wsel_2, n2_cy[None, :], sy)
                )
                sz = jnp.where(
                    wsel_p, iz[None, :], jnp.where(wsel_2, n2_cz[None, :], sz)
                )
                sp = sp + npush - pop.astype(jnp.int32)
                keep = cont | spill  # same item continues
                kind = jnp.where(
                    keep,
                    kind,
                    jnp.where(
                        descend,
                        n_kind,
                        jnp.where(take2, n2_kind, jnp.where(pop, p_k, 0)),
                    ),
                )
                ia = jnp.where(
                    keep,
                    jnp.where(cont, ia + c_mem, ia),
                    jnp.where(
                        descend,
                        n_a_eff,
                        jnp.where(take2, n2_a, jnp.where(pop, p_a, 0)),
                    ),
                )
                ib = jnp.where(
                    keep,
                    jnp.where(cont, ib - c_mem, ib),
                    jnp.where(
                        descend,
                        n_b_eff,
                        jnp.where(take2, n2_b, jnp.where(pop, p_b, 0)),
                    ),
                )
                ic = jnp.where(
                    keep,
                    ic,
                    jnp.where(
                        descend,
                        n_c,
                        jnp.where(take2, n2_c, jnp.where(pop, p_c, 0)),
                    ),
                )
                im = jnp.where(
                    keep,
                    jnp.where(cont, 0, im | done_bits),
                    jnp.where(descend | take2, 0, jnp.where(pop, p_m, 0)),
                )
                iw = jnp.where(
                    keep,
                    iw,
                    jnp.where(
                        descend | take2, cw, jnp.where(pop, p_w, 0.0)
                    ),
                )
                ix = jnp.where(
                    keep,
                    ix,
                    jnp.where(
                        descend,
                        n_cx,
                        jnp.where(take2, n2_cx, jnp.where(pop, p_x, 0.0)),
                    ),
                )
                iy = jnp.where(
                    keep,
                    iy,
                    jnp.where(
                        descend,
                        n_cy,
                        jnp.where(take2, n2_cy, jnp.where(pop, p_y, 0.0)),
                    ),
                )
                iz = jnp.where(
                    keep,
                    iz,
                    jnp.where(
                        descend,
                        n_cz,
                        jnp.where(take2, n2_cz, jnp.where(pop, p_z, 0.0)),
                    ),
                )
                kind = jnp.where(overflow, 0, kind)
                bad = bad | overflow
                nrows = nrows + jnp.where(act, k_slots, 0)
            if _DEBUG_CURSOR_EMIT:
                # same destinations, but through a genuine scatter whose
                # row indices XLA cannot prove affine: a float-derived
                # zero (iw*0.0 survives simplification — inf/nan
                # semantics) keeps the per-lane offset data-dependent,
                # exactly like a real compact-emission cursor would be
                rows_blk = jnp.stack(step_rows, axis=0)
                zero_l = (iw * 0.0).astype(jnp.int32)  # (TA,) opaque 0
                ridx = (
                    init_rows
                    + it * unroll * k_slots
                    + jnp.arange(unroll * k_slots, dtype=jnp.int32)[:, None]
                    + zero_l[None, :]
                )
                lidx = jnp.broadcast_to(
                    jnp.arange(width, dtype=jnp.int32)[None, :], ridx.shape
                )
                lists = lists.at[ridx, lidx].set(rows_blk, mode="drop")
            else:
                lists = lax.dynamic_update_slice(
                    lists,
                    jnp.stack(step_rows, axis=0),
                    (init_rows + it * unroll * k_slots, jnp.int32(0)),
                )
            return (it + 1, kind, ia, ib, ic, im, iw, ix, iy, iz, sp,
                    sk, sa, sb, sc, sm, sw, sx, sy, sz, lists, nrows, bad)

        carry0 = (
            jnp.int32(0), kind0, ia0, ib0, ic0, im0, iw0, zf0, zf0, zf0,
            sp0, sk0, sa0, sb0, sc0, sm0,
            sw0, sx0, sy0, sz0,
            lists0, nrows0, jnp.zeros((width,), bool),
        )
        out = lax.while_loop(cond, body, carry0)
        kind_end, lists_b, nrows_b, bad_b = out[1], out[20], out[21], out[22]
        return lists_b, nrows_b, bad_b | (kind_end > 0)

    def eval_block(lists_b, visits_b, tiles_blk, gid_blk, width):
        """Fused evaluation of one phase-A block's lists -> (width, G, 3).

        The block's lists never leave the caller's loop iteration — no
        global (r_cap, t_cap) array exists at any point (it OOM'd HBM at
        N=4M). Within the block, tiles are sorted by descending list
        length so each t_blk sub-block chunks only to its own max.
        """
        # Compact each lane's list before evaluating: row order is
        # irrelevant to the force sum (phase B is a pure accumulation;
        # self-exclusion keys on row VALUES), so one per-lane sort pushes
        # the interleaved sentinel padding (~44% of slots, from the fixed
        # k_slots emission stride) to the tail, and the per-sub-block
        # chunk bound shrinks from emitted SLOTS to REAL rows. Sentinel
        # ids are remapped to INT32_MAX for the sort because real ids
        # exist on both sides of `sent` (member/pair rows sit above it).
        big = jnp.int32(0x7FFFFFFF)
        if not _DEBUG_SKIP_COMPACT:
            lists_b = lax.sort(
                jnp.where(lists_b == sent, big, lists_b),
                dimension=0,
                is_stable=False,
            )
            visits_b = jnp.sum((lists_b != big).astype(jnp.int32), axis=0)
            if _DEBUG_MERGE_STAT:
                # lists_b is sorted ascending per lane with `big` at the
                # tail, so equal-row16 / consecutive ids are adjacent.
                prv = lists_b[:-1, :]
                nxt = lists_b[1:, :]
                adj = (nxt == prv + 1) & (prv != big)
                alig = adj & (prv % 2 == 0)
                stat = jnp.zeros((width, g, 3), jnp.float32)
                stat = stat.at[:, 0, 0].set(visits_b.astype(jnp.float32))
                stat = stat.at[:, 0, 1].set(
                    jnp.sum(alig.astype(jnp.int32), axis=0).astype(jnp.float32)
                )
                stat = stat.at[:, 0, 2].set(
                    jnp.sum(adj.astype(jnp.int32), axis=0).astype(jnp.float32)
                )
                return stat
            lists_b = jnp.where(lists_b == big, sent, lists_b)
        ord_b = jnp.argsort(-visits_b).astype(jnp.int32)
        lists_bs = jnp.take(lists_b, ord_b, axis=1)
        visits_bs = jnp.take(visits_b, ord_b)
        tiles_bs = jnp.take(tiles_blk, ord_b, axis=0)
        gid_bs = jnp.take(gid_blk, ord_b, axis=0)

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
                rows = lax.bitcast_convert_type(
                    raw[:, :, : (8 if use_octet else 4)], jnp.float32
                )
                if _DEBUG_EVAL_GATHER_ONLY:  # profiling-only
                    cheap = jnp.sum(rows, axis=(1, 2)) * jnp.float32(1e-30)
                    return c0 + chunk, acc + cheap[:, None, None]

                # One uniform point-mass formula (tree.wgsl:66-67); self
                # pairs (member == receiver gid) are excluded exactly like
                # the naive kernel's i == index skip (naive.wgsl:30-32);
                # zero-mass far dummies/sentinels contribute exactly zero.
                def point(xc, yc, zc, mc, is_self):
                    dx = xc[:, None, :] - px  # (TB, G, C)
                    dy = yc[:, None, :] - py
                    dz = zc[:, None, :] - pz
                    r2 = dx * dx + dy * dy + dz * dz
                    r2s = jnp.where(is_self, 1.0, r2)
                    inv_r = lax.rsqrt(r2s)
                    r = r2s * inv_r
                    w = mc[:, None, :] * gdt * inv_r / (r2s * r + e)
                    w = jnp.where(is_self, 0.0, w)
                    return (
                        jnp.sum(w * dx, axis=2),
                        jnp.sum(w * dy, axis=2),
                        jnp.sum(w * dz, axis=2),
                    )

                if use_octet:
                    # two-point rows; member gids are arithmetic in the
                    # pair row index (pair j = particles 2j, 2j+1; the
                    # keep-one boundary variants leave the other point a
                    # massless far dummy, so excluding it is a no-op)
                    jj = idx_c - pair_base
                    is_pair = jj >= 0
                    rel = jj - n_pairs * (jj // n_pairs)
                    g1 = 2 * rel
                    s1 = is_pair[:, None, :] & (
                        g1[:, None, :] == blk_gid[:, :, None]
                    )
                    s2 = is_pair[:, None, :] & (
                        (g1 + 1)[:, None, :] == blk_gid[:, :, None]
                    )
                    ax1, ay1, az1 = point(
                        rows[:, :, 0], rows[:, :, 1], rows[:, :, 2],
                        rows[:, :, 3], s1,
                    )
                    ax2, ay2, az2 = point(
                        rows[:, :, 4], rows[:, :, 5], rows[:, :, 6],
                        rows[:, :, 7], s2,
                    )
                    ax, ay, az = ax1 + ax2, ay1 + ay2, az1 + az2
                else:
                    jcol = raw[:, :, 7]
                    is_self = jcol[:, None, :] == blk_gid[:, :, None]
                    ax, ay, az = point(
                        rows[:, :, 0], rows[:, :, 1], rows[:, :, 2],
                        rows[:, :, 3], is_self,
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
            width // t_blk,
            sub_block,
            jnp.zeros((width, g, 3), jnp.float32),
        )
        # unsort within the block
        return jnp.take(
            acc_sorted_blk, jnp.argsort(ord_b).astype(jnp.int32), axis=0
        )

    # Loop-invariant root reads, hoisted OUT of walk_block (see the
    # layout note in phase_a_octet): only these 10 scalars enter the
    # block loop, not the arena / first / count arrays they come from.
    # Element-wise extraction on purpose — tree.nodes_f32[0] slices one
    # logical row from the column-major arena, which XLA implements as a
    # row-major (16x-padded) copy of the whole array.
    root_row_f32 = jnp.stack([tree.nodes_f32[0, c] for c in range(8)])
    root_first = tree.first[0]
    root_count = tree.count[0]
    if use_octet:
        # combined octet table: import rows appended behind the local
        # ones; import off-columns are row offsets so no pointer fixup
        # is needed (child octet row = parent row + off, both already in
        # combined coordinates once the parent's row carries + cap_oct)
        octets_cat = (
            tree.octets
            if imports is None
            else jnp.concatenate([tree.octets, imports.octets], axis=0)
        )
    if imports is not None:
        # loop-invariant import-root reads, hoisted like the local root
        iroot_vals = jnp.take(
            imports.forest.nodes_f32, imports.roots, axis=0
        )  # (P, 8)
        iroot_first = jnp.take(imports.forest.first, imports.roots)
        iroot_count = jnp.take(imports.forest.count, imports.roots)
        iroot_ext = (
            jnp.take(imports.forest.skip, imports.roots) - imports.roots
        )
        iroot_has = imports.extents > 0
        iroot_ptr = cap_oct + imports.roots

    def phase_a(blo, bhi, active0, width, budget, act_floor, k, rows_cap):
        if use_octet:
            return phase_a_octet(
                blo, bhi, active0, width, budget, act_floor, k, rows_cap
            )
        return phase_a_skip(blo, bhi, active0, width, budget, act_floor)
    # Pass-1 blocks stop once <1/16 of lanes remain active: a handful of
    # dense-core tiles otherwise hold a whole 2048-wide block in lockstep
    # (measured 2.6-6x tail waste at N=1M disc). The stragglers restart
    # from scratch, compacted into one narrow block with the full budget.
    # On CPU (tests/dryrun) a single full-budget pass is used instead:
    # the second phase-A instantiation would double the already-painful
    # LLVM compile and the lockstep tail costs nothing off-TPU.
    act_floor1 = (
        ta_blk // _ACT_FLOOR_DIV
        if (jax.default_backend() == "tpu" or _FORCE_TWO_PASS)
        else 0
    )

    def walk_block(b, carry):
        acc_all, bad_all = carry
        t0 = b * ta_blk
        blo = lax.dynamic_slice(bbox_lo_d, (t0, 0), (ta_blk, 3))
        bhi = lax.dynamic_slice(bbox_hi_d, (t0, 0), (ta_blk, 3))
        active0 = lax.dynamic_slice(piece_len_d, (t0,), (ta_blk,)) > 0
        lists_b, visits_b, bad_b = phase_a(
            blo, bhi, active0, ta_blk, iter_cap, act_floor1, k_slots, r_cap
        )
        bad_all = lax.dynamic_update_slice(bad_all, bad_b, (t0,))
        acc_unsorted = eval_block(
            lists_b,
            visits_b,
            lax.dynamic_slice(tiles_d, (t0, 0, 0), (ta_blk, g, 3)),
            lax.dynamic_slice(gid_d, (t0, 0), (ta_blk, g)),
            ta_blk,
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

    # ---- pass 2: straggler tiles, compacted into one narrow block ----
    # Width covers the worst case pass 1 can produce: every block stops
    # at its active floor, leaving <= act_floor1 unfinished lanes each
    # (budget exhaustion can leave more, but those tiles re-fail pass 2
    # anyway). Undersizing this is a CLIFF, not a trim: tiles beyond n2
    # keep their bad flag and mass-defer to the per-particle fallback —
    # at N=4M uniform (24 blocks x floor 128 = 3072 possible stragglers
    # vs the old 4*t_blk = 1024 cap) that turned ~3 s steps into ~21 s.
    n_blocks = t_cap // ta_blk
    n2_need = max(4 * t_blk, n_blocks * act_floor1)
    n2 = min(t_cap, -(-n2_need // t_blk) * t_blk)
    if _DEBUG_SKIP_PASS2:
        tile_bad_d = jnp.zeros_like(tile_bad_d)
    if act_floor1 > 0 and n2 >= t_blk and not _DEBUG_SKIP_PASS2:
        idx2 = jnp.nonzero(tile_bad_d, size=n2, fill_value=t_cap)[0].astype(
            jnp.int32
        )
        valid2 = idx2 < t_cap
        idx2c = jnp.minimum(idx2, t_cap - 1)
        active2 = valid2 & (jnp.take(piece_len_d, idx2c) > 0)
        lists2, visits2, bad2 = phase_a(
            jnp.take(bbox_lo_d, idx2c, axis=0),
            jnp.take(bbox_hi_d, idx2c, axis=0),
            active2,
            n2,
            iter_cap2,
            0,
            k_slots2,
            r_cap2,
        )
        acc2 = eval_block(
            lists2,
            visits2,
            jnp.take(tiles_d, idx2c, axis=0),
            jnp.take(gid_d, idx2c, axis=0),
            n2,
        )
        acc_tiles_d = acc_tiles_d.at[idx2].set(acc2, mode="drop")
        # tiles beyond the n2 straggler capacity keep their bad flag and
        # defer; restarted tiles clear it unless pass 2 also failed
        tile_bad_d = tile_bad_d.at[idx2].set(bad2, mode="drop")

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
            pos_b = jnp.take(pos_new, idx_c, axis=0)
            acc_b = tree_forces(
                pos_b, src_pos, src_mass, tree,
                params, tree_params, active=idx < n,
                self_idx=gid_offset + idx_c,
            )
            if imports is not None:
                # fused LET: deferred lanes owe import-forest forces too
                # (gravity adds; the compacted forest chains buffer to
                # buffer so one walk from row 0 covers every import)
                acc_b = acc_b + tree_forces(
                    pos_b, src_pos, src_mass, imports.forest,
                    params, tree_params, active=idx < n,
                    self_idx=gid_offset + idx_c,
                )
            return acc.at[idx].set(acc_b, mode="drop")

        return fallback_compact

    b_small = min(n, _FB_SMALL_CAP)
    b_large = min(n, max(2 * _FB_SMALL_CAP, -(-n // 16)))

    def fallback_chunked(acc):
        # Any deferral count, memory bounded by the b_large batch: walk
        # compacted chunks of deferred indices under a while loop. (A
        # full-width masked walk handled this before, but its (n, 4)
        # cond-branch buffers pinned ~750 MB at N=32M even when never
        # taken — XLA reserves both branches.) The trailing chunk's
        # clamped dynamic_slice re-reads earlier indices; re-setting
        # them with identical values is harmless.
        idx_all = jnp.nonzero(deferred, size=n, fill_value=n)[0].astype(
            jnp.int32
        )

        def cond(carry):
            return carry[0] * b_large < n_deferred

        def body(carry):
            k, a = carry
            idx = lax.dynamic_slice(idx_all, (k * b_large,), (b_large,))
            idx_c = jnp.minimum(idx, n - 1)
            pos_b = jnp.take(pos_new, idx_c, axis=0)
            acc_b = tree_forces(
                pos_b, src_pos, src_mass, tree,
                params, tree_params, active=idx < n,
                self_idx=gid_offset + idx_c,
            )
            if imports is not None:
                acc_b = acc_b + tree_forces(
                    pos_b, src_pos, src_mass, imports.forest,
                    params, tree_params, active=idx < n,
                    self_idx=gid_offset + idx_c,
                )
            return k + 1, a.at[idx].set(acc_b, mode="drop")

        return lax.while_loop(cond, body, (jnp.int32(0), acc))[1]

    def dispatch(acc):
        return lax.cond(
            n_deferred <= b_small, make_compact(b_small), fallback_chunked, acc
        )

    acc = lax.cond(n_deferred > 0, dispatch, lambda a: a, acc)
    return acc, GroupWalkStats(deferred=n_deferred)
