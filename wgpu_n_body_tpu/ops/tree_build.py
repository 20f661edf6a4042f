"""Device-side octree construction (replaces src/sims/tree.rs:417-602 +
src/utils/slice_alloc.rs — the reference's host-native BFS build, DFS sort
and lock-free bump allocator become one fully-vectorized jitted pass with
zero host involvement).

Equivalences, proven by construction:

- The reference subdivides any cell with >= 2 particles until singleton
  leaves (tree.rs:506-540). After Morton-sorting, the cell of a node at
  level L is a run of equal 3L-bit key prefixes; a node is *real* iff it is
  the root or its parent run has >= 2 particles. Chain nodes (single child)
  are kept, exactly like the reference.
- The reference writes particles in tree-DFS order every step
  (tree.rs:564-602). DFS child order = Morton order (see ops/morton.py),
  so the Morton sort IS the reference's per-step particle reorder.
- DFS *node* order equals lexicographic (start_particle, level): a node is
  visited when DFS first reaches its first particle, shallowest first.
  Therefore node indices are pure cumsums — no sorting of nodes needed:
    offset[i]   = # real nodes starting at particles < i   (exclusive scan)
    index(L, i) = offset[i] + rank of L among i's real-start levels
    first_child = index + 1                 (same start particle, level+1)
    skip        = offset[start + count]     (first node outside the subtree)
- Node payloads (cog = sum(m*p)/sum(m), mass, count) match
  tree.rs:484-505; singleton leaves store the particle position exactly
  (tree.rs:521-534). Bounds = max(|coord|) with identity 1.0, root_width =
  2*bound (tree.rs:424-451).

Arena is statically sized cap = TreeParams.capacity(N) (reference tree
buffer: 4N octants, tree.rs:188-199; 2N default for bucketed leaves); the
last row is an inert sentinel for finished walk lanes. Overflow (more real nodes than cap) clamps
``num_nodes`` to the arena size — walks stay bounded and terminate, forces
lose the truncated tail — and raises the ``overflowed`` flag so the step
driver can fail loudly (TreeSim.check_overflow / OfflineHeadless).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from wgpu_n_body_tpu.ops import morton, scan
from wgpu_n_body_tpu.params import ParticleState, TreeParams

# nodes_f32 column layout
COG_X, COG_Y, COG_Z, MASS, WIDTH, IS_SINGLE, NO_CHILD = range(7)
NODE_F32_COLS = 8  # padded to 8 for aligned row gathers

# ---- profiling-only stage-attribution flags (tools/measure_step.py
# pattern: flip at trace time in a FRESH function/process, never in
# production — outputs are intentionally wrong when set) -----------------
#: skip the octet_pts comb-table assembly (walks needing it will crash);
#: prices the 12-section point-table build+concat inside the octet stage.
_DEBUG_SKIP_PTS = False
#: emission writes only skip/first/count (nodes rows + chain payload left
#: at init); prices the 8-col row assembly + arena DUS traffic.
_DEBUG_EMIT_MINIMAL = False
#: replace the float-float prefix sum with a plain f32 cumsum (node
#: mass/cog totals lose the compensated accuracy); prices ff_cumsum_ext.
_DEBUG_PLAIN_CUMSUM = False
#: override the emission chunk size (default 65536).
_DEBUG_EMIT_CHUNK: int | None = None


class TreeArrays(NamedTuple):
    """Static-shape octree in DFS order.

    nodes_f32:  (cap+1, 8) float32 [cog xyz, mass, width, is_single,
                no_child, unused]; row ``cap`` is the inert sentinel.
    skip:       (cap+1,) int32 — next DFS node outside this subtree.
    first:      (cap+1,) int32 — index (in the sorted particle order) of
                the node's first particle; with ``count`` this is the
                contiguous particle range for direct (exact) evaluation of
                leaf buckets.
    count:      (cap+1,) int32 — particles in the node's subtree.
    num_nodes:  () int32 — real node count CLAMPED to cap (the walks'
                termination bound is therefore always <= arena size).
    root_width: () float32 — 2 * bound (tree.rs:450).
    overflowed: () bool — the unclamped node count exceeded cap; forces
                from this tree are truncated and the tree must be rebuilt
                with a larger node_capacity_factor (or bigger leaf_bucket).
    octets:     (octet_capacity, 17) int32 or None — one row per INTERNAL
                node (compact index = rank among internal nodes in BFS
                order, i.e. sorted by (level, DFS order); the root is
                rank 0 when internal), holding its children in compact
                slot order (= ascending Morton octant): cols 0-7 packed
                child geometry, cols 8-15 per-child particle offset
                within the parent run, col 16 the octet row of the
                node's FIRST internal child. BFS rank makes a node's
                internal children CONTIGUOUS rows, so the per-child
                pointer column collapses to first-child + popcount of
                internal children before the slot (decoded from cols
                0-7) — 24 -> 17 cols. One row gather hands the group
                walk all eight child theta-tests at once; TPU row-gather
                cost scales with table width x size, hence the compact
                rows and packed columns. None for hand-assembled trees
                (LET forests, host oracle); walks then use the
                skip-pointer phase A.
    octet_pts:  (octet_capacity*12 + 2, 8) int32 or None — comb-table
                TWO-point rows matched to octets, laid out SLOT-major
                (assembly is then pure concatenation — ptr-major order
                needs a reshape whose padded layout costs 32x memory).
                Row slot*octet_capacity + ptr is child `slot`'s single
                row [cog xyz bits, mass bits | far-dummy point], rows
                octet_capacity*8 + p*octet_capacity + ptr are
                SIBLING-PAIR rows holding children 2p and 2p+1 of octet
                ptr in both points (absent children are far dummies).
                When both siblings of a pair are theta-accepted the walk
                emits the one pair row instead of two singles — phase-B
                rows halve for the common both-accepted case and an open
                step's <=8 accepted children always fit the 4 emission
                slots (a pair contributes at most one row). The root's
                row and an inert far sentinel follow. Phase B gathers
                these by the list entries the octet engine emits, so no
                node-id column is needed anywhere.

    ``NO_CHILD`` column is 3-state: 0 = internal, 1 = terminal cell whose
    count fits leaf_bucket (direct-summable), 2 = terminal cell at
    max_depth holding MORE than leaf_bucket particles (the per-particle
    walk direct-sums these in bucket-sized chunks; the group walk expands
    members in slot-wide chunks, so any count is exact in both).
    """

    nodes_f32: jax.Array
    skip: jax.Array
    first: jax.Array
    count: jax.Array
    num_nodes: jax.Array
    root_width: jax.Array
    overflowed: jax.Array
    octets: jax.Array | None = None
    octet_pts: jax.Array | None = None


# TreeArrays.octets column indices: packed child geometry in cols
# [OCT_GEOM0 + c], per-child particle offsets in cols [OCT_OFF0 + c],
# first-internal-child octet row in col OCT_FC.
OCT_GEOM0 = 0
OCT_OFF0 = 8
OCT_FC = 16
OCTET_COLS = 17


def morton_order(pos: jax.Array, depth: int):
    """Morton ordering of positions: (perm, bound, sorted (hi, lo) keys).

    bound = max(|coord|, 1.0) (tree.rs:424-446: componentwise abs-max
    reduce with identity [1,1,1]). Callers that only need a subset of the
    state permuted (e.g. the sharded step, which gathers just pos/mass)
    use this directly; ``morton_sort`` wraps it for full states.
    """
    bound = jnp.maximum(1.0, jnp.max(jnp.abs(pos)))
    cell = morton.quantize(pos, bound, depth)
    hi, lo = morton.morton_keys(cell, depth)
    n = pos.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    hi_s, lo_s, perm = jax.lax.sort((hi, lo, idx), num_keys=2)
    return perm, bound, (hi_s, lo_s)


def morton_sort(state: ParticleState, depth: int):
    """Sort particles by Morton key (the reference's per-step reorder)."""
    perm, bound, keys = morton_order(state.pos, depth)
    sorted_state = ParticleState(
        pos=state.pos[perm],
        vel=state.vel[perm],
        acc=state.acc[perm],
        mass=state.mass[perm],
    )
    return sorted_state, bound, keys


def build_tree(
    state_sorted: ParticleState,
    keys: tuple[jax.Array, jax.Array],
    bound: jax.Array,
    params: TreeParams,
) -> TreeArrays:
    """Build the DFS node arena from Morton-sorted particles.

    r2 redesign (5-8x faster than the r1 per-level segmented scans,
    which cost 549 ms at N=1M): run structure at ALL levels derives from
    ONE clz pass (morton.split_levels — run starts nest across levels),
    two batched (depth+1, n) blocked scans give run ends/starts, and
    mass/cog totals come from differencing a single float-float global
    prefix sum at run boundaries (ops/scan.ff_cumsum_ext; ~2^-48 relative
    error, far below f32 ulp of any node total). Emission is node-centric:
    a node's level range per particle is CONTIGUOUS ([split level ..
    deepest level whose parent run still exceeds leaf_bucket]), so
    node -> (particle, level) needs no per-level popcount ranking.
    """
    depth = params.max_depth
    pos, mass = state_sorted.pos, state_sorted.mass
    n = pos.shape[0]
    cap = params.capacity(n)
    hi, lo = keys
    root_width = 2.0 * bound
    bucket = params.leaf_bucket

    ii = jnp.arange(n, dtype=jnp.int32)

    # Per-level run structure from nested starts: particle i starts a run
    # at exactly the levels >= s[i].
    s = morton.split_levels(hi, lo, depth)  # (n,) int32
    lv = jnp.arange(depth + 1, dtype=jnp.int32)[:, None]
    start_all = s[None, :] <= lv  # (depth+1, n) bool
    rs_all = scan.cummax_last(jnp.where(start_all, ii[None, :], jnp.int32(-1)))
    nxt = jnp.where(start_all, ii[None, :], jnp.int32(n))
    ns = scan.cummin_last(nxt[:, ::-1])[:, ::-1]  # min start index >= i
    re_all = jnp.concatenate(
        [ns[:, 1:], jnp.full((depth + 1, 1), n, jnp.int32)], axis=1
    )
    counts_dense = re_all - rs_all  # run size containing i, per level

    # A node is real iff root, or its parent run holds more than
    # leaf_bucket particles (reference subdivide-while->=2 rule,
    # tree.rs:506-540, generalized to buckets). Run sizes are monotone
    # non-increasing in level, so particle i's real levels form the
    # contiguous range [s[i], min(t[i], depth)] with t[i] = number of
    # levels whose containing run still exceeds the bucket.
    t = jnp.sum((counts_dense > bucket).astype(jnp.int32), axis=0)
    c_per_particle = jnp.maximum(0, jnp.minimum(t, depth) - s + 1)
    offset = jnp.cumsum(c_per_particle) - c_per_particle  # exclusive scan
    num_nodes_raw = offset[-1] + c_per_particle[-1]
    # Clamp to the arena: walks bound their loops by num_nodes, so an
    # unclamped overflow would leave lanes pointing past the sentinel and
    # (before this clamp) loop forever — the worst TPU failure mode (a hung
    # while_loop crashes the worker). Overflow truncates + flags instead.
    num_nodes = jnp.minimum(num_nodes_raw, cap)
    offset_ext = jnp.concatenate([offset, num_nodes_raw[None]])

    # Node emission is GATHER-based (inverse mapping node -> (level,
    # particle)): one n-sized scatter + cummax recovers each node's first
    # particle, and the contiguous level range gives its level by rank.
    #
    # Emission is CHUNKED with a dynamic bound: the per-node gathers and
    # row assembly are the dominant build cost and would otherwise run
    # over the WHOLE static arena (see the node_capacity_factor
    # docstring), but real trees only fill ~0.2-0.25N of the 0.5N default
    # arena — the loop stops at the last live chunk and the dead tail
    # keeps its (sentinel) initialization, which is exactly what the
    # un-chunked emission wrote there.
    need_chain = params.walk_engine == "octet"
    chunk_e = min(_DEBUG_EMIT_CHUNK or 65536, -(-cap // 8) * 8)
    n_chunks = -(-cap // chunk_e)
    cap_pad = n_chunks * chunk_e
    has_nodes = c_per_particle > 0
    pon = jnp.full((cap_pad,), -1, jnp.int32)
    pon = pon.at[jnp.where(has_nodes, offset, cap_pad)].set(
        jnp.where(has_nodes, ii, -1), mode="drop"
    )
    pon = scan.cummax_last(pon)
    pon_cl = jnp.clip(pon, 0, max(n - 1, 0))

    # Per-node gathers: run end -> count/skip; float-float prefix-sum
    # boundary differences -> mass and m*p totals. Skip stays in int32
    # end-to-end (small ints bitcast to f32 are denormals, and TPU
    # flushes denormals in f32 selects — a zeroed skip pointer loops the
    # stackless walk forever, observed as a TPU worker hang).
    re_all_flat = re_all.reshape(-1)
    mvals = jnp.concatenate([mass[:, None], mass[:, None] * pos], axis=1)
    if _DEBUG_PLAIN_CUMSUM:  # profiling-only: prices the ff scan
        cs_hi = jnp.concatenate(
            [jnp.zeros((1, 4), jnp.float32), jnp.cumsum(mvals, axis=0)]
        )
        cs_lo = jnp.zeros_like(cs_hi)
    else:
        cs_hi, cs_lo = scan.ff_cumsum_ext(mvals)  # (n+1, 4)
    # Sentinel cog must be far away yet keep r^2 and w finite in f32 (the
    # group eval relies on zero mass x finite weight == exactly zero;
    # 1e30 would square to inf and poison sums with inf*0 = NaN).
    sentinel = jnp.zeros((NODE_F32_COLS,), jnp.float32)
    sentinel = sentinel.at[COG_X].set(1e15).at[NO_CHILD].set(1.0)

    def emit_chunk(c, carry):
        nodes_b, skip_b, first_b, count_b, chain_b = carry
        k0 = c * chunk_e
        kk = k0 + jnp.arange(chunk_e, dtype=jnp.int32)
        pon_c = lax.dynamic_slice(pon_cl, (k0,), (chunk_e,))
        rank = kk - jnp.take(offset, pon_c)
        lvl_c = jnp.clip(jnp.take(s, pon_c) + rank, 0, depth)
        valid = kk < num_nodes
        flat = lvl_c * n + pon_c
        re_k = jnp.take(re_all_flat, flat)
        count_k = re_k - pon_c
        tot = (
            jnp.take(cs_hi, re_k, axis=0) - jnp.take(cs_hi, pon_c, axis=0)
        ) + (jnp.take(cs_lo, re_k, axis=0) - jnp.take(cs_lo, pon_c, axis=0))
        # cog: exact particle position for singletons (tree.rs:525-529),
        # mass-weighted mean otherwise.
        pos_first = jnp.take(pos, pon_c, axis=0)
        is_single = count_k == 1
        cog = jnp.where(
            is_single[:, None], pos_first, tot[:, 1:4] / tot[:, 0:1]
        )
        width_k = root_width * jnp.exp2(-lvl_c.astype(jnp.float32))
        # 3-state terminal flag (see TreeArrays docstring): 2 marks
        # max-depth cells overfull relative to leaf_bucket (direct
        # summation must chunk).
        terminal_k = (count_k <= bucket) | (lvl_c == depth)
        no_child_k = jnp.where(
            terminal_k, jnp.where(count_k > bucket, 2.0, 1.0), 0.0
        ).astype(jnp.float32)
        rows = jnp.concatenate(
            [
                cog,
                tot[:, 0:1],
                width_k[:, None],
                is_single.astype(jnp.float32)[:, None],
                no_child_k[:, None],
                jnp.zeros((chunk_e, 1), jnp.float32),
            ],
            axis=1,
        )
        rows = jnp.where(valid[:, None], rows, sentinel[None, :])
        first_c = jnp.where(valid, pon_c, n)
        if not _DEBUG_EMIT_MINIMAL:
            nodes_b = lax.dynamic_update_slice(
                nodes_b, rows, (k0, jnp.int32(0))
            )
        skip_b = lax.dynamic_update_slice(
            skip_b, jnp.where(valid, jnp.take(offset_ext, re_k), cap), (k0,)
        )
        first_b = lax.dynamic_update_slice(first_b, first_c, (k0,))
        count_b = lax.dynamic_update_slice(
            count_b, jnp.where(valid, count_k, 0), (k0,)
        )
        if need_chain and not _DEBUG_EMIT_MINIMAL:
            # combined per-node payload row for the octet-table gathers
            # below: [cog x/y/z bits, mass bits, lvl, first, no_child,
            # cell x/y/z] (the child's octet ptr comes from a separate
            # narrow irank gather — irank needs a global cumsum, which
            # would force a second full-arena pass here).
            cells_c = morton.quantize(pos_first, bound, depth).astype(
                jnp.int32
            )
            chain_c = jnp.concatenate(
                [
                    jax.lax.bitcast_convert_type(
                        jnp.concatenate([cog, tot[:, 0:1]], axis=1),
                        jnp.int32,
                    ),
                    lvl_c[:, None],
                    first_c[:, None],
                    no_child_k.astype(jnp.int32)[:, None],
                    cells_c,
                ],
                axis=1,
            )
            chain_b = lax.dynamic_update_slice(
                chain_b, chain_c, (k0, jnp.int32(0))
            )
        return nodes_b, skip_b, first_b, count_b, chain_b

    nodes_pad0 = (
        jnp.zeros((cap_pad, NODE_F32_COLS), jnp.float32)
        .at[:, COG_X].set(1e15)
        .at[:, NO_CHILD].set(1.0)
    )
    live_chunks = (num_nodes + (chunk_e - 1)) // chunk_e
    nodes_pad, skip_pad, first_pad, count_pad, chain_pad = lax.fori_loop(
        0,
        jnp.maximum(live_chunks, 1),
        emit_chunk,
        (
            nodes_pad0,
            jnp.full((cap_pad,), cap, jnp.int32),
            jnp.full((cap_pad,), n, jnp.int32),
            jnp.zeros((cap_pad,), jnp.int32),
            jnp.zeros((cap_pad, 10), jnp.int32)
            if need_chain
            else jnp.zeros((1, 10), jnp.int32),
        ),
    )
    nodes = jnp.concatenate(
        [nodes_pad[:cap], sentinel[None, :]], axis=0
    )  # (cap+1, 8)
    skip = jnp.concatenate([skip_pad[:cap], jnp.full((1,), cap, jnp.int32)])
    first = jnp.concatenate([first_pad[:cap], jnp.full((1,), n, jnp.int32)])
    count = jnp.concatenate([count_pad[:cap], jnp.zeros((1,), jnp.int32)])

    # ---- compact octet tables (walk_engine="octet") --------------------
    # TPU row gathers get faster the narrower AND smaller the table
    # (measured on v5e: (2M,40) 92 us vs (250k,24) ~22 us per 2048-row
    # step), so the octet table indexes only INTERNAL nodes (the ones a
    # walk can open) and packs each child into 2 int32 columns plus one
    # shared pointer column (17-col rows, was 24 before the BFS re-rank):
    #   geom[c] (cols 0-7)
    #         [exists:1][terminal:1][octant digit:3][qz:9][qy:9][qx:9] —
    #         the child cog quantized to 1/512ths of its own cell (the
    #         walk dequantizes from the parent center + digit and inflates
    #         the theta test by the sqrt(3)/1024 cell-relative error, so
    #         acceptance stays conservative)
    #   off[c] (cols 8-15)
    #         child's particle offset within the parent run (firsts and
    #         member-run lengths are offset differences — no counts col)
    #   fc (col 16)
    #         octet row of the FIRST internal child; child c's own row
    #         is fc + popcount(internal children at slots < c), exact
    #         because rows are BFS-ranked (see the re-rank above)
    # Children sit in COMPACT slot order (DFS sibling order == ascending
    # Morton digit), found by chasing the sibling skip-chain from
    # first-child = parent+1 — eight bulk row-gathers instead of the
    # arena-sized scatter a digit-slotted layout would need (185 ms at
    # cap=2M; the whole chain construction is ~a third of that).
    # A matching point-mass table (octet_pts, comb-table row format) falls
    # out of the same chain gathers for free, giving phase B child-indexed
    # rows at ptr*8+slot and removing any need for a node-id column.
    if params.walk_engine != "octet":
        return TreeArrays(
            nodes_f32=nodes,
            skip=skip,
            first=first,
            count=count,
            num_nodes=num_nodes,
            root_width=jnp.asarray(root_width, jnp.float32),
            overflowed=num_nodes_raw > cap,
        )
    cap_oct = params.octet_capacity(n)
    valid_pad = jnp.arange(cap_pad, dtype=jnp.int32) < num_nodes
    is_internal = valid_pad & (nodes_pad[:, NO_CHILD] == 0.0)
    irank = jnp.cumsum(is_internal.astype(jnp.int32)) - 1
    n_internal = jnp.where(num_nodes_raw > 0, irank[-1] + 1, 0)
    oct_overflow = n_internal > cap_oct
    p_of_dfs = (
        jnp.zeros((cap_oct,), jnp.int32)
        .at[jnp.where(is_internal & (irank < cap_oct), irank, cap_oct)]
        .set(jnp.arange(cap_pad, dtype=jnp.int32), mode="drop")
    )
    # BFS re-rank: octet rows sorted by (level, DFS order). Within one
    # level, DFS order = first-particle order, and every level-(L+1)
    # node whose first particle falls inside a level-L run is that
    # run's child — so a parent's internal children occupy CONTIGUOUS
    # BFS ranks and one first-child pointer (+ a popcount over the
    # packed cols, done by the walk) replaces the 8 per-child pointer
    # columns. The sort is cap_oct-sized (0.08N) int32 keys — noise
    # next to the arena-sized emission above. Key = lvl*cap_oct + rank
    # stays within int32 for cap_oct up to ~126M rows. Keys are unique,
    # so the unstable default is exact. Invalid rows (>= n_internal)
    # key to INT32_MAX: they sort to the tail with payload 0, exactly
    # the junk rows the DFS layout carried.
    oct_iota = jnp.arange(cap_oct, dtype=jnp.int32)
    lvl_oct = jnp.take(chain_pad[:, 4], jnp.minimum(p_of_dfs, cap_pad - 1))
    okey = jnp.where(
        oct_iota < n_internal,
        lvl_oct * cap_oct + oct_iota,
        jnp.int32(0x7FFFFFFF),
    )
    _, p_of, dfs_rank_s = lax.sort(
        (okey, p_of_dfs, oct_iota), num_keys=1
    )
    # inverse permutation: child octet pointers below are DFS iranks
    # (a global cumsum over the arena) and must be re-ranked to BFS
    brank_of_dfs = (
        jnp.zeros((cap_oct,), jnp.int32)
        .at[dfs_rank_s]
        .set(oct_iota, mode="drop")
    )

    # per-node payload rows for the gathers below were assembled by the
    # chunked emission loop (the chained part of the hop reads only the
    # 4-byte ``skip`` array, see below): [cog x/y/z bits, mass bits, lvl,
    # first, no_child, cell x/y/z]; a child's octet ptr rides a separate
    # narrow irank gather (irank is a global cumsum over the arena and
    # can't be chunk-local).
    chain_tbl = jnp.concatenate(
        [chain_pad[:cap], jnp.zeros((1, 10), jnp.int32)], axis=0
    )
    irank_ext = jnp.concatenate([irank[:cap], jnp.zeros((1,), jnp.int32)])

    p_skip = jnp.take(skip, jnp.minimum(p_of, cap))
    p_first = jnp.take(first, jnp.minimum(p_of, cap))
    # Sibling skip-chain: the DEPENDENT part of the hop only needs the
    # 4-byte skip column, so the chain rides 8 narrow gathers; the eight
    # 48-byte payload row-gathers below are then mutually independent
    # (XLA overlaps them), ~2x faster than chaining the wide rows.
    u = jnp.minimum(p_of + 1, cap)
    u_c, ex_c = [], []
    for c in range(8):
        ex = u < p_skip
        u_c.append(u)
        ex_c.append(ex)
        if c < 7:
            u = jnp.where(ex, jnp.minimum(jnp.take(skip, u), cap), u)
    geom_cols = []
    off_cols = []
    int_child = []
    brank_ch = []
    pts_rows = []
    far_bits = lax.bitcast_convert_type(jnp.float32(1e15), jnp.int32)
    for c in range(8):
        ex = ex_c[c]
        row = jnp.take(chain_tbl, u_c[c], axis=0)  # (cap_oct, 10)
        ccog = lax.bitcast_convert_type(row[:, 0:3], jnp.float32)
        lvl_u = row[:, 4]
        first_u = row[:, 5]
        term_u = row[:, 6] > 0
        ptr_u = jnp.take(irank_ext, u_c[c])
        cell_u = row[:, 7:10]
        sh = jnp.clip(depth - lvl_u, 0, 31).astype(jnp.uint32)
        cell_l = (cell_u.astype(jnp.uint32) >> sh[:, None]).astype(jnp.float32)
        w_l = root_width * jnp.exp2(-lvl_u.astype(jnp.float32))
        lo_l = cell_l * w_l[:, None] - bound
        q = jnp.clip(
            jnp.floor((ccog - lo_l) / w_l[:, None] * 512.0), 0.0, 511.0
        ).astype(jnp.int32)
        digit = (
            ((cell_u[:, 0] >> sh) & 1)
            | (((cell_u[:, 1] >> sh) & 1) << 1)
            | (((cell_u[:, 2] >> sh) & 1) << 2)
        ).astype(jnp.int32)
        col0 = jnp.where(
            ex,
            (jnp.int32(1) << 31)
            | (term_u.astype(jnp.int32) << 30)
            | (digit << 27)
            | (q[:, 2] << 18)
            | (q[:, 1] << 9)
            | q[:, 0],
            0,
        )
        geom_cols.append(col0)
        off_cols.append(jnp.where(ex, first_u - p_first, 0))
        int_child.append(ex & ~term_u)
        brank_ch.append(
            jnp.take(brank_of_dfs, jnp.clip(ptr_u, 0, cap_oct - 1))
        )
        # comb rows are TWO-point rows ([x1 y1 z1 m1 x2 y2 z2 m2]; the
        # group walk's member pairs fill both; node rows leave point 2 a
        # massless far dummy — far so an exactly-coincident receiver can't
        # produce rsqrt(0)*0 = NaN)
        pts_rows.append(
            jnp.stack(
                [
                    jnp.where(ex, row[:, 0], far_bits),
                    jnp.where(ex, row[:, 1], 0),
                    jnp.where(ex, row[:, 2], 0),
                    jnp.where(ex, row[:, 3], 0),  # mass 0 for absent
                    jnp.full_like(ex, far_bits, dtype=jnp.int32),
                    jnp.zeros_like(ex, dtype=jnp.int32),
                    jnp.zeros_like(ex, dtype=jnp.int32),
                    jnp.zeros_like(ex, dtype=jnp.int32),
                ],
                axis=1,
            )
        )
    # first internal child's BFS octet row (descending select chain so
    # the lowest slot wins; 0 when the node has no internal children —
    # the walk never reads fc then, its popcount prefix is only added
    # for slots decoded internal from the geom cols)
    fc_col = jnp.zeros((cap_oct,), jnp.int32)
    for c in range(7, -1, -1):
        fc_col = jnp.where(int_child[c], brank_ch[c], fc_col)
    octets = jnp.stack(
        geom_cols + off_cols + [fc_col], axis=1
    )  # (cap_oct, 17)
    # point rows at ptr*8 + slot, then [root | sentinel] (the walk appends
    # source-particle member-pair rows after these)
    # Root cols read as FOUR (1,1) element slices, not nodes[0:1, :]:
    # slicing one logical row out of the column-major-laid-out arena
    # makes XLA materialize a row-major copy of the WHOLE array (8-wide
    # rows pad to 128 lanes: a 16x-expanded 7.7 GB temp at N=32M).
    root_bits = lax.bitcast_convert_type(
        jnp.stack([nodes[:, c][0] for c in range(4)])[None, :], jnp.int32
    )
    far_tail = jnp.concatenate(
        [jnp.full((1, 1), far_bits, jnp.int32), jnp.zeros((1, 3), jnp.int32)],
        axis=1,
    )
    root_row = jnp.concatenate([root_bits[:, 0:4], far_tail], axis=1)
    sent_row = jnp.concatenate(
        [
            jnp.full((1, 1), far_bits, jnp.int32),
            jnp.zeros((1, 3), jnp.int32),
            far_tail,
        ],
        axis=1,
    )
    # sibling-pair node rows: children (2p, 2p+1) of each octet in one
    # two-point row (see TreeArrays.octet_pts docstring). Absent children
    # already carry far-dummy mass-0 points. Both sections are laid out
    # SLOT-MAJOR (single row = slot*cap_oct + ptr, pair row = spair_base
    # + p*cap_oct + ptr) so assembly is pure concatenation: the obvious
    # ptr-major stack(axis=1).reshape forces XLA to materialize a
    # (cap_oct, 8, 4) row-major-tiled temp whose 4-wide minor dim pads
    # to 128 lanes — a 32x-expanded 9.8 GB allocation at N=32M that was
    # the single-chip OOM wall.
    if _DEBUG_SKIP_PTS:  # profiling-only: prices the comb-table assembly
        octet_pts = jnp.concatenate([root_row, sent_row], axis=0)
    else:
        sib_pairs = jnp.concatenate(
            [
                jnp.concatenate(
                    [pts_rows[2 * p][:, 0:4], pts_rows[2 * p + 1][:, 0:4]],
                    axis=1,
                )
                for p in range(4)
            ],
            axis=0,
        )  # (cap_oct*4, 8), row p*cap_oct + ptr
        octet_pts = jnp.concatenate(
            pts_rows + [sib_pairs, root_row, sent_row], axis=0
        )  # (cap_oct*12 + 2, 8); single row = slot*cap_oct + ptr

    return TreeArrays(
        nodes_f32=nodes,
        skip=skip,
        first=first,
        count=count,
        num_nodes=num_nodes,
        root_width=jnp.asarray(root_width, jnp.float32),
        overflowed=(num_nodes_raw > cap) | oct_overflow,
        octets=octets,
        octet_pts=octet_pts,
    )
