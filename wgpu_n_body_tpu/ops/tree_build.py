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

Arena is statically sized cap = node_capacity_factor*N + 1 (reference tree
buffer: 4N octants, tree.rs:188-199); the last row is an inert sentinel for
finished walk lanes. Overflow (more real nodes than cap) clamps
``num_nodes`` to the arena size — walks stay bounded and terminate, forces
lose the truncated tail — and raises the ``overflowed`` flag so the step
driver can fail loudly (TreeSim.check_overflow / OfflineHeadless).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from wgpu_n_body_tpu.ops import morton
from wgpu_n_body_tpu.params import ParticleState, TreeParams

# nodes_f32 column layout
COG_X, COG_Y, COG_Z, MASS, WIDTH, IS_SINGLE, NO_CHILD = range(7)
NODE_F32_COLS = 8  # padded to 8 for aligned row gathers


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

    ``NO_CHILD`` column is 3-state: 0 = internal, 1 = terminal cell whose
    count fits leaf_bucket (direct-summable), 2 = terminal cell at
    max_depth holding MORE than leaf_bucket particles (exact evaluation
    needs chunked direct summation — the group walk defers such tiles to
    the per-particle walk, which handles any count).
    """

    nodes_f32: jax.Array
    skip: jax.Array
    first: jax.Array
    count: jax.Array
    num_nodes: jax.Array
    root_width: jax.Array
    overflowed: jax.Array


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
    """Build the DFS node arena from Morton-sorted particles."""
    depth = params.max_depth
    pos, mass = state_sorted.pos, state_sorted.mass
    n = pos.shape[0]
    cap = params.node_capacity_factor * n + 1
    hi, lo = keys
    root_width = 2.0 * bound

    ii = jnp.arange(n, dtype=jnp.int32)

    # Runs of equal key prefixes are contiguous on the sorted axis: run
    # boundaries and counts come from exact int32 scans (cummax/cummin).
    # Mass/cog aggregates use a SEGMENTED associative scan (sum resets at
    # run starts) — numerically local like a per-segment sum (differencing
    # one global cumsum would carry ~eps*total_mass error into small
    # nodes), but ~9x faster than scatter-add segment_sum on TPU at N=1M.
    mvals = jnp.concatenate([mass[:, None], mass[:, None] * pos], axis=1)

    def _seg_comb(a, b):
        (sa, fa), (sb, fb) = a, b
        return jnp.where(fb, sb, sa + sb), fa | fb

    # Per-level segment structure over the sorted particle axis.
    starts = []  # (n,) bool: particle begins a run at this level
    run_starts = []  # (n,) int32: index of my run's first particle
    run_ends = []  # (n,) int32: one past my run's last particle
    counts = []  # (n,) int32: size of my run
    seg_sum_m = []  # (n,) f32: my run's total mass
    seg_sum_mp = []  # (n,3) f32: my run's total m*p
    for lvl in range(depth + 1):
        ph, plo = morton.prefix_at_level(hi, lo, lvl, depth)
        if lvl == 0:
            start = ii == 0
        else:
            start = jnp.concatenate(
                [
                    jnp.ones((1,), bool),
                    (ph[1:] != ph[:-1]) | (plo[1:] != plo[:-1]),
                ]
            )
        rs = jax.lax.cummax(jnp.where(start, ii, jnp.int32(-1)))
        nxt = jnp.where(start, ii, jnp.int32(n))
        ns = jax.lax.cummin(nxt[::-1])[::-1]  # min start index >= i
        re = jnp.concatenate([ns[1:], jnp.full((1,), n, jnp.int32)])
        flag = jnp.broadcast_to(start[:, None], (n, 4))
        seg_inc, _ = jax.lax.associative_scan(_seg_comb, (mvals, flag))
        tot = seg_inc[re - 1]  # inclusive scan at run end == run total
        starts.append(start)
        run_starts.append(rs)
        run_ends.append(re)
        counts.append(re - rs)
        seg_sum_m.append(tot[:, 0])
        seg_sum_mp.append(tot[:, 1:4])

    # A node is real iff root, or its parent run holds more than
    # leaf_bucket particles. With leaf_bucket=1 this is the reference's
    # subdivide-while->=2 rule (tree.rs:506-540); larger buckets stop
    # early and are evaluated exactly by direct summation when opened.
    bucket = params.leaf_bucket
    real = [starts[0]]
    for lvl in range(1, depth + 1):
        real.append(starts[lvl] & (counts[lvl - 1] > bucket))

    # DFS enumeration by (start particle, level).
    c_per_particle = sum(r.astype(jnp.int32) for r in real)
    offset = jnp.cumsum(c_per_particle) - c_per_particle  # exclusive scan
    num_nodes_raw = offset[-1] + c_per_particle[-1]
    # Clamp to the arena: walks bound their loops by num_nodes, so an
    # unclamped overflow would leave lanes pointing past the sentinel and
    # (before this clamp) loop forever — the worst TPU failure mode (a hung
    # while_loop crashes the worker). Overflow truncates + flags instead.
    num_nodes = jnp.minimum(num_nodes_raw, cap)
    offset_ext = jnp.concatenate([offset, num_nodes_raw[None]])

    # Node emission is GATHER-based (inverse mapping node -> (level,
    # particle)) rather than 17 scatters of (n, 8) payloads — random
    # scatters run at ~1e8 elem/s on TPU (1.7 s at N=1M) while the same
    # emission as one small scatter + cummax + row gather takes ~90 ms.
    #
    # (a) dense per-(level, particle) payload tables, (17n, 8) f32 and a
    #     separate (17n,) int32 for skip. Skip must NOT ride through f32:
    #     small int32 values bitcast to f32 are denormals, and TPU flushes
    #     denormals to zero in f32 selects — a zeroed skip pointer makes
    #     the stackless walk loop forever (observed as a TPU worker hang).
    # Only cog+mass ride the payload table — width and the leaf flags are
    # recomputed from (level, count) at emission, keeping the table at
    # (17n, 4) f32 (half of (17n, 8); ~1.1 GB saved at N=4M).
    payloads = []
    skip_payloads = []
    count_payloads = []
    real_bits = jnp.zeros((n,), jnp.int32)
    for lvl in range(depth + 1):
        r = real[lvl]
        cnt = counts[lvl]
        is_single = cnt == 1
        # cog: exact particle position for singletons (tree.rs:525-529),
        # mass-weighted mean otherwise.
        cog = jnp.where(
            is_single[:, None], pos, seg_sum_mp[lvl] / seg_sum_m[lvl][:, None]
        )
        node_skip = offset_ext[run_ends[lvl]]  # at starts, run end == i+cnt
        payloads.append(
            jnp.stack(
                [cog[:, 0], cog[:, 1], cog[:, 2], seg_sum_m[lvl]], axis=1
            )
        )
        skip_payloads.append(node_skip)
        count_payloads.append(cnt)
        real_bits = real_bits | (r.astype(jnp.int32) << lvl)
    payload_all = jnp.concatenate(payloads, axis=0)  # (17n, 4)
    skip_all = jnp.concatenate(skip_payloads)  # (17n,) int32
    count_all = jnp.concatenate(count_payloads)  # (17n,) int32

    # (b) particle-of-node over the arena: one n-sized scatter + cummax.
    kk = jnp.arange(cap, dtype=jnp.int32)
    has_nodes = c_per_particle > 0
    pon = jnp.full((cap,), -1, jnp.int32)
    pon = pon.at[jnp.where(has_nodes, offset, cap)].set(
        jnp.where(has_nodes, ii, -1), mode="drop"
    )
    pon = jax.lax.cummax(pon)
    pon_c = jnp.clip(pon, 0, max(n - 1, 0))
    rank = kk - offset[pon_c]
    # (c) level of node k = rank-th set bit of its particle's real mask.
    mask_k = real_bits[pon_c]
    lvl_of = jnp.zeros((cap,), jnp.int32)
    for lvl in range(depth + 1):
        below = jax.lax.population_count(mask_k & ((1 << lvl) - 1))
        hit = (((mask_k >> lvl) & 1) > 0) & (below == rank)
        lvl_of = jnp.where(hit, lvl, lvl_of)
    # (d) gathers + derived columns + sentinel fill. first particle of
    # node k IS pon(k); width/flags derive from (lvl_of, count).
    valid = kk < num_nodes
    flat = lvl_of * n + pon_c
    cogm = jnp.take(payload_all, flat, axis=0)  # (cap, 4)
    count_k = jnp.take(count_all, flat)
    width_k = root_width * jnp.exp2(-lvl_of.astype(jnp.float32))
    is_single_k = (count_k == 1).astype(jnp.float32)
    # 3-state terminal flag (see TreeArrays docstring): 2 marks max-depth
    # cells overfull relative to leaf_bucket, which need chunked direct
    # summation for exact forces.
    terminal_k = (count_k <= bucket) | (lvl_of == depth)
    no_child_k = jnp.where(
        terminal_k, jnp.where(count_k > bucket, 2.0, 1.0), 0.0
    ).astype(jnp.float32)
    rows = jnp.concatenate(
        [
            cogm,
            width_k[:, None],
            is_single_k[:, None],
            no_child_k[:, None],
            jnp.zeros((cap, 1), jnp.float32),
        ],
        axis=1,
    )
    sentinel = jnp.zeros((NODE_F32_COLS,), jnp.float32)
    sentinel = sentinel.at[COG_X].set(1e30).at[NO_CHILD].set(1.0)
    rows = jnp.where(valid[:, None], rows, sentinel[None, :])
    nodes = jnp.concatenate([rows, sentinel[None, :]], axis=0)  # (cap+1, 8)
    skip = jnp.where(valid, jnp.take(skip_all, flat), cap)
    skip = jnp.concatenate([skip, jnp.full((1,), cap, jnp.int32)])
    first = jnp.where(valid, pon_c, n)
    first = jnp.concatenate([first, jnp.full((1,), n, jnp.int32)])
    count = jnp.where(valid, count_k, 0)
    count = jnp.concatenate([count, jnp.zeros((1,), jnp.int32)])

    return TreeArrays(
        nodes_f32=nodes,
        skip=skip,
        first=first,
        count=count,
        num_nodes=num_nodes,
        root_width=jnp.asarray(root_width, jnp.float32),
        overflowed=num_nodes_raw > cap,
    )
