"""Core value types: simulation parameters and the particle-state pytree.

Reference parity:
- ``SimParams``      <- src/sims/mod.rs:53-58 (fields) and :62-71 (defaults)
- ``ParticleState``  <- src/sims/mod.rs:11-16 ``Particle`` {position, velocity,
  acceleration, mass}. The reference stores AoS records with stride 40 B
  (naive.wgsl:16); on TPU we store SoA ``(N, 3)`` / ``(N,)`` arrays because
  the VPU wants lane-contiguous data. Semantically identical fields.
- ``NaiveParams`` / ``TreeParams`` <- the ``AddParams`` enum
  (src/sims/mod.rs:18-23) and ``TreeSimParams`` (src/sims/tree.rs:626-629).

Params are *values* (frozen dataclasses), mirroring the reference's
"config is a plain struct" shape. They are static under ``jax.jit``
(closed over / hashable), so every compiled step specializes on them.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Global simulation parameters (reference src/sims/mod.rs:53-58).

    Defaults match the reference's ``Default`` impl (src/sims/mod.rs:62-71).

    Attributes:
      particle_num: N, number of bodies.
      g: gravitational constant.
      e: softening term added to r^3 in the force denominator
         (naive.wgsl:39 — note it softens r^3, not r^2).
      dt: timestep. NOTE the reference multiplies dt *inside* force
         accumulation (naive.wgsl:41, tree.wgsl:67), so the stored
         "acceleration" field is really sum(a)*dt. We replicate exactly.
    """

    particle_num: int = 10000
    g: float = 1e-6
    e: float = 1e-4
    dt: float = 0.016


@dataclasses.dataclass(frozen=True)
class NaiveParams:
    """Extra params for the naive O(N^2) backend (reference AddParams::NaiveSimParams).

    Attributes:
      tile_i: Pallas receiver-tile (sublane) size for the all-pairs kernel.
      tile_j: Pallas source-tile (lane, streamed) size.
      use_pallas: if False, use the pure-jnp blockwise force (oracle path).
      mxu: opt-in MXU-hybrid kernel (ops/naive_pallas._kernel_mxu). Exact
        per-pair geometry, but the accumulation is factored as
        sum(w*p_j) - p_i*sum(w) through a matmul — faster, NOT
        reference-exact: measured f32 error vs f64 truth is ~2e-4 at p99
        and up to ~3e-2 relative on near-zero-acc particles (the dx-form
        default measures ~2e-5 / 4e-3). Default off; physics parity tests
        run the exact path.

    Defaults were swept on a v5e chip (2026-08): (512, 1024) gives
    1.14e11 pairs/s at N=262144; within 1% of the best point measured.
    """

    tile_i: int = 512
    tile_j: int = 2048
    use_pallas: bool = True
    mxu: bool = False


@dataclasses.dataclass(frozen=True)
class TreeParams:
    """Extra params for the Barnes-Hut backend.

    Reference: ``AddParams::TreeSimParams { theta }`` (src/sims/mod.rs:18-23)
    with default theta 0.75 when unset (src/sims/tree.rs:42-51), and the
    4N-octant tree-buffer cap (src/sims/tree.rs:188-199).

    Attributes:
      theta: opening angle; a cell is accepted when width/dist < theta
        (tree.wgsl:63-64).
      max_depth: maximum octree depth D. The reference subdivides until
        singleton leaves (unbounded depth); we use Morton keys at 3*D bits,
        deep enough that real float32 data always separates. Cells still
        multi-body at depth D are treated as terminal point masses.
      node_capacity_factor: tree arena size = factor * N nodes; None
        (default) resolves bucket-aware: the reference's 4N
        (src/sims/tree.rs:188-199) for singleton leaves, 1.0 for small
        buckets, 0.5 for bucket >= 8 (measured trees use ~0.21-0.23N at
        bucket 16 even on the clustered disc scene, so 0.5 keeps >2x
        slack; pathological clustering overflows loudly via
        TreeArrays.overflowed instead of hanging). The node-emission
        stage of the build runs over the WHOLE arena (gathers + row
        assembly are cap-sized), so arena size is a first-order build
        cost: shrinking 2N -> 0.5N cut build(nodes) ~335 -> ~100 ms at
        N=2M on v5e.
      leaf_bucket: stop subdividing cells holding <= leaf_bucket
        particles. Buckets that pass the theta test are accepted as point
        masses — exactly what the reference does with the same cell — and
        buckets that fail it are evaluated by exact direct summation over
        their particles (the reference descends to singletons whose
        point-mass evaluation IS the direct sum), so accuracy is
        reference-faithful for any bucket size while the tree gets ~K
        times fewer leaf-region nodes. 1 reproduces singleton leaves.
      walk: "group" (fast tile-shared traversal, conservative acceptance —
        at least as accurate as per-particle) or "per_particle"
        (reference-exact acceptance pattern).
      walk_tile: particles per tile for the group walk (Morton-adjacent).
        None (default) resolves by receiver count: 512 at N >= 2M, 256
        below. Bigger tiles amortize the gather-latency-bound traversal
        over more particles but pay more per-tile bbox slack; swept on
        v5e (2026-08-18, same session): 512 wins at N=2M theta=0.5 disc
        (1.24 vs 1.48 s) and N=4M uniform (1.82 vs 2.25 s), loses at
        N=1M theta=0.75 disc (0.52 vs 0.45 s), washes at N=100k
        (1024 and 128 lose everywhere measured).
      walk_list_cap: static per-tile interaction-list capacity (rounded up
        to a multiple of 256 internally). List rows hold theta-accepted
        nodes AND expanded members of opened leaf buckets; tiles that
        exhaust 2x this budget defer to the per-particle walk.
      walk_block: phase-A lockstep block width (tiles traversed together;
        rounded to cover walk-tile blocks). Traversal steps are gather-
        LATENCY bound (~tens of us regardless of practical width), so
        wider blocks amortize per-step cost across more tiles — until
        lockstep tail waste (block cost = max over its tiles) wins.
        Swept on v5e 2026-08 (post straggler-budget fix): 4096 measures
        within noise of 2048 at N=1-2M; 8192 is ~25% slower.
      walk_straggler_budget: row-budget multiplier for the straggler
        restart pass (the compacted pass-2 re-walk of tiles that hit the
        pass-1 active floor). >1 lets extreme-density tiles finish in the
        group walk instead of deferring to the per-particle fallback, at
        the cost of proportionally more pass-2 evaluation rows.
      walk_straggler_slots: emission slots per step in the straggler
        pass (octet engine only; pass 1 stays at 4). Wider slots stream
        the pass-2 dense-core tiles in fewer lockstep steps at the cost
        of more sentinel padding in their lists; since the eval compacts
        padding away, the trade is steps vs pass-2 ROW BUDGET (pad can
        exhaust walk_straggler_budget*rows and mass-defer — the 16x
        cliff). Measured on v5e (2026-08): 8 is a clear win over 4 at
        both N=2M theta=0.5 (2.06 -> 2.00 s) and N=1M theta=0.75
        (806 -> 658 ms); host sim shows -23% pass-2 steps.
      walk_engine: phase-A traversal engine for the group walk. "skip" =
        stackless skip-pointer walk (one node visit per lockstep step).
        "octet" = child-block walk (one *opened* node per step, 8 child
        tests per gather; needs the octet tables the build then emits).
      let_import_list_cap: walk_list_cap override for the LET import-
        forest walk only (see effective_import_list_cap). Applies to the
        SPLIT walk (let_fused=False); the fused walk shares the local
        walk's budget. None = auto (2048, capped by walk_list_cap).
      let_fused: fuse the LET import forest into the local octet walk
        (one group_tree_forces call — import roots ride the per-lane
        stack, import octet tables append to the local ones). Default
        FALSE (the round-4/5 split walk: local octet walk + separate
        reduced-budget skip-engine import walk): the isolated-walk A/B
        favors fused (1.346 vs 1.452 s at n_local=4M) but the WHOLE
        per-chip step reverses it — split 2.188 vs fused 2.487 s, same
        session (PERF.md round 5; in-graph the fused walk's concatenated
        source/table buffers cost ~0.3-0.4 s the isolated harness never
        sees). Only effective for walk="group" with the octet engine.
      let_forest_factor: sizing of the fused walk's compacted import
        forest, in let_caps (see let_forest_cap). The fused walk pays
        for the STATIC cap (table-size tax on every chained gather),
        not the content — keep it tight.
      octet_capacity_factor: octet-table rows = factor * N (clamped to
        [4096, node capacity]). Only internal (openable) nodes need a
        row; measured internal counts at leaf_bucket 16 are 0.018-0.039N
        (disc/uniform, N=262k-1M), so the default (bucket-aware: 4.0 for
        singleton leaves whose internal count can approach the arena
        bound, 0.5 for small buckets, 0.08 otherwise) keeps ~2x slack.
        TPU row gathers get faster the smaller the table — shrinking
        0.125N -> 0.08N measured -17% full step at N=1M theta=0.75 —
        hence the compact indexing. Overflow sets TreeArrays.overflowed
        (fails loudly, never hangs).
    """

    theta: float = 0.75
    max_depth: int = 16
    node_capacity_factor: float | None = None
    leaf_bucket: int = 16
    walk: str = "group"
    walk_tile: int | None = None
    walk_list_cap: int = 8192
    walk_block: int = 2048
    walk_straggler_budget: int = 2
    walk_straggler_slots: int = 8
    walk_engine: str = "octet"
    octet_capacity_factor: float | None = None
    let_import_list_cap: int | None = None
    let_fused: bool = False
    let_forest_factor: float = 2.5

    def let_forest_cap(self, p: int, let_cap: int) -> int:
        """Static row capacity of the fused LET walk's compacted import
        forest (``let_tree.compact_import_forest``): real import rows
        packed slack-free, so the identity-mapped import octet table —
        whose size prices both its build and the walk's chained gathers —
        tracks actual content instead of P * let_cap. Realistic octant
        geometry fills ~2.2 let_caps (3 faces + 3 edges + 1 corner at
        auto-sized caps, PERF.md), and the fused walk's cost is the
        STATIC table size, not its content (inert-import A/B read
        identical; ~0.8 ns per appended row per 4M-receiver walk, r5),
        so ``let_forest_factor`` (default 2.5, measured -0.117 s vs 4.0
        at n_local=4M) keeps only ~12% slack and relies on LOUD overflow
        (check_overflow raises; reshard bounds the drift that grows
        imports). Never exceeds the padded total P * let_cap."""
        return min(p * let_cap, max(let_cap, int(self.let_forest_factor * let_cap)))

    def effective_import_list_cap(self) -> int:
        """walk_list_cap for the LET schedule's import-forest walk (the
        split walk's second half, parallel/sharded_tree.py). The import
        forest is tiny (P*let_cap already-pruned rows vs the local tree's
        N-particle arena), yet the group walk's fixed budgets — the
        (rows, lanes) list arrays, their compaction sorts, the iteration
        cap — are all sized by walk_list_cap; measured on v5e at
        n_local=4M the full-budget import walk cost 0.77 s, ~10x its
        share of the work (PERF.md "Measured LET component pricing").
        Tiles that exhaust the reduced budget defer to the exact
        per-particle fallback (physics unaffected; watch
        diagnose()['walk_deferred'] for the cliff). None -> 2048, capped
        by walk_list_cap."""
        if self.let_import_list_cap is not None:
            return self.let_import_list_cap
        return min(self.walk_list_cap, 2048)

    def effective_walk_tile(self, n: int) -> int:
        """walk_tile with the receiver-count-aware default resolved
        (n = receivers in this walk: N single-chip, N/P per shard)."""
        if self.walk_tile is not None:
            return self.walk_tile
        return 512 if n >= (1 << 21) else 256

    @property
    def effective_capacity_factor(self) -> float:
        """node_capacity_factor with the bucket-aware default resolved."""
        if self.node_capacity_factor is not None:
            return self.node_capacity_factor
        if self.leaf_bucket == 1:
            return 4.0
        return 0.5 if self.leaf_bucket >= 8 else 1.0

    def capacity(self, n: int) -> int:
        """Node-arena size for N particles (reference: 4N octants,
        src/sims/tree.rs:188-199). The bucket-aware auto default is
        floored for tiny N where factor*N alone would undersize real
        trees; an EXPLICIT node_capacity_factor is exact (overflow
        tests size adversarial arenas with it)."""
        cap = int(self.effective_capacity_factor * n)
        if self.node_capacity_factor is None:
            cap = max(4096, cap)
        return cap + 1

    def octet_capacity(self, n: int) -> int:
        """Compact octet-table rows (internal nodes only) for N particles.

        Both walk phases gather from octet tables and TPU gathers get
        faster the smaller the table, so the auto default tracks measured
        internal-node counts (0.018-0.042N at bucket 16 across disc,
        uniform and spherical scenes, N=262k-4M): 0.06N for bucket >= 8
        (~1.4x slack on the worst measured scene — the r5 capacity
        lesson: walk tables cost by STATIC size, ~0.9 ns/row per
        4M-receiver walk even when empty, and overflow is loud; the
        0.08N -> 0.06N shrink measured -3.1% full step at N=4M
        theta=0.75 uniform same-session, a wash at N=2M theta=0.5 disc).
        History: 0.125N -> 0.08N was -17% at N=1M theta=0.75. The auto
        floor is 16384 rows: an 8192-row table measured ~17% SLOWER than
        12800/16384 at N=100k (v5e, cause unidentified — likely an XLA
        gather-strategy threshold), so small N keeps a 16k table.
        Overflow sets TreeArrays.overflowed (fails loudly, never
        hangs)."""
        f = self.octet_capacity_factor
        if f is None:
            f = 4.0 if self.leaf_bucket == 1 else (
                0.5 if self.leaf_bucket < 8 else 0.06
            )
            return min(self.capacity(n), max(16384, int(n * f)))
        return min(self.capacity(n), max(4096, int(n * f)))


class ParticleState(NamedTuple):
    """SoA particle state pytree (reference Particle, src/sims/mod.rs:11-16).

    pos:  (N, 3) float32 positions
    vel:  (N, 3) float32 velocities
    acc:  (N, 3) float32 — stores sum(a)*dt of the last step, exactly like
          the reference's acceleration field (naive.wgsl:41,68)
    mass: (N,)   float32 masses
    """

    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    mass: jax.Array

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "ParticleState":
        return ParticleState(
            pos=jnp.zeros((n, 3), dtype),
            vel=jnp.zeros((n, 3), dtype),
            acc=jnp.zeros((n, 3), dtype),
            mass=jnp.ones((n,), dtype),
        )


def validate_state(state: ParticleState) -> None:
    """Shape/dtype invariants; raises ValueError on violation."""
    n = state.pos.shape[0]
    if state.pos.shape != (n, 3):
        raise ValueError(f"pos must be (N,3), got {state.pos.shape}")
    if state.vel.shape != (n, 3):
        raise ValueError(f"vel must be (N,3), got {state.vel.shape}")
    if state.acc.shape != (n, 3):
        raise ValueError(f"acc must be (N,3), got {state.acc.shape}")
    if state.mass.shape != (n,):
        raise ValueError(f"mass must be (N,), got {state.mass.shape}")
