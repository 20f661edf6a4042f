"""Price the r3-stretch phase-B row-packing lever WITHOUT building it.

Runs one group walk with tree_walk_group._DEBUG_MERGE_STAT, which
replaces force evaluation with the post-compaction adjacency statistic
(see the flag's comment for the column meanings and the decision law).
Prints one JSON line with the merge fractions.

Decision thresholds (measured gather/VPU laws, CLAUDE.md + PERF.md r2):
  aligned/real > 0.342  -> packed 16-col gather is cheaper than baseline
  aligned/real >= ~0.5  -> VPU dummy-half tax also amortized (quad-row
                           wash said dummy points cost ~+17% VPU)
Below 0.342 the lever is DEAD with zero further chip time spent.

Usage: python tools/probe_merge_stat.py --n 2000000 --theta 0.5 --init disc
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000000)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument(
        "--init", choices=["uniform", "disc", "spherical"], default="disc"
    )
    ap.add_argument("--g", type=float, default=1e-5)
    args = ap.parse_args()

    cache = os.path.expanduser("~/.cache/wgpu_n_body_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import wgpu_n_body_tpu.ops.tree_walk_group as twg

    twg._DEBUG_MERGE_STAT = True

    from wgpu_n_body_tpu import inits
    from wgpu_n_body_tpu.ops.tree_build import build_tree, morton_sort
    from wgpu_n_body_tpu.params import SimParams, TreeParams

    init_fn = {
        "uniform": inits.uniform_init,
        "disc": inits.disc_init,
        "spherical": inits.spherical_init,
    }[args.init]
    sp = SimParams(particle_num=args.n, g=args.g)
    tp = TreeParams(theta=args.theta)
    state = init_fn(jax.random.key(0), sp)

    def stat(st):
        ss, bound, keys = morton_sort(st, tp.max_depth)
        tree = build_tree(ss, keys, bound, tp)
        acc, _ = twg.group_tree_forces(
            ss.pos, ss.pos, ss.mass, tree, keys, sp, tp
        )
        return jnp.sum(acc, axis=0)  # [real, aligned, adjacent]

    real, aligned, adjacent = (float(v) for v in jax.jit(stat)(state))
    out = {
        "probe": "merge_stat",
        "n": args.n,
        "theta": args.theta,
        "init": args.init,
        "rows_real": real,
        "pairs_aligned": aligned,
        "pairs_adjacent": adjacent,
        "frac_aligned": aligned / max(real, 1.0),
        "frac_adjacent": adjacent / max(real, 1.0),
        "gather_win": aligned / max(real, 1.0) > 0.342,
        "vpu_amortized": aligned / max(real, 1.0) >= 0.5,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
