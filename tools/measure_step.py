"""Measure one full tree/naive step config on the current backend.

Fresh-process min-of-REPS with hard_sync + donated buffers (the only
timing discipline that is trustworthy on the axon tunnel — CLAUDE.md).
Prints one JSON line. Run ONE of these at a time against the TPU.

Usage:
  python tools/measure_step.py --n 2000000 --theta 0.5 --init disc
  python tools/measure_step.py --n 32000000 --theta 0.75 --init uniform
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--theta", type=float, default=0.75)
    ap.add_argument("--init", choices=["uniform", "disc", "spherical"], default="uniform")
    ap.add_argument("--sim", choices=["tree", "naive"], default="tree")
    ap.add_argument("--g", type=float, default=1e-6)
    ap.add_argument("--dt", type=float, default=0.016)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tag", type=str, default="")
    ap.add_argument(
        "--flags",
        type=str,
        default="",
        help="comma-separated tree_walk_group debug flag names to set True "
        "(fresh-process per variant, so jit trace reuse is impossible)",
    )
    ap.add_argument(
        "--diagnose",
        action="store_true",
        help="run sim.diagnose(state) after timing (extra compile; reports "
        "walk deferral / overflow so cap sweeps can prove they are safe)",
    )
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="run on the CPU backend (harness smoke tests; the axon TPU "
        "plugin is only disabled via jax.config, not env vars — CLAUDE.md)",
    )
    ap.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="MODULE_ATTR=VALUE",
        help="set a module knob before tracing, e.g. "
        "tree_walk_group._OCTET_UNROLL=16 or tree_build._DEBUG_EMIT_CHUNK="
        "131072 (value parsed as Python literal; fresh process per variant)",
    )
    ap.add_argument(
        "--tree-kw",
        action="append",
        default=[],
        metavar="FIELD=VALUE",
        help="extra TreeParams field override, e.g. leaf_bucket=32 or "
        "walk_tile=128 (value parsed as Python literal)",
    )
    args = ap.parse_args()

    cache = os.path.expanduser("~/.cache/wgpu_n_body_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wgpu_n_body_tpu import inits
    from wgpu_n_body_tpu.params import SimParams, TreeParams
    from wgpu_n_body_tpu.utils.profiling import hard_sync

    if args.flags:
        import wgpu_n_body_tpu.ops.tree_walk_group as twg

        for name in args.flags.split(","):
            if not hasattr(twg, name):
                raise SystemExit(f"unknown debug flag {name!r}")
            setattr(twg, name, True)

    import ast
    import importlib

    for spec in args.set:
        target, _, raw = spec.partition("=")
        mod_name, _, attr = target.rpartition(".")
        if not mod_name:
            raise SystemExit(
                f"module knob {spec!r} needs a module prefix, e.g. "
                "tree_walk_group._OCTET_UNROLL=16"
            )
        # bare names resolve under ops/; fully-qualified module paths
        # (wgpu_n_body_tpu.parallel.let_tree._EXPORT_FANOUT=8) pass through
        try:
            if "." in mod_name:
                mod = importlib.import_module(mod_name)
            else:
                mod = importlib.import_module(
                    f"wgpu_n_body_tpu.ops.{mod_name}"
                )
        except ImportError:
            raise SystemExit(f"unknown module knob {spec!r}")
        if not hasattr(mod, attr):
            raise SystemExit(f"unknown module knob {spec!r}")
        setattr(mod, attr, ast.literal_eval(raw))
    tree_kw = {}
    for spec in args.tree_kw:
        k, _, raw = spec.partition("=")
        tree_kw[k] = ast.literal_eval(raw)

    init_fn = {
        "uniform": inits.uniform_init,
        "disc": inits.disc_init,
        "spherical": inits.spherical_init,
    }[args.init]
    sp = SimParams(particle_num=args.n, g=args.g, dt=args.dt)
    if args.sim == "tree":
        from wgpu_n_body_tpu.models.tree import TreeSim

        sim = TreeSim(sp, TreeParams(theta=args.theta, **tree_kw))
    else:
        from wgpu_n_body_tpu.models.naive import NaiveSim

        sim = NaiveSim(sp)

    state = sim.init_state(jax.random.key(0), init_fn)
    step = sim.make_step(donate=True)
    t0 = time.perf_counter()
    state = step(state)  # compile + warmup
    hard_sync(state.pos)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state = step(state)
        hard_sync(state.pos)
        times.append(time.perf_counter() - t0)

    if args.diagnose and hasattr(sim, "diagnose"):
        diag = {
            k: (v.item() if hasattr(v, "item") else v)
            for k, v in sim.diagnose(state).items()
        }
    else:
        diag = None

    rec = {
        "tag": args.tag,
        "sim": args.sim,
        "n": args.n,
        "theta": args.theta,
        "init": args.init,
        "min_s": min(times),
        "median_s": sorted(times)[len(times) // 2],
        "all_s": [round(t, 4) for t in times],
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    if args.flags:
        rec["flags"] = args.flags
    if args.set:
        rec["set"] = args.set
    if tree_kw:
        rec["tree_kw"] = tree_kw
    if diag is not None:
        rec["diagnose"] = diag
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
