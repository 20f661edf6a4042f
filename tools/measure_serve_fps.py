"""End-to-end serve fps at the reference visualizer demo scene.

VERDICT r2 missing #2: the reference visualizer runs N=100k at window
rate; our serve path had a host NumPy triangle loop as its frame-rate
ceiling and no measured fps anywhere. This drives OnlineViewer.tick()
exactly as the browser does (held keys, focus, PNG out) for --frames
frames and prints one JSON line with the steady-state fps.

  python tools/measure_serve_fps.py            # TreeSim N=100k disc
  python tools/measure_serve_fps.py --sim naive
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--sim", choices=["tree", "naive"], default="tree")
    ap.add_argument("--theta", type=float, default=0.75)
    ap.add_argument("--init", choices=["uniform", "disc", "spherical"],
                    default="disc")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--tag", type=str, default="")
    ap.add_argument(
        "--keys", type=str, default="w",
        help="held keys per tick ('' = static camera; 'w' flies toward "
        "the scene and stresses the medium-footprint raster tier)",
    )
    ap.add_argument(
        "--window", type=int, default=4,
        help="tier-1 device raster window (px); spans past window-1 "
        "escalate to tier 2",
    )
    ap.add_argument(
        "--no-warmup", action="store_true",
        help="skip viewer.warmup() (A/B the in-process cost of eagerly "
        "compiling tiers 2/3 before measurement)",
    )
    args = ap.parse_args()

    cache = os.path.expanduser("~/.cache/wgpu_n_body_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wgpu_n_body_tpu import inits
    from wgpu_n_body_tpu.params import SimParams, TreeParams
    from wgpu_n_body_tpu.runners.online import OnlineViewer

    init_fn = {
        "uniform": inits.uniform_init,
        "disc": inits.disc_init,
        "spherical": inits.spherical_init,
    }[args.init]
    # reference visualize defaults: g=1e-5, dt=0.0016 (visualize.rs:26-31)
    sp = SimParams(particle_num=args.n, g=1e-5, dt=0.0016)
    if args.sim == "tree":
        from wgpu_n_body_tpu.models.tree import TreeSim

        sim = TreeSim(sp, TreeParams(theta=args.theta))
    else:
        from wgpu_n_body_tpu.models.naive import NaiveSim

        sim = NaiveSim(sp)

    viewer = OnlineViewer(
        sim, init_fn, width=args.width, height=args.height,
        window=args.window,
    )
    if not args.no_warmup:
        viewer.warmup()  # compile the step + ALL raster tiers up front
    for _ in range(args.warmup):
        viewer.tick(keys=args.keys, focused=True)
    t0 = time.perf_counter()
    png_len = 0
    frame_ms = []
    for _ in range(args.frames):
        tf = time.perf_counter()
        png_len = len(viewer.tick(keys=args.keys, focused=True))
        frame_ms.append((time.perf_counter() - tf) * 1e3)
    dt = time.perf_counter() - t0
    stats = viewer.stats()
    rec = {
        "tag": args.tag,
        "keys": args.keys,
        "window": args.window,
        "warmed": not args.no_warmup,
        "frame_ms_p50": round(sorted(frame_ms)[len(frame_ms) // 2], 1),
        "frame_ms_max": round(max(frame_ms), 1),
        "sim": args.sim,
        "n": args.n,
        "init": args.init,
        "width": args.width,
        "height": args.height,
        "frames": args.frames,
        "fps": round(args.frames / dt, 2),
        "ms_per_frame": round(dt / args.frames * 1e3, 2),
        "last_step_ms": stats["last_step_ms"],
        "png_bytes": png_len,
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
