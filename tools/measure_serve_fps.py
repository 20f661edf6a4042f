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
    ap.add_argument(
        "--prof", action="store_true",
        help="phase attribution mode (VERDICT r4 weak #3): run each "
        "frame SERIALIZED with a sync after every phase (tier-1 raster, "
        "tier-2/3 passes, blend, step, fetch+png) — the sum exceeds the "
        "pipelined frame time by design; reports per-phase p50s and "
        "tier-3 chunk counts instead of fps",
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

    if args.prof:
        import numpy as _np

        from wgpu_n_body_tpu.runners.renderer import (
            _MEDIUM_CAP,
            png_bytes,
            raster_blend_u8,
            raster_dispatch,
        )
        from wgpu_n_body_tpu.utils.profiling import hard_sync

        def sync_all(xs):
            for x in xs:
                if hasattr(x, "block_until_ready"):
                    hard_sync(x)

        phases = {k: [] for k in
                  ("t1", "t23", "blend", "step", "fetch_png")}
        chunks = []
        for _ in range(args.frames):
            viewer.apply_input(args.keys)
            t = time.perf_counter()
            raster = raster_dispatch(
                viewer.runner.state.pos, viewer.camera, viewer.width,
                viewer.height, footprint=viewer.footprint,
                window=viewer.window,
            )
            sync_all(raster)
            t1 = time.perf_counter(); phases["t1"].append(t1 - t)
            pending, med, speculated, nb = viewer._resolve_tiers(raster)
            sync_all(pending)
            t2 = time.perf_counter(); phases["t23"].append(t2 - t1)
            blended = viewer._dispatch_blend(pending)
            if blended is not None:
                hard_sync(blended)
            t3 = time.perf_counter(); phases["blend"].append(t3 - t2)
            viewer.runner.state = viewer.runner._step(viewer.runner.state)
            viewer.runner.step_num += 1
            hard_sync(viewer.runner.state.pos)
            t4 = time.perf_counter(); phases["step"].append(t4 - t3)
            if speculated:
                img = viewer._verify_speculation(
                    raster, pending, med, blended
                )
            else:
                img = (
                    _np.asarray(blended)
                    if blended is not None
                    else raster_blend_u8(pending, viewer.alpha)
                )
                viewer._spec_t2 = 0 < nb <= _MEDIUM_CAP
                viewer._spec_t3_chunks = (
                    max(0, len(pending) - 2) if viewer._spec_t2 else 0
                )
            png_bytes(img, level=viewer.png_level)
            t5 = time.perf_counter(); phases["fetch_png"].append(t5 - t4)
            chunks.append(viewer._spec_t3_chunks)
        p50 = lambda xs: round(sorted(xs)[len(xs) // 2] * 1e3, 2)
        rec = {
            "tag": args.tag, "mode": "prof", "keys": args.keys,
            "window": args.window, "n": args.n, "frames": args.frames,
            "p50_ms": {k: p50(v) for k, v in phases.items()},
            "max_ms": {
                k: round(max(v) * 1e3, 2) for k, v in phases.items()
            },
            "t3_chunks_max": max(chunks), "t3_chunks_p50":
                sorted(chunks)[len(chunks) // 2],
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec))
        return 0
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
