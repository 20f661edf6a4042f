"""A/B the naive all-pairs Pallas kernel variants on the real chip.

Usage (fresh process per variant — in-process later-jit readings drift):
    PYTHONPATH="/root/repo:$PYTHONPATH" python tools/measure_naive.py --mxu 0
    PYTHONPATH="/root/repo:$PYTHONPATH" python tools/measure_naive.py --mxu 1

Measures the BARE force kernel (dependency-chained, donated inputs are not
needed — the kernel is out-of-place) and the full NaiveSim step, min of
--reps, hard-synced (block_until_ready under-reports on the tunnel).
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--mxu", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-i", type=int, default=256)
    ap.add_argument("--tile-j", type=int, default=1024)
    ap.add_argument("--kernel-only", action="store_true")
    ap.add_argument(
        "--recip-newton", type=int, default=0,
        help="probe: replace the kernel's divide with rsqrt^2 + one "
        "Newton step (naive_pallas._RECIP_NEWTON; fresh process per "
        "variant — measurement-only, not reference-exact)",
    )
    args = ap.parse_args()

    import jax

    from wgpu_n_body_tpu.inits import uniform_init
    from wgpu_n_body_tpu.ops import naive_pallas
    from wgpu_n_body_tpu.params import NaiveParams, SimParams
    from wgpu_n_body_tpu.utils.profiling import hard_sync

    if args.recip_newton:
        naive_pallas._RECIP_NEWTON = True

    N = args.n
    params = SimParams(particle_num=N, g=1e-6)
    key = jax.random.key(0)
    st = uniform_init(key, params)
    pos, vel, mass = st.pos, st.vel, st.mass
    pos_new = pos + params.dt * vel

    def kern(pn, po, m):
        return naive_pallas.naive_forces_pallas(
            pn,
            po,
            m,
            params,
            tile_i=args.tile_i,
            tile_j=args.tile_j,
            mxu=bool(args.mxu),
        )

    # bare kernel: dependency-chain acc back into pos_new
    acc = kern(pos_new, pos, mass)
    hard_sync(acc)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        acc = kern(pos_new + 0.0 * acc, pos, mass)
        hard_sync(acc)
        best = min(best, time.perf_counter() - t0)
    print(
        f"kernel mxu={args.mxu} tiles=({args.tile_i},{args.tile_j}) "
        f"N={N}: {best*1e3:.2f} ms  {N*N/best:.3e} pairs/s"
    )
    if args.kernel_only:
        return

    # Full step via NaiveSim with the SAME variant/tiles as the kernel
    # bench above (ADVICE r4: _naive_step_fn passes mxu/tiles explicitly
    # from NaiveParams, so flipping naive_pallas._USE_MXU here was a
    # no-op that mislabeled the VPU step as MXU). NOTE: this runs in the
    # same process right after the kernel loop — within-process later
    # jits read up to 1.5x slow (CLAUDE.md), so for kernel-vs-step
    # comparisons run the step alone in a fresh process (without
    # --kernel-only's preceding loop). min-of-reps with per-rep
    # hard_sync, matching the fused-step measurement rules.
    from wgpu_n_body_tpu.models.naive import NaiveSim

    sim = NaiveSim(
        params,
        NaiveParams(
            tile_i=args.tile_i, tile_j=args.tile_j, mxu=bool(args.mxu)
        ),
    )
    state = sim.init_state(jax.random.key(0), uniform_init)
    step = sim.make_step(donate=True)
    state = step(state)
    hard_sync(state.pos)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state = step(state)
        hard_sync(state.pos)
        best = min(best, time.perf_counter() - t0)
    print(
        f"step   mxu={args.mxu} tiles=({args.tile_i},{args.tile_j}) "
        f"N={N}: {best*1e3:.2f} ms  {N*N/best:.3e} pairs/s"
    )


if __name__ == "__main__":
    main()
