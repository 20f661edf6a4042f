"""Headline benchmark: naive all-pairs pairwise interactions/sec, one chip.

Prints ONE JSON line. Baseline target (BASELINE.json): 1e11 pairs/s/chip.

Timing methodology: dependency-chained donated steps with a hard sync
(host transfer of a derived scalar) — plain block_until_ready under-reports
on the tunneled TPU platform (see utils/profiling.hard_sync).
"""

from __future__ import annotations

import json
import time

N = 262_144  # BASELINE.json config 2
REPS = 5
BASELINE_PAIRS_PER_SEC = 1e11


def main() -> None:
    import os

    import jax

    # persistent compile cache (the CLI enables the same one): the naive
    # kernel's remote compile is ~10 min cold on the axon tunnel, ~0 warm
    cache = os.path.expanduser("~/.cache/wgpu_n_body_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wgpu_n_body_tpu.inits import uniform_init
    from wgpu_n_body_tpu.models.naive import NaiveSim
    from wgpu_n_body_tpu.params import NaiveParams, SimParams
    from wgpu_n_body_tpu.utils.profiling import hard_sync

    params = SimParams(particle_num=N, g=1e-6)
    sim = NaiveSim(params, NaiveParams())
    state = sim.init_state(jax.random.key(0), uniform_init)
    step = sim.make_step(donate=True)

    state = step(state)  # compile + warmup
    hard_sync(state.pos)
    t0 = time.perf_counter()
    for _ in range(REPS):
        state = step(state)
    hard_sync(state.pos)
    dt = (time.perf_counter() - t0) / REPS

    pairs_per_sec = N * N / dt
    print(
        json.dumps(
            {
                "metric": f"naive_pairwise_interactions_per_sec_n{N}",
                "value": pairs_per_sec,
                "unit": "pairs/s",
                "vs_baseline": pairs_per_sec / BASELINE_PAIRS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
