"""Step timing + profiler scopes.

The reference prints per-step wall-clock from the headless binary
(src/bin/headless.rs:30-32) and labels GPU command regions with debug
groups (naive.rs:151, tree.rs:341). TPU equivalents: a host StepTimer for
the driver loop, and ``jax.profiler`` trace annotations where the debug
groups were.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


def hard_sync(pytree) -> None:
    """Force true device completion of ``pytree``.

    ``jax.block_until_ready`` under-reports on tunneled platforms (the
    experimental "axon" TPU transport returns before compute finishes —
    measured: a 12 ms step "blocked" in 130 us). Transferring a derived
    scalar to host cannot complete before every producing op has run, so
    it is a reliable fence on every platform at ~4 B of traffic.
    """
    leaf = jax.tree_util.tree_leaves(pytree)[0]
    np.asarray(jax.numpy.sum(leaf))


@dataclass
class StepTimer:
    """Accumulates per-step wall times (synchronized via hard_sync)."""

    times_s: list = field(default_factory=list)

    @contextlib.contextmanager
    def step(self, result_to_sync=None):
        t0 = time.perf_counter()
        box = {}
        yield box
        sync = box.get("sync", result_to_sync)
        if sync is not None:
            hard_sync(sync)
        self.times_s.append(time.perf_counter() - t0)

    @property
    def last_us(self) -> float:
        return self.times_s[-1] * 1e6

    def mean_s(self, skip_first: int = 1) -> float:
        ts = self.times_s[skip_first:] or self.times_s
        return sum(ts) / len(ts)


def trace_scope(name: str):
    """Named profiler region (analog of wgpu push_debug_group)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace around a block (view with tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
