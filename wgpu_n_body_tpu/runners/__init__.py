"""Drivers: headless step loop, trajectory IO, offline renderer, bench."""

from wgpu_n_body_tpu.runners.headless import OfflineHeadless
from wgpu_n_body_tpu.runners.trajectory import TrajectoryReader, TrajectoryWriter

__all__ = ["OfflineHeadless", "TrajectoryWriter", "TrajectoryReader"]
