"""Drivers: headless step loop, trajectory IO, offline + online renderers."""

from wgpu_n_body_tpu.runners.headless import OfflineHeadless
from wgpu_n_body_tpu.runners.online import OnlineViewer
from wgpu_n_body_tpu.runners.trajectory import TrajectoryReader, TrajectoryWriter

__all__ = [
    "OfflineHeadless",
    "OnlineViewer",
    "TrajectoryWriter",
    "TrajectoryReader",
]
