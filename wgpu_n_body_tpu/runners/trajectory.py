"""Trajectory dump / replay.

New subsystem (the reference's only state-export path is the mappable
read-back of the particle buffer, src/sims/tree.rs:379-403; SURVEY.md §5
calls for a real trajectory dump). Frames are stored as one .npy per dump
step in a directory plus a meta.json manifest — streaming-friendly (no
full-run buffer in memory) and trivially seekable for the renderer.
"""

from __future__ import annotations

import json
import os

import numpy as np

from wgpu_n_body_tpu.params import ParticleState


class TrajectoryWriter:
    """Writes position (and optionally velocity) frames under ``root``."""

    def __init__(
        self, root: str, save_velocity: bool = False, meta: dict | None = None
    ):
        self.root = root
        self.save_velocity = save_velocity
        self.steps: list[int] = []
        self._meta = dict(meta or {})
        os.makedirs(root, exist_ok=True)

    def append(self, state: ParticleState, step: int) -> None:
        np.save(os.path.join(self.root, f"pos_{step:08d}.npy"), np.asarray(state.pos))
        if self.save_velocity:
            np.save(
                os.path.join(self.root, f"vel_{step:08d}.npy"), np.asarray(state.vel)
            )
        self.steps.append(int(step))
        self._flush_meta()

    def _flush_meta(self) -> None:
        manifest = {
            "steps": self.steps,
            "save_velocity": self.save_velocity,
            **self._meta,
        }
        tmp = os.path.join(self.root, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.root, "meta.json"))


class TrajectoryReader:
    """Iterates frames written by TrajectoryWriter."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            self.meta = json.load(f)
        self.steps: list[int] = self.meta["steps"]

    def __len__(self) -> int:
        return len(self.steps)

    def positions(self, i: int) -> np.ndarray:
        step = self.steps[i]
        return np.load(os.path.join(self.root, f"pos_{step:08d}.npy"))

    def __iter__(self):
        for i in range(len(self)):
            yield self.steps[i], self.positions(i)
