"""Simulation backends (the reference's `sims` module)."""

from wgpu_n_body_tpu.models.base import Simulator
from wgpu_n_body_tpu.models.naive import NaiveSim
from wgpu_n_body_tpu.models.tree import TreeSim

__all__ = ["Simulator", "NaiveSim", "TreeSim"]
