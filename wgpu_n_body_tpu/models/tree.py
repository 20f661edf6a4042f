"""Barnes-Hut octree backend (reference: src/sims/tree.rs + tree.wgsl).

Placeholder — full device-resident Morton-sort build + theta-walk lands in
the next milestone.
"""

from __future__ import annotations

from wgpu_n_body_tpu.models.base import Simulator, StepFn
from wgpu_n_body_tpu.params import SimParams, TreeParams


class TreeSim(Simulator):
    def __init__(self, sim_params: SimParams, add_params: TreeParams | None = None):
        super().__init__(sim_params)
        self.add_params = add_params or TreeParams()

    def step_fn(self) -> StepFn:
        raise NotImplementedError("TreeSim lands in the next milestone")
