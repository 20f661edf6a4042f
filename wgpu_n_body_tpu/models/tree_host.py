"""Hybrid Barnes-Hut backend: host (C++) tree build + device theta-walk.

This mirrors the reference's actual architecture — TreeSim builds the
octree on the CPU and dispatches the walk to the accelerator every step
(src/sims/tree.rs:262-353) — as a secondary backend. The pure-device
TreeSim is the production path (zero host round-trips); TreeSimHost exists
for architectural parity, as an independent cross-check of the device tree
build, and for hosts with strong CPUs attached to small accelerators.

Per step: device->host positions, native BFS build + DFS sort
(native/octree.cpp), host->device padded DFS arena, jitted walk+leapfrog.
The arena is padded to the static 4N cap so the jitted step compiles once.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_n_body_tpu.models.base import Simulator, StepFn
from wgpu_n_body_tpu.native.build import build_host_tree, native_available
from wgpu_n_body_tpu.ops.integrate import leapfrog_step
from wgpu_n_body_tpu.ops.tree_build import TreeArrays
from wgpu_n_body_tpu.ops.tree_walk import tree_forces
from wgpu_n_body_tpu.params import ParticleState, SimParams, TreeParams


@functools.lru_cache(maxsize=None)
def _walk_step(params: SimParams, tp: TreeParams, donate: bool) -> StepFn:
    def step(state: ParticleState, tree: TreeArrays) -> ParticleState:
        def force(pos_new, pos_old, mass):
            return tree_forces(pos_new, pos_old, mass, tree, params, tp)

        return leapfrog_step(state, params, force)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class TreeSimHost(Simulator):
    """CPU-build / device-walk Barnes-Hut (reference-architecture parity).

    The native builder subdivides to singleton leaves (exactly
    tree.rs:506-540), so this backend requires ``leaf_bucket=1`` and
    rejects anything else rather than silently overriding the caller.
    """

    def __init__(self, sim_params: SimParams, add_params: TreeParams | None = None):
        super().__init__(sim_params)
        self.add_params = add_params or dataclasses.replace(
            TreeParams(), leaf_bucket=1
        )
        if self.add_params.leaf_bucket != 1:
            raise ValueError(
                "TreeSimHost builds singleton leaves (reference parity); "
                f"pass leaf_bucket=1, got {self.add_params.leaf_bucket}"
            )
        if not native_available():
            raise RuntimeError(
                "TreeSimHost requires the native octree builder (g++)"
            )

    def step_fn(self) -> StepFn:
        raise NotImplementedError(
            "TreeSimHost steps cross the host boundary and cannot be traced; "
            "use make_step"
        )

    def make_step(self, donate: bool = True) -> StepFn:
        params = self.sim_params
        tp = self.add_params
        cap = tp.capacity(params.particle_num)
        walk = _walk_step(params, tp, donate)

        def step(state: ParticleState) -> ParticleState:
            pos = np.asarray(state.pos)
            mass = np.asarray(state.mass)
            host = build_host_tree(pos, mass, tp.effective_capacity_factor)
            m = host.nodes_f32.shape[0] - 1
            if m > cap:
                raise RuntimeError(f"host tree {m} nodes exceeds cap {cap}")
            nodes = np.zeros((cap + 1, 8), np.float32)
            nodes[:m] = host.nodes_f32[:m]
            nodes[cap] = host.nodes_f32[m]  # sentinel row
            skip = np.full((cap + 1,), cap, np.int32)
            skip[:m] = host.skip[:m]
            n = self.sim_params.particle_num
            first = np.full((cap + 1,), n, np.int32)
            first[:m] = host.first[:m]
            count = np.zeros((cap + 1,), np.int32)
            count[:m] = host.count[:m]
            tree = TreeArrays(
                nodes_f32=jnp.asarray(nodes),
                skip=jnp.asarray(skip),
                first=jnp.asarray(first),
                count=jnp.asarray(count),
                num_nodes=jnp.asarray(m, jnp.int32),
                root_width=jnp.asarray(host.root_width, jnp.float32),
                overflowed=jnp.asarray(False),
            )
            order = host.order
            sorted_state = ParticleState(
                pos=state.pos[order],
                vel=state.vel[order],
                acc=state.acc[order],
                mass=state.mass[order],
            )
            return walk(sorted_state, tree)

        return step
