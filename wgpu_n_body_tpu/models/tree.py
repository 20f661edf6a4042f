"""Barnes-Hut octree backend (reference: src/sims/tree.rs + tree.wgsl).

The reference's hybrid pipeline per step (tree.rs:262-353):

    map GPU buffers -> host builds octree (BFS, rayon/bumpalo/SliceAlloc)
    -> host DFS-sorts particles -> unmap/copy -> GPU theta-walk dispatch

crosses host<->device five times per step. Here the whole step is ONE
jitted device program with zero host round-trips:

    morton sort (== the reference's DFS particle reorder)
    -> vectorized level build into a DFS arena (ops/tree_build.py)
    -> stackless theta-walk + fused leapfrog (ops/tree_walk.py)

Like the reference, TreeSim reorders particles every step (identity order
is not stable, tree.rs:564-602) and the tree arena holds up to 4N nodes
(tree.rs:188-199).
"""

from __future__ import annotations

import functools

import jax

from wgpu_n_body_tpu.models.base import Simulator, StepFn
from wgpu_n_body_tpu.ops.integrate import leapfrog_step
from wgpu_n_body_tpu.ops.tree_build import build_tree, morton_sort
from wgpu_n_body_tpu.ops.tree_walk import tree_forces
from wgpu_n_body_tpu.ops.tree_walk_group import group_tree_forces
from wgpu_n_body_tpu.params import ParticleState, SimParams, TreeParams


@functools.lru_cache(maxsize=None)
def _tree_step_fn(params: SimParams, tp: TreeParams) -> StepFn:
    def step(state: ParticleState) -> ParticleState:
        # Tree and sort operate on pre-step positions, exactly like the
        # reference (encode builds/sorts from the src buffer, tree.rs:271-297,
        # before the compute dispatch integrates). Trace scopes mirror the
        # reference's GPU debug groups (tree.rs:315,341).
        with jax.named_scope("morton_sort"):
            state_sorted, bound, keys = morton_sort(state, tp.max_depth)
        with jax.named_scope("tree_build"):
            tree = build_tree(state_sorted, keys, bound, tp)

        if tp.walk == "group":

            def force(pos_new, pos_old, mass):
                with jax.named_scope("theta_walk"):
                    acc, _stats = group_tree_forces(
                        pos_new, pos_old, mass, tree, keys, params, tp
                    )
                return acc

        elif tp.walk == "per_particle":

            def force(pos_new, pos_old, mass):
                with jax.named_scope("theta_walk"):
                    return tree_forces(
                        pos_new, pos_old, mass, tree, params, tp
                    )

        else:
            raise ValueError(f"unknown walk {tp.walk!r}")

        return leapfrog_step(state_sorted, params, force)

    return step


@functools.lru_cache(maxsize=None)
def _compiled_tree_step(params: SimParams, tp: TreeParams, donate: bool) -> StepFn:
    return jax.jit(_tree_step_fn(params, tp), donate_argnums=(0,) if donate else ())


@functools.lru_cache(maxsize=None)
def _compiled_diagnose(params: SimParams, tp: TreeParams):
    """Cached at module level keyed on params so repeated diagnose()/
    check_overflow() calls reuse one compilation."""

    def diag(st):
        ss, bound, keys = morton_sort(st, tp.max_depth)
        tree = build_tree(ss, keys, bound, tp)
        _, stats = group_tree_forces(
            ss.pos, ss.pos, ss.mass, tree, keys, params, tp
        )
        return tree.num_nodes, tree.overflowed, stats.deferred

    return jax.jit(diag)


@functools.lru_cache(maxsize=None)
def _compiled_overflow_check(params: SimParams, tp: TreeParams):
    def check(st):
        ss, bound, keys = morton_sort(st, tp.max_depth)
        return build_tree(ss, keys, bound, tp).overflowed

    return jax.jit(check)


class TreeSim(Simulator):
    """Barnes-Hut O(N log N) backend, fully device-resident."""

    def __init__(self, sim_params: SimParams, add_params: TreeParams | None = None):
        super().__init__(sim_params)
        # Reference warns and defaults theta=0.75 when params are missing
        # (tree.rs:42-51); here the default lives in TreeParams itself.
        self.add_params = add_params or TreeParams()

    def step_fn(self) -> StepFn:
        return _tree_step_fn(self.sim_params, self.add_params)

    def make_step(self, donate: bool = True) -> StepFn:
        return _compiled_tree_step(self.sim_params, self.add_params, donate)

    def diagnose(self, state: ParticleState) -> dict:
        """Tree health for the current state: node count vs arena capacity
        and how many particles the group walk deferred to the fallback.
        Cheap enough for periodic logging; not part of the step."""
        params, tp = self.sim_params, self.add_params
        num_nodes, overflowed, deferred = _compiled_diagnose(params, tp)(state)
        cap = tp.capacity(params.particle_num)
        return {
            "num_nodes": int(num_nodes),
            "node_capacity": cap,
            "overflowed": bool(overflowed),
            "walk_deferred": int(deferred),
        }

    def check_overflow(self, state: ParticleState) -> None:
        """Raise if the arena overflows for this state (forces would be
        silently truncated). One sort+build, no walk — cheap enough for
        the runner to call once at startup and periodically after.
        Reference cap semantics: 4N octants (tree.rs:188-199)."""
        if bool(_compiled_overflow_check(self.sim_params, self.add_params)(state)):
            cap = self.add_params.capacity(self.sim_params.particle_num)
            raise RuntimeError(
                f"octree arena overflow (cap {cap} nodes): forces are "
                "truncated; raise node_capacity_factor or leaf_bucket"
            )
