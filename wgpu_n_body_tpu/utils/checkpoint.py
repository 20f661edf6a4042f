"""Checkpoint / resume.

The reference has no checkpointing (state lives only in GPU buffers;
SURVEY.md §5) — this is a new subsystem required by the rebuild's
long-horizon runs (BASELINE.json config 5). Format: a single atomic .npz
holding the SoA state arrays plus a format-versioned JSON meta record
with everything needed to reconstruct the run: step counter, SimParams,
the backend's add-params (theta/engine/caps — TreeParams/NaiveParams),
and the multi-chip schedule (name, let_cap, mesh axis sizes). A resumed
run is bit-identical to an uninterrupted one (tests/test_runners.py),
including sharded LET runs resumed onto an explicit mesh
(tests/test_let.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wgpu_n_body_tpu.params import (
    NaiveParams,
    ParticleState,
    SimParams,
    TreeParams,
)

_FORMAT_VERSION = 2
_ADD_PARAM_KINDS = {"tree": TreeParams, "naive": NaiveParams}


class Checkpoint(NamedTuple):
    """A loaded checkpoint. ``make_sim()`` reconstructs the backend."""

    state: ParticleState
    params: SimParams
    step: int
    add_params: TreeParams | NaiveParams | None
    schedule: dict | None  # {"name", "let_cap", "mesh_axes"} for sharded runs

    def make_sim(self, mesh=None):
        """Rebuild the Simulator this checkpoint was written by.

        Single-chip checkpoints return TreeSim/NaiveSim; sharded ones
        need ``mesh`` (any particle-axis mesh — LET ownership is just a
        contiguous re-slice, and ShardedTreeSim.reshard re-compacts it).
        """
        from wgpu_n_body_tpu.models.naive import NaiveSim
        from wgpu_n_body_tpu.models.tree import TreeSim
        ap = self.add_params
        if self.schedule is not None:
            if mesh is None:
                raise ValueError(
                    f"checkpoint holds a sharded "
                    f"{self.schedule['name']!r} run over mesh axes "
                    f"{self.schedule['mesh_axes']}; pass mesh= to resume"
                )
            from wgpu_n_body_tpu.parallel.sharded_naive import ShardedNaiveSim
            from wgpu_n_body_tpu.parallel.sharded_tree import ShardedTreeSim

            if isinstance(ap, TreeParams) or ap is None:
                return ShardedTreeSim(
                    self.params, mesh, ap,
                    schedule=self.schedule["name"],
                    # missing in pre-auto checkpoints -> None = auto sizing
                    let_cap=self.schedule.get("let_cap"),
                )
            # resume with the recorded communication schedule (physics
            # is schedule-independent; bandwidth behavior is not)
            return ShardedNaiveSim(
                self.params, mesh, ap, schedule=self.schedule["name"]
            )
        if isinstance(ap, NaiveParams):
            return NaiveSim(self.params, ap)
        return TreeSim(self.params, ap)


def _describe_sim(sim) -> tuple[dict | None, dict | None]:
    """(add_params_meta, schedule_meta) for a Simulator, best-effort."""
    ap = getattr(sim, "add_params", None)
    ap_meta = None
    if isinstance(ap, TreeParams):
        ap_meta = {"kind": "tree", **dataclasses.asdict(ap)}
    elif isinstance(ap, NaiveParams):
        ap_meta = {"kind": "naive", **dataclasses.asdict(ap)}
    sched_meta = None
    mesh = getattr(sim, "mesh", None)
    if mesh is not None:
        sched_meta = {
            "name": getattr(sim, "schedule", "replicated"),
            "let_cap": getattr(sim, "let_cap", None),
            "mesh_axes": dict(zip(mesh.axis_names, mesh.devices.shape)),
        }
    return ap_meta, sched_meta


def save_checkpoint(
    path: str,
    state: ParticleState,
    params: SimParams,
    step: int,
    sim=None,
) -> None:
    """Atomically write state+params+step (and, when ``sim`` is given,
    its add-params + multi-chip schedule) to ``path`` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    ap_meta, sched_meta = _describe_sim(sim) if sim is not None else (None, None)
    meta = {
        "version": _FORMAT_VERSION,
        "step": int(step),
        "params": dataclasses.asdict(params),
        "add_params": ap_meta,
        "schedule": sched_meta,
    }
    with open(tmp, "wb") as f:
        np.savez(
            f,
            pos=np.asarray(state.pos),
            vel=np.asarray(state.vel),
            acc=np.asarray(state.acc),
            mass=np.asarray(state.mass),
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        )
    os.replace(tmp, path)


def load_checkpoint(path: str, mesh=None) -> Checkpoint:
    """Load a checkpoint.

    ``mesh``: place the state sharded over an explicit device mesh
    (particle axis, parallel/mesh.py) instead of the default device —
    required to resume multi-chip runs without a host-side reshape.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta["version"] not in (1, _FORMAT_VERSION):
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        arrays = {k: z[k] for k in ("pos", "vel", "acc", "mass")}
    if mesh is not None:
        from wgpu_n_body_tpu.parallel.mesh import state_sharding

        sh = state_sharding(mesh)
        state = ParticleState(
            **{
                k: jax.device_put(v, s)
                for (k, v), s in zip(
                    arrays.items(),
                    [sh.pos, sh.vel, sh.acc, sh.mass],
                )
            }
        )
    else:
        state = ParticleState(**{k: jnp.asarray(v) for k, v in arrays.items()})
    params = SimParams(**meta["params"])
    ap_meta = meta.get("add_params")
    add_params = None
    if ap_meta is not None:
        ap = dict(ap_meta)
        add_params = _ADD_PARAM_KINDS[ap.pop("kind")](**ap)
    return Checkpoint(
        state=state,
        params=params,
        step=meta["step"],
        add_params=add_params,
        schedule=meta.get("schedule"),
    )
