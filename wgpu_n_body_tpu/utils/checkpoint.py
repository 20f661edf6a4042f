"""Checkpoint / resume.

The reference has no checkpointing (state lives only in GPU buffers;
SURVEY.md §5) — this is a new subsystem required by the rebuild's
long-horizon runs (BASELINE.json config 5). Format: a single .npz holding
the SoA state arrays plus step counter and SimParams fields, so a resumed
run is bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from wgpu_n_body_tpu.params import ParticleState, SimParams

_FORMAT_VERSION = 1


def save_checkpoint(
    path: str, state: ParticleState, params: SimParams, step: int
) -> None:
    """Atomically write state+params+step to ``path`` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    meta = {
        "version": _FORMAT_VERSION,
        "step": int(step),
        "params": dataclasses.asdict(params),
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


def load_checkpoint(path: str) -> tuple[ParticleState, SimParams, int]:
    """Load a checkpoint; returns (state_on_default_device, params, step)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        state = ParticleState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            acc=jnp.asarray(z["acc"]),
            mass=jnp.asarray(z["mass"]),
        )
    params = SimParams(**meta["params"])
    return state, params, meta["step"]
