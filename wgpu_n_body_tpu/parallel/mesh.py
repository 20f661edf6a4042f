"""Device mesh + state sharding helpers.

Multi-host readiness (v5e pod / multi-slice DCN): call
``init_distributed()`` once per process before any device use, then
``make_mesh()`` — ``jax.devices()`` returns the GLOBAL device list after
``jax.distributed.initialize``, so the 1-D particle mesh spans every
chip in the job with no other code changes. Collective layout notes for
pod scale: the LET schedule's heavy collective is one all_to_all of
~(P * let_cap * 36 B) per chip, and the replicated/naive schedules use
tiled all_gather / a ppermute ring — all ride ICI within a slice;
across slices XLA routes them over DCN, where the LET schedule is the
right choice (its per-chip bytes shrink as ownership regions separate,
while all_gather's grow with N). Unverifiable in this environment
(single chip behind a tunnel) — plumbing + docs only, no perf claims.
"""

from __future__ import annotations

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wgpu_n_body_tpu.params import ParticleState

PARTICLE_AXIS = "particles"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` with TPU-pod
    auto-detection (no args needed on Cloud TPU — the runtime publishes
    coordinator/process topology). Must run before first device use in
    EVERY process; afterwards ``make_mesh()`` spans the whole job.
    No-op if the distributed service is already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized: idempotent entry
        if "already initialized" not in str(e):
            raise


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the particle axis (ICI ring on real hardware; the
    global device list when ``init_distributed`` ran first)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(
        mesh_utils.create_device_mesh((len(devices),), devices=devices),
        (PARTICLE_AXIS,),
    )


def state_sharding(mesh: Mesh) -> ParticleState:
    """NamedShardings splitting every array's particle dim over the mesh."""
    row = NamedSharding(mesh, P(PARTICLE_AXIS))
    return ParticleState(pos=row, vel=row, acc=row, mass=row)


def shard_state(state: ParticleState, mesh: Mesh) -> ParticleState:
    """Place a (replicated/host) state onto the mesh, sharded by particle.

    N must be divisible by the mesh size (pad upstream with zero-mass
    sentinel particles if needed — zero mass exerts no force).
    """
    n = state.n
    size = mesh.devices.size
    if n % size != 0:
        raise ValueError(f"N={n} not divisible by mesh size {size}")
    sh = state_sharding(mesh)
    return jax.tree_util.tree_map(jax.device_put, state, sh)
