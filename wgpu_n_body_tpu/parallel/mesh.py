"""Device mesh + state sharding helpers."""

from __future__ import annotations

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wgpu_n_body_tpu.params import ParticleState

PARTICLE_AXIS = "particles"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the particle axis (ICI ring on real hardware)."""
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
