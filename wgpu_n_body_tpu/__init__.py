"""wgpu_n_body_tpu — a TPU-native N-body simulation framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the Rust/wgpu
reference `arpan-dhatt/wgpu-n-body`:

- ``params``      core value types (reference: src/sims/mod.rs:9-71)
- ``inits``       initial-condition generators (reference: src/inits.rs)
- ``models``      simulation backends: naive O(N^2) and Barnes-Hut octree
                  (reference: src/sims/naive.rs, src/sims/tree.rs)
- ``ops``         device kernels: Pallas all-pairs force, Morton octree
                  build, theta-walk, leapfrog integration
                  (reference: src/sims/shaders/*.wgsl, src/sims/tree.rs)
- ``parallel``    multi-chip sharding (mesh, shard_map ring all-pairs) —
                  no reference equivalent (single-GPU upstream)
- ``runners``     step-loop drivers, trajectory IO, offline renderer,
                  benchmark harness (reference: src/runners/, benches/)
- ``utils``       profiling, checkpointing
- ``native``      C++ host-side octree builder (parity oracle / hybrid
                  backend; reference: src/sims/tree.rs:417-602 +
                  src/utils/slice_alloc.rs)

State is a pytree of SoA ``jnp`` arrays; every step is a jitted, buffer-
donated pure function (ping-pong buffers of the reference become XLA
input-output aliasing); state stays device-resident with zero per-step
host copies (the reference README's shared-memory roadmap item).
"""

from wgpu_n_body_tpu.params import (
    SimParams,
    NaiveParams,
    TreeParams,
    ParticleState,
)

__all__ = [
    "SimParams",
    "NaiveParams",
    "TreeParams",
    "ParticleState",
]

__version__ = "0.1.0"
