"""Device-side compute ops: forces, integration, octree build/walk."""

from wgpu_n_body_tpu.ops.integrate import leapfrog_step
from wgpu_n_body_tpu.ops.naive_ref import naive_forces_dense, naive_forces_ref

__all__ = [
    "leapfrog_step",
    "naive_forces_dense",
    "naive_forces_ref",
]
