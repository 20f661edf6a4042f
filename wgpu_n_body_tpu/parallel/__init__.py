"""Multi-chip scaling (no reference equivalent — upstream is single-GPU,
SURVEY.md §2's parallelism table).

Particles are sharded over a 1-D device mesh; forces need every source, so
communication is XLA collectives over ICI:

- naive: all_gather the (old) positions+masses, each chip evaluates its
  receiver shard (the SURVEY's "allgather positions over ICI" design), or
  the ppermute ring that streams source shards (ring-attention pattern).
- tree: schedule="replicated" (replicated build, sharded walk, O(N)/chip)
  or schedule="let" (local build + locally-essential pruned-subtree
  exchange over one all_to_all, O(N/P)/chip — the scalable config).
"""

from wgpu_n_body_tpu.parallel.let_tree import let_memory_bytes
from wgpu_n_body_tpu.parallel.mesh import PARTICLE_AXIS, make_mesh, shard_state
from wgpu_n_body_tpu.parallel.sharded_naive import ShardedNaiveSim
from wgpu_n_body_tpu.parallel.sharded_tree import ShardedTreeSim

__all__ = [
    "make_mesh",
    "shard_state",
    "ShardedNaiveSim",
    "ShardedTreeSim",
    "PARTICLE_AXIS",
    "let_memory_bytes",
]
