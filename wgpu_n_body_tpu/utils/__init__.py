"""Host-side utilities: profiling, checkpointing."""

from wgpu_n_body_tpu.utils.profiling import StepTimer
from wgpu_n_body_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["StepTimer", "save_checkpoint", "load_checkpoint"]
