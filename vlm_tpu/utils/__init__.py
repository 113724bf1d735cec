"""Utilities: profiling/observability, checkpoints, backend selection."""

from .checkpoint import (checkpoint_meta, load_vlm_checkpoint,
                         save_vlm_checkpoint)
from .profiling import ThroughputMeter, annotate, profile_trace

__all__ = ["checkpoint_meta", "load_vlm_checkpoint", "save_vlm_checkpoint",
           "ThroughputMeter", "annotate", "profile_trace"]
