"""Generation layer: KV-cached batched decode + continuous batching."""

from .batcher import ContinuousBatcher
from .decode import GenerationEngine, GenerationResult, build_prompt_ids

__all__ = ["ContinuousBatcher", "GenerationEngine", "GenerationResult",
           "build_prompt_ids"]
