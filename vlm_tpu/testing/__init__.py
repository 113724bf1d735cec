"""Test/benchmark fixtures: tiny random-weight HF reference models.

Used by the cross-implementation parity suite (tests/test_hf_parity.py) and
the measured-baseline script (scripts/measure_reference_baseline.py). Imports
torch/transformers lazily — the core framework never depends on them.
"""

from .hf_tiny import (HF_BUILDERS, IMAGE_TOKEN, build_hf_blip2,
                      build_hf_llava, build_hf_paligemma, hf_text_ids,
                      rand_pixels)

__all__ = [
    "HF_BUILDERS", "IMAGE_TOKEN", "build_hf_blip2", "build_hf_llava",
    "build_hf_paligemma", "hf_text_ids", "rand_pixels",
]
