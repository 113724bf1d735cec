"""vlm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-language model framework.

Capabilities mirror andrealb022/Vision-Language-Model-Framework (see SURVEY.md):
zero-shot VLM evaluation with structured text→label parsing, and a
linear-probing subsystem over frozen vision encoders — redesigned TPU-first:

- fused, batched image preprocessing feeding device-resident batches
  (replaces per-image PIL + HF AutoProcessor work),
- flax ViT encoders (CLIP-L / SigLIP / EVA-ViT), projectors (MLP / linear /
  Q-Former) and LLM decoders (LLaMA / OPT / Gemma families) running as jitted
  forward passes,
- KV-cached generation via ``lax.while_loop`` with slot-based continuous
  batching (replaces the reference's per-image ``model.generate`` Python loop),
- SPMD parallelism over a ``jax.sharding.Mesh`` (data/model axes) instead of
  ``device_map="auto"``,
- Pallas kernels for the hot ops (flash attention, quantized matmul, image
  normalization).
"""

__version__ = "0.1.0"
