"""Dtype policy: maps the reference's quantization strings to TPU-native
numerics.

The reference exposes ``fp32 | fp16 | 8bit | 4bit`` through bitsandbytes CUDA
kernels (`/root/reference/models/base_model.py:76-100`). On TPU the
capability-equivalent policy is (SURVEY.md §7 "Quantization parity"):

- ``fp32``  → float32 params + compute;
- ``fp16``/``bf16`` → bfloat16 params, bfloat16 compute (fp16 has no TPU
  advantage and a narrower exponent; bf16 is the TPU-native half precision —
  documented deviation);
- ``8bit``  → int8 per-channel symmetric weight quantization with bf16
  activations (Pallas dequant-matmul, `vlm_tpu.ops.quant_matmul`);
- ``4bit``  → int4 group-wise weight quantization (packed, per-group scales),
  bf16 compute — the nf4 analogue.

Matmul accumulation is always float32 (``preferred_element_type``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

QUANT_MODES = ("fp32", "fp16", "bf16", "8bit", "4bit")


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Parameter / compute / accumulation dtypes for one quantization mode."""
    name: str
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    quantized_bits: int = 0       # 0 = no integer weight quantization

    @property
    def is_quantized(self) -> bool:
        return self.quantized_bits > 0


def policy_for(quantization: str | None) -> DTypePolicy:
    q = (quantization or "fp32").lower()
    if q == "fp32":
        return DTypePolicy("fp32", jnp.float32, jnp.float32)
    if q in ("fp16", "bf16"):
        return DTypePolicy("bf16", jnp.bfloat16, jnp.bfloat16)
    if q == "8bit":
        return DTypePolicy("8bit", jnp.bfloat16, jnp.bfloat16, quantized_bits=8)
    if q == "4bit":
        return DTypePolicy("4bit", jnp.bfloat16, jnp.bfloat16, quantized_bits=4)
    raise ValueError(
        f"Unknown quantization {quantization!r}; allowed: {QUANT_MODES}")
