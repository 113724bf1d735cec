"""Shared flax building blocks: activations, norms, dense layers with
tensor-parallel partitioning annotations."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _int8_prefill_mode() -> str:
    """int8 large-m dispatch: "dynamic" (default — llm.int8 activation
    quantization + outlier decomposition on the int8 MXU, the exact scheme
    the reference's ``load_in_8bit`` runs through bitsandbytes), "dequant"
    (one-pass XLA dequant feeding a bf16 matmul — activations never
    quantized, strictly MORE accurate than llm.int8), or "dynamic_noout"
    (int8 MXU without outlier protection — fastest, least accurate). Read
    at trace time.

    Measured on v5e with the XLA-native int8 dot (end-to-end img/s,
    dequant / dynamic / dynamic_noout): PaliGemma-3B B=128
    53.1 / 52.2 / 56.6; BLIP-2 6.7B 48 slots 14.4 / 15.9 / 16.0;
    LLaVA-7B 12 slots 6.4 / 7.2 / 7.6. ``dynamic`` became the default
    when the int8 dot made it free-or-faster everywhere it matters: at
    6.7/7B — where 8bit is the only way onto a 16 GB chip — it beats
    dequant by 10-12% while keeping bitsandbytes-exact accuracy
    semantics; at 3B (where bf16 is the recommended config anyway) the
    two are within noise (IMPLEMENTATION_NOTES.md round-3)."""
    import os
    mode = os.environ.get("VLM_TPU_INT8_PREFILL", "dynamic").lower()
    if mode not in ("dequant", "dynamic", "dynamic_noout"):
        raise ValueError(
            f"VLM_TPU_INT8_PREFILL={mode!r}: expected "
            "dequant|dynamic|dynamic_noout")
    return mode


def _int4_prefill_mode() -> str:
    """int4 large-m dispatch: "dequant" (default — XLA-fused one-pass
    dequant feeding a bf16 matmul) or "fused" (the grouped Pallas kernel
    everywhere). Read at trace time; measured on v5e in round 3."""
    import os
    mode = os.environ.get("VLM_TPU_INT4_PREFILL", "dequant").lower()
    if mode not in ("dequant", "fused"):
        raise ValueError(
            f"VLM_TPU_INT4_PREFILL={mode!r}: expected dequant|fused")
    return mode


def activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "silu":
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name!r}")


class RMSNorm(nn.Module):
    """RMSNorm; ``gemma_style=True`` computes ``x * (1 + w)`` like Gemma."""
    eps: float = 1e-6
    gemma_style: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        w = self.param("scale", nn.initializers.zeros if self.gemma_style
                       else nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        w = w.astype(jnp.float32)
        out = xf * (1.0 + w) if self.gemma_style else xf * w
        return out.astype(dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype).astype(jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                       self.param_dtype).astype(jnp.float32)
        return (xf * w + b).astype(dtype)


class Dense(nn.Module):
    """Dense with explicit logical partitioning metadata and optional
    integer weight quantization.

    ``shard`` names the (in, out) logical mesh axes for the kernel; the
    sharding rules in `vlm_tpu.parallel.sharding` turn these into
    ``PartitionSpec``s over the device mesh.

    ``quant_bits`` 8/4 stores the kernel as int8 / packed-int4 with scales
    (the TPU analogue of bitsandbytes' load_in_8bit / nf4 — see
    `vlm_tpu.ops.quant`); the matmul runs the fused Pallas dequant kernel.
    Random init draws int8 values directly (real checkpoints are quantized
    by the weight loader via ``ops.quant.quantize_int8/int4``). Quantized
    layers are inference-only (gradients stop at the dequant).
    """
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    shard: Tuple[Optional[str], Optional[str]] = (None, None)
    kernel_init: Callable = nn.initializers.lecun_normal()
    quant_bits: int = 0
    quant_group: int = 128
    int8_outliers: int = 32    # llm.int8 outlier budget for the prefill path

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import QuantizedWeight, quant_matmul

        in_dim = x.shape[-1]
        if self.quant_bits in (4, 8):
            if self.quant_bits == 8:
                q_shape = (in_dim, self.features)
                gs = 0
                s_shape = (1, self.features)
            else:
                # Largest power-of-two group <= quant_group that divides
                # in_dim: decoder dims all divide 128 (no change), encoder
                # oddballs (SigLIP mlp_dim 4304 = 16*269) drop to a finer
                # group instead of asserting.
                gs = min(self.quant_group, in_dim)
                while gs > 1 and in_dim % gs:
                    gs //= 2
                assert in_dim % 2 == 0 and in_dim % gs == 0 and gs >= 2, \
                    (in_dim, gs)
                q_shape = (in_dim // 2, self.features)
                s_shape = (in_dim // gs, self.features)

            def q_init(key, shape, dtype):
                return jax.random.randint(key, shape, -112, 112,
                                          dtype=jnp.int32).astype(jnp.int8)

            def s_init(key, shape, dtype):
                # scale so dequantized weights ≈ lecun-normal magnitude
                std = (1.0 / in_dim) ** 0.5
                return jnp.full(shape, std / 64.0, dtype)

            q = self.param("q_kernel",
                           nn.with_partitioning(q_init, self.shard),
                           q_shape, jnp.int8)
            scale = self.param("scale",
                               nn.with_partitioning(s_init,
                                                    (None, self.shard[1])),
                               s_shape, jnp.float32)
            qw = QuantizedWeight(q=jax.lax.stop_gradient(q),
                                 scale=jax.lax.stop_gradient(scale),
                                 group_size=gs)
            x2 = x.reshape(-1, in_dim).astype(self.dtype)
            if self.quant_bits == 8 and x2.shape[0] >= 512 and \
                    _int8_prefill_mode() == "dequant":
                # Max-accuracy int8 prefill: one-pass XLA dequant → bf16
                # MXU matmul — activations never quantized, prefill runs at
                # bf16 speed; decode below still streams int8 weights.
                y = quant_matmul(x2, qw, out_dtype=self.dtype,
                                 use_pallas=False)
            elif self.quant_bits == 8 and x2.shape[0] >= 512 and \
                    _int8_prefill_mode() == "dynamic_noout":
                # Max-throughput int8 prefill: pure int8×int8 MXU without
                # outlier decomposition — the full 2x int8 peak, below
                # llm.int8 accuracy (no outlier protection).
                from ..ops.quant import quant_matmul_dynamic
                y = quant_matmul_dynamic(x2, qw, out_dtype=self.dtype)
            elif self.quant_bits == 8 and x2.shape[0] >= 512:
                # Default ("dynamic"): llm.int8 — per-row int8 activation
                # quantization → XLA-native int8×int8 MXU dot, with outlier
                # decomposition (the highest-|x| input columns bypass int8
                # in bf16, exactly where bitsandbytes applies it — the
                # reference's load_in_8bit semantics). Decode (m = batch,
                # ≤ a few hundred) keeps the weight-only dequant stream
                # below: dynamic quantization measured slower at decode
                # shapes and would quantize activations for no stream win.
                from ..ops.quant import quant_matmul_outlier
                y = quant_matmul_outlier(x2, qw, n_outliers=self.int8_outliers,
                                         out_dtype=self.dtype)
            elif self.quant_bits == 4 and x2.shape[0] >= 512 and \
                    _int4_prefill_mode() == "dequant":
                # int4 prefill hybrid: the fused kernel re-dequantizes the
                # weight tile for every m-block of the grid, so at prefill
                # (m in the thousands) the grouped unpack+scale work scales
                # with m/block_m × weight bytes. Letting XLA fuse a single
                # dequant into the bf16 matmul operand stream pays the
                # unpack once. (VLM_TPU_INT4_PREFILL=fused restores the
                # round-2 single-path kernel for comparison.)
                y = quant_matmul(x2, qw, out_dtype=self.dtype,
                                 use_pallas=False)
            else:
                # Bandwidth-bound regime (decode) and int4: in-VMEM dequant
                # to bf16 feeding the MXU.
                y = quant_matmul(x2, qw, out_dtype=self.dtype)
            y = y.reshape(*x.shape[:-1], self.features)
        else:
            kernel = self.param(
                "kernel",
                nn.with_partitioning(self.kernel_init, self.shard),
                (in_dim, self.features), self.param_dtype)
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_partitioning(nn.initializers.zeros, (self.shard[1],)),
                (self.features,), self.param_dtype)
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)
