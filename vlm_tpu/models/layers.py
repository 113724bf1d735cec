"""Shared flax building blocks: activations, norms, dense layers with
tensor-parallel partitioning annotations."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


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
    """Dense with explicit logical partitioning metadata.

    ``shard`` names the (in, out) logical mesh axes for the kernel; the
    sharding rules in `vlm_tpu.parallel.sharding` turn these into
    ``PartitionSpec``s over the device mesh.
    """
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    shard: Tuple[Optional[str], Optional[str]] = (None, None)
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.with_partitioning(self.kernel_init, self.shard),
            (x.shape[-1], self.features), self.param_dtype)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_partitioning(nn.initializers.zeros, (self.shard[1],)),
                (self.features,), self.param_dtype)
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)
