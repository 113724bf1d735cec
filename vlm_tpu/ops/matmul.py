"""Skinny matmul Pallas kernel: few activation rows × a huge weight matrix.

Decode steps multiply [B≤256, H] activations against weight matrices whose
reads dominate (the extreme case: Gemma's 257k-vocab tied-embedding LM head,
a 1.05 GB bf16 matrix per step). XLA reaches only ~220 GB/s on that shape on
v5e (measured); this kernel keeps the activation block resident in VMEM and
streams weight row-tiles through in their native [V, H] layout — no
transpose materialization, full HBM bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ._compat import pallas_interpret



def _kernel_t(x_ref, w_ref, o_ref):
    # x [m, K] · w [bn, K]^T → [m, bn]
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype"))
def skinny_matmul_t(x: jax.Array, w: jax.Array, *, block_n: int = 1024,
                    out_dtype=jnp.float32) -> jax.Array:
    """``x @ w.T``: [m, K] × [N, K] → [m, N] with m small (≤ ~256).

    ``x`` (padded to sublane granularity) stays in VMEM across the whole
    grid; ``w`` streams in contiguous [block_n, K] row tiles.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    n = w.shape[0]
    pad_m = (-m) % 8
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    bn = min(block_n, n)
    pad_n = (-n) % bn
    if pad_n:
        w = jnp.pad(w, ((0, pad_n), (0, 0)))

    out = pl.pallas_call(
        _kernel_t,
        out_shape=jax.ShapeDtypeStruct((m + pad_m, n + pad_n), out_dtype),
        grid=(pl.cdiv(n + pad_n, bn),),
        in_specs=[
            pl.BlockSpec((m + pad_m, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m + pad_m, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(x, w)
    return out[:m, :n]


def decode_logits(x: jax.Array, embed: jax.Array,
                  use_pallas: bool | None = None) -> jax.Array:
    """Tied-embedding logits for decode steps: x [B, S, H] × embed [V, H]
    → [B, S, V] fp32. Uses the skinny kernel on TPU for small B·S."""
    b, s, h = x.shape
    if use_pallas is None:
        use_pallas = (jax.devices()[0].platform == "tpu" and b * s <= 256)
    if use_pallas:
        out = skinny_matmul_t(x.reshape(b * s, h).astype(embed.dtype),
                              embed)
        return out.reshape(b, s, -1)
    return jnp.einsum("bsh,vh->bsv", x, embed,
                      preferred_element_type=jnp.float32)
