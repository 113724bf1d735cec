"""Vision→language projectors: MLP (LLaVA), linear (PaliGemma), Q-Former
(BLIP-2).

The reference treats these as HF black boxes inside ``model.generate``
(SURVEY.md §3.5); here they are explicit flax modules.

Q-Former: 32 learned query tokens run through BERT-style post-LN layers —
self-attention among queries, cross-attention into the frozen image embedding
every ``cross_attention_frequency`` layers, feed-forward — then a linear
projection to the decoder width. This is the "most novel module" called out
in SURVEY.md §7 (no commodity JAX implementation exists).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .configs import QFormerConfig, VLMConfig
from .layers import Dense, LayerNorm, activation


class MLPProjector(nn.Module):
    """LLaVA-style 2-layer GELU MLP: vision_dim → hidden → hidden."""
    out_dim: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Dense(self.out_dim, shard=(None, "model"), name="fc1", **dd)(x)
        x = jax.nn.gelu(x, approximate=False)
        return Dense(self.out_dim, shard=("model", None), name="fc2", **dd)(x)


class LinearProjector(nn.Module):
    """PaliGemma-style single linear projection."""
    out_dim: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        return Dense(self.out_dim, shard=(None, "model"), name="proj",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)


class _BertAttention(nn.Module):
    """Post-LN BERT attention (self or cross)."""
    hidden: int
    heads: int
    eps: float
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, kv):
        b, s, _ = x.shape
        hd = self.hidden // self.heads
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = Dense(self.hidden, name="q", **dd)(x)
        k = Dense(self.hidden, name="k", **dd)(kv)
        v = Dense(self.hidden, name="v", **dd)(kv)
        sk = kv.shape[1]
        q = q.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, sk, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, sk, self.heads, hd).transpose(0, 2, 1, 3)
        o = attention(q, k, v, causal=False, impl="xla")
        o = o.transpose(0, 2, 1, 3).reshape(b, s, self.hidden)
        o = Dense(self.hidden, name="out", **dd)(o)
        return LayerNorm(eps=self.eps, param_dtype=self.param_dtype,
                         name="ln")(x + o)


class QFormer(nn.Module):
    """BLIP-2 Q-Former bridge: queries [32, H] → [B, 32, out_dim]."""
    cfg: QFormerConfig
    out_dim: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        cfg = self.cfg
        b = image_embeds.shape[0]
        queries = self.param("query_tokens", nn.initializers.normal(0.02),
                             (1, cfg.num_query_tokens, cfg.hidden),
                             self.param_dtype)
        x = jnp.broadcast_to(queries.astype(self.dtype),
                             (b, cfg.num_query_tokens, cfg.hidden))
        x = LayerNorm(eps=cfg.layer_norm_eps, param_dtype=self.param_dtype,
                      name="input_ln")(x)
        img = image_embeds.astype(self.dtype)
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(cfg.layers):
            x = _BertAttention(cfg.hidden, cfg.heads, cfg.layer_norm_eps,
                               name=f"self_attn_{i}", **dd)(x, x)
            if i % cfg.cross_attention_frequency == 0:
                x = _BertAttention(cfg.hidden, cfg.heads, cfg.layer_norm_eps,
                                   name=f"cross_attn_{i}", **dd)(x, img)
            h = Dense(cfg.mlp_dim, name=f"ffn_up_{i}", **dd)(x)
            h = activation("gelu")(h)
            h = Dense(cfg.hidden, name=f"ffn_down_{i}", **dd)(h)
            x = LayerNorm(eps=cfg.layer_norm_eps,
                          param_dtype=self.param_dtype,
                          name=f"ffn_ln_{i}")(x + h)
        return Dense(self.out_dim, shard=(None, "model"),
                     name="language_projection", **dd)(x)


def build_projector(cfg: VLMConfig, dtype, param_dtype) -> nn.Module:
    out_dim = cfg.decoder.hidden
    if cfg.projector == "mlp":
        return MLPProjector(out_dim, dtype, param_dtype, name="projector")
    if cfg.projector == "linear":
        return LinearProjector(out_dim, dtype, param_dtype, name="projector")
    if cfg.projector == "qformer":
        assert cfg.qformer is not None
        return QFormer(cfg.qformer, out_dim, dtype, param_dtype,
                       name="projector")
    raise ValueError(f"unknown projector {cfg.projector!r}")
