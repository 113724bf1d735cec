"""Generic ViT vision encoder (flax) covering CLIP-L, SigLIP and EVA ViT-g.

Structural variants are driven by :class:`vlm_tpu.models.configs.ViTConfig`:
CLS token presence, pre-embedding LayerNorm (CLIP), whether the final
LayerNorm applies to all tokens (SigLIP/EVA) or only the pooled CLS (CLIP —
whose ``last_hidden_state`` is *not* post-normed, which matters for LLaVA
feature extraction parity), and K-bias (absent in EVA ViT-g).

The encoder replaces the HF towers the reference reaches through
``model.vision_tower`` / ``model.vision_model``
(`/root/reference/models/llava.py:68`, `blip2.py:56`, `paligemma.py:70`).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .configs import ViTConfig
from .layers import Dense, LayerNorm, activation


class ViTAttention(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    attn_impl: str = "auto"
    quant_bits: int = 0

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, s, _ = x.shape
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant_bits=self.quant_bits)
        q = Dense(cfg.hidden, shard=(None, "model"), name="q_proj", **dd)(x)
        k = Dense(cfg.hidden, use_bias=cfg.k_bias, shard=(None, "model"),
                  name="k_proj", **dd)(x)
        v = Dense(cfg.hidden, shard=(None, "model"), name="v_proj", **dd)(x)

        def split(t):
            return t.reshape(b, s, cfg.heads, cfg.head_dim).transpose(0, 2, 1, 3)

        o = attention(split(q), split(k), split(v), causal=False,
                      impl=self.attn_impl)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden)
        return Dense(cfg.hidden, shard=("model", None), name="out_proj", **dd)(o)


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    attn_impl: str = "auto"
    quant_bits: int = 0

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ln = lambda name: LayerNorm(eps=cfg.layer_norm_eps,
                                    param_dtype=self.param_dtype, name=name)
        x = x + ViTAttention(cfg, self.dtype, self.param_dtype,
                             self.attn_impl, self.quant_bits,
                             name="attn")(ln("ln1")(x))
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  quant_bits=self.quant_bits)
        h = Dense(cfg.mlp_dim, shard=(None, "model"), name="fc1", **dd)(
            ln("ln2")(x))
        h = activation(cfg.act)(h)
        h = Dense(cfg.hidden, shard=("model", None), name="fc2", **dd)(h)
        return x + h


class ViTEncoder(nn.Module):
    """ViT encoder. ``__call__(pixels [B,H,W,3])`` returns a dict:

    - ``last_hidden_state`` [B,S,D] — per-config post-norm semantics;
    - ``hidden_states`` — tuple of per-layer outputs (embeddings first), for
      intermediate feature taps (LLaVA uses layer -2);
    - ``pooled`` [B,D] — CLS after final LN (None without a CLS token).
    """
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    #: quantize the block Dense layers (q/k/v/out, fc1/fc2) to int8/int4 —
    #: the reference's ``load_in_8bit`` quantizes the vision tower's Linear
    #: layers too (bitsandbytes replaces every nn.Linear outside the skip
    #: list, `/root/reference/models/base_model.py:85-91`); patch embedding,
    #: norms and embeddings stay fp (the bnb skip-list analogue). Encoder
    #: blocks run at prefill-like shapes (m = batch x tokens), so the
    #: large-m dispatch in Dense applies.
    quant_bits: int = 0

    @nn.compact
    def __call__(self, pixels: jax.Array,
                 keep_hidden_states: bool = True) -> Dict[str, Any]:
        cfg = self.cfg
        b = pixels.shape[0]

        # Patch embedding: convolution stride=patch → tokens. XLA lowers this
        # conv to an MXU matmul over unfolded patches.
        x = nn.Conv(cfg.hidden, kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    use_bias=cfg.patch_bias,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(pixels.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden)

        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.hidden), self.param_dtype)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden)),
                 x], axis=1)

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.seq_len, cfg.hidden), self.param_dtype)
        x = x + pos.astype(self.dtype)

        if cfg.pre_layernorm:
            x = LayerNorm(eps=cfg.layer_norm_eps,
                          param_dtype=self.param_dtype, name="pre_ln")(x)

        hidden_states = [x] if keep_hidden_states else None
        for i in range(cfg.layers):
            x = ViTBlock(cfg, self.dtype, self.param_dtype, self.attn_impl,
                         self.quant_bits, name=f"block_{i}")(x)
            if keep_hidden_states:
                hidden_states.append(x)

        post_ln = LayerNorm(eps=cfg.layer_norm_eps,
                            param_dtype=self.param_dtype, name="post_ln")
        if cfg.post_layernorm == "all":
            last = post_ln(x)
            # HF Blip2VisionModel applies post_layernorm a SECOND time to the
            # pooled CLS (modeling_blip_2.py: last = post_ln(hidden);
            # pooled = post_ln(last[:, 0])). The reference's BLIP2Backbone
            # consumes exactly that pooler_output
            # (/root/reference/models/blip2.py:83-95), so we reproduce the
            # double application (verified by tests/test_hf_parity.py).
            pooled = post_ln(last[:, 0:1])[:, 0] if cfg.use_cls_token else None
        else:  # "pooled_only" (CLIP): last_hidden_state is NOT post-normed
            last = x
            pooled = post_ln(x[:, 0:1])[:, 0] if cfg.use_cls_token else None

        return {
            "last_hidden_state": last,
            "hidden_states": tuple(hidden_states) if keep_hidden_states else None,
            "pooled": pooled,
        }


def init_vit(cfg: ViTConfig, rng: jax.Array, dtype=jnp.bfloat16,
             param_dtype=jnp.float32, attn_impl: str = "auto",
             quant_bits: int = 0):
    """Build module + params for a ViT encoder."""
    module = ViTEncoder(cfg, dtype=dtype, param_dtype=param_dtype,
                        attn_impl=attn_impl, quant_bits=quant_bits)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), dtype)
    params = module.init(rng, dummy)
    return module, params
