"""Assembled VLM: vision tower → projector → decoder, as one flax module.

Owns the full path the reference delegates to HF internals
(`/root/reference/models/base_model.py:66-74`, SURVEY.md §3.5):
encoder → projector (MLP / linear / Q-Former) → token merge → causal LM.

Token merge layout (matching each family's public prompt format):

- LLaVA:     [text-prefix] [576 image tokens] [text-suffix]
- PaliGemma: [256 image tokens] [BOS + prompt + "\\n"]
- BLIP-2:    [32 query tokens] [BOS + "Question: … Answer:"]

All three reduce to ``concat(embed(pre_ids), image_embeds, embed(post_ids))``
with possibly-empty pre/post, so one static-shape merge covers every family —
prompts are batch-constant in this framework (the per-dataset prompt is fixed,
only images vary), which keeps everything jit-compatible.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .configs import VLMConfig
from .decoder import Decoder, init_kv_cache
from .projector import build_projector
from .vit import ViTEncoder


class VLMModule(nn.Module):
    cfg: VLMConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    quant_bits: int = 0      # decoder weight quantization (8bit/4bit modes)
    #: vision-tower weight quantization. 0 keeps the tower in the compute
    #: dtype (strictly more accurate than the reference, whose load_in_8bit
    #: quantizes the tower's Linears too); set to the same bits as the
    #: decoder for reference-equivalent whole-model quantization — the big
    #: win is BLIP-2's 1B-param EVA ViT-g (the per-image cost there is
    #: encoder-dominated, IMPLEMENTATION_NOTES round-3 BLIP-2 section).
    vision_quant_bits: int = 0

    def setup(self):
        cfg = self.cfg
        self.vision = ViTEncoder(cfg.vision, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 attn_impl=self.attn_impl,
                                 quant_bits=self.vision_quant_bits,
                                 name="vision")
        self.projector = build_projector(cfg, self.dtype, self.param_dtype)
        self.decoder = Decoder(cfg.decoder, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               attn_impl=self.attn_impl,
                               quant_bits=self.quant_bits, name="decoder")

    # ---------------- vision ----------------
    def encode_images(self, pixels: jax.Array) -> jax.Array:
        """[B,H,W,3] normalized pixels → [B, T_img, decoder_hidden]."""
        cfg = self.cfg
        out = self.vision(pixels, keep_hidden_states=(
            cfg.vision_feature_layer != -1))
        if cfg.vision_feature_layer == -1:
            feats = out["last_hidden_state"]
        else:
            # LLaVA taps the penultimate encoder layer, pre-post-norm
            # (HF vision_feature_layer=-2 semantics).
            feats = out["hidden_states"][cfg.vision_feature_layer]
        if cfg.drop_cls_for_llm and cfg.vision.use_cls_token:
            feats = feats[:, 1:]
        return self.projector(feats)

    def vision_features(self, pixels: jax.Array) -> jax.Array:
        """Probing features [B, D] with per-family pooling
        (reference: llava.py:101-119, blip2.py:83-95, paligemma.py:100-112)."""
        out = self.vision(pixels, keep_hidden_states=False)
        pooling = self.cfg.backbone_pooling
        if pooling == "pooler":
            return out["pooled"]
        if pooling == "cls":
            return out["last_hidden_state"][:, 0]
        return jnp.mean(out["last_hidden_state"], axis=1)

    # ---------------- merge + decode ----------------
    def merge_embeds(self, pre_ids: jax.Array, image_embeds: jax.Array,
                     post_ids: jax.Array) -> jax.Array:
        """[B,P1],[B,T,H],[B,P2] → [B, P1+T+P2, H]."""
        parts = []
        if pre_ids.shape[1] > 0:
            parts.append(self.decoder.embed_tokens(pre_ids))
        parts.append(image_embeds.astype(self.dtype))
        if post_ids.shape[1] > 0:
            parts.append(self.decoder.embed_tokens(post_ids))
        return jnp.concatenate(parts, axis=1)

    def __call__(self, pixels: jax.Array, pre_ids: jax.Array,
                 post_ids: jax.Array,
                 kv_len: Optional[jax.Array] = None,
                 prefix_len: Optional[jax.Array] = None):
        """Full forward (no cache): logits [B, S, V]. Used by training paths,
        compile checks, and scoring.

        Prefix-LM families: with ``prefix_len`` given, the first prefix_len
        positions attend bidirectionally and the rest causally; without it
        the whole input is treated as prefix (pure prompt scoring)."""
        img = self.encode_images(pixels)
        embeds = self.merge_embeds(pre_ids, img, post_ids)
        if self.cfg.prefix_lm:
            if prefix_len is None:
                logits, _ = self.decoder(input_embeds=embeds, kv_len=kv_len,
                                         causal=False)
            else:
                logits, _ = self.decoder(input_embeds=embeds, kv_len=kv_len,
                                         causal=True, prefix_len=prefix_len)
        else:
            logits, _ = self.decoder(input_embeds=embeds, kv_len=kv_len,
                                     causal=True)
        return logits

    def prefill(self, pixels: Optional[jax.Array], pre_ids: jax.Array,
                post_ids: jax.Array, cache: Dict[str, jax.Array],
                prompt_len: jax.Array,
                image_embeds: Optional[jax.Array] = None):
        """Run the prompt through the decoder, writing the KV cache.

        Args:
            prompt_len: [B] true merged lengths (pre + T_img + post, minus
                right padding in post_ids).
            image_embeds: optional pre-projected image tokens [B, T, H]
                (from :meth:`encode_images`); supplying them skips the
                vision tower here, letting callers run vision and prefill
                as separate programs (the batcher's split-admission mode).
        Returns: (next_token_logits [B, V], cache).
        """
        img = image_embeds if image_embeds is not None \
            else self.encode_images(pixels)
        embeds = self.merge_embeds(pre_ids, img, post_ids)
        b, s, _ = embeds.shape
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        write_start = jnp.zeros((b,), jnp.int32)
        # logits only at each sequence's final real token — full-sequence
        # logits would be [B, S, vocab] (≈10 GB at batch 24 on Gemma's
        # 257k vocab).
        # Prefix-LM families (PaliGemma) attend bidirectionally over the
        # whole image+prompt prefix; causal families mask normally. Decode
        # steps are causal for both (each new token sees everything before
        # it via kv_len).
        # logits_dtype=self.dtype: the lm_head computes in the compute dtype
        # anyway, so this only skips the exact fp32 upcast of the [B, V]
        # buffer; samplers upcast where fp32 numerics matter (decode.py
        # _sample, beam.py log_softmax) and greedy argmax is invariant.
        logits, cache = self.decoder(
            input_embeds=embeds, positions=positions, cache=cache,
            write_start=write_start, kv_len=prompt_len,
            causal=not self.cfg.prefix_lm,
            logits_index=prompt_len - 1,
            uniform_write=True,   # every prefill writes at offset 0
            logits_dtype=self.dtype)
        return logits[:, 0], cache

    def decode_step(self, token_ids: jax.Array, seq_len: jax.Array,
                    cache: Dict[str, jax.Array],
                    uniform_write: bool = False,
                    write_col: Optional[jax.Array] = None,
                    kv_valid: Optional[jax.Array] = None,
                    kv_window=None):
        """One token per sequence. ``token_ids`` [B,1]; ``seq_len`` [B] is the
        current length (the new token's position). Returns
        (logits [B, V], cache).

        ``uniform_write=True`` (static) promises every sequence is at the
        same position (wave decoding over a batch-constant prompt): the KV
        write becomes a scalar-offset slice update instead of a full-cache
        masked stream (~1 ms/step on 3B).

        ``write_col`` (scalar) + ``kv_valid`` [B, cache_len]: the continuous
        batcher's rotating decode window — every slot writes its new row at
        the SAME cache column (a scalar-offset slice update even though
        slots are at different sequence positions), and ``kv_valid`` marks
        each slot's live rows (prompt + its modular token window). RoPE/
        learned positions still come from ``seq_len``, so the math is
        identical to the per-slot-scatter layout — only the cache column
        order differs, which softmax cannot see."""
        positions = seq_len[:, None]
        if write_col is not None:
            write_start = jnp.broadcast_to(write_col[None],
                                           seq_len.shape).astype(jnp.int32)
        else:
            write_start = seq_len
        logits, cache = self.decoder(
            input_ids=token_ids, positions=positions, cache=cache,
            write_start=write_start,
            kv_len=None if kv_valid is not None else seq_len + 1,
            causal=False,
            uniform_write=uniform_write or write_col is not None,
            kv_valid=kv_valid, kv_window=kv_window,
            logits_dtype=self.dtype)   # exact; fp32 [B,V] is 2x the bytes
        return logits[:, 0], cache


def num_image_tokens(cfg: VLMConfig) -> int:
    if cfg.projector == "qformer":
        return cfg.qformer.num_query_tokens
    n = cfg.vision.num_patches
    if not cfg.drop_cls_for_llm and cfg.vision.use_cls_token:
        n += 1
    return n


def _device_hbm_limit() -> Optional[int]:
    """Per-chip HBM capacity in bytes, or None when unknowable.

    Only TPU devices report a trustworthy ``bytes_limit``; CPU/virtual
    backends return None so the fit check is skipped there.
    """
    try:
        dev = jax.devices()[0]
        if dev.platform != "tpu":
            return None
        stats = dev.memory_stats()
        return stats.get("bytes_limit") if stats else None
    except Exception:  # pragma: no cover - backend without memory_stats
        return None


def param_bytes(module: VLMModule, cfg: VLMConfig) -> int:
    """Exact parameter footprint in bytes, computed without allocating.

    ``jax.eval_shape`` abstracts the init, so quantized int8/int4-packed
    weight tables and fp scales are all counted at their true dtypes.
    """
    px = jax.ShapeDtypeStruct(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3), module.dtype)
    ids = jax.ShapeDtypeStruct((1, 2), jnp.int32)
    shapes = jax.eval_shape(module.init, jax.random.key(0), px, ids, ids)
    return sum(int(np.prod(s.shape)) * s.dtype.itemsize
               for s in jax.tree_util.tree_leaves(shapes))


def check_hbm_fit(module: VLMModule, cfg: VLMConfig,
                  model_ways: int = 1) -> None:
    """Reject a build whose weights alone cannot fit per-chip HBM.

    The reference escapes this situation by spilling fp32 leftovers to host
    RAM (``llm_int8_enable_fp32_cpu_offload`` + ``device_map="auto"``,
    `/root/reference/models/base_model.py:88,95`); host offload is a
    measured non-goal here (docs/MIGRATION.md "CPU offload"), so the
    TPU-native alternatives are named in the error instead. Weights-only is
    deliberately the floor: KV cache and activations come on top, so a
    weights-don't-fit verdict is certain, never a false positive. Set
    ``VLM_TPU_SKIP_FIT_CHECK=1`` to bypass.
    """
    import os
    if os.environ.get("VLM_TPU_SKIP_FIT_CHECK") == "1":
        return
    limit = _device_hbm_limit()
    if limit is None:
        return
    total = param_bytes(module, cfg)
    per_chip = total // max(model_ways, 1)
    if per_chip <= limit:
        return
    need_ways = -(-total // limit)  # ceil: TP ways for weights alone
    raise ValueError(
        f"Model weights ({total / 2**30:.1f} GiB"
        + (f", {per_chip / 2**30:.1f} GiB/chip over model={model_ways}"
           if model_ways > 1 else "")
        + f") exceed per-chip HBM ({limit / 2**30:.1f} GiB) before any KV "
        f"cache or activations. The reference would spill to host RAM "
        f"(llm_int8_enable_fp32_cpu_offload); that is a measured non-goal "
        f"on TPU (docs/MIGRATION.md). Use `quantization: 8bit` (or 4bit) "
        f"to shrink the weights, or shard them with tensor parallelism: "
        f"`mesh: {{model: {max(need_ways, 2)}}}` (weights-only bound; "
        f"leave headroom for the KV cache).")


def init_vlm(cfg: VLMConfig, rng: jax.Array, dtype=jnp.bfloat16,
             param_dtype=jnp.float32, attn_impl: str = "auto",
             quant_bits: int = 0, vision_quant_bits: int = 0,
             model_ways: int = 1):
    module = VLMModule(cfg, dtype=dtype, param_dtype=param_dtype,
                       attn_impl=attn_impl, quant_bits=quant_bits,
                       vision_quant_bits=vision_quant_bits)
    check_hbm_fit(module, cfg, model_ways=model_ways)
    px = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                   dtype)
    pre = jnp.zeros((1, 2), jnp.int32)
    post = jnp.zeros((1, 2), jnp.int32)
    params = module.init(rng, px, pre, post)
    return module, params


__all__ = ["VLMModule", "init_vlm", "init_kv_cache", "num_image_tokens",
           "param_bytes", "check_hbm_fit"]
