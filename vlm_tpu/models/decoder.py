"""Decoder-only LM (flax) covering the three reference decoder families:
Vicuna-7B (LLaMA), OPT-6.7B, Gemma-2B — selected via
:class:`vlm_tpu.models.configs.DecoderConfig`.

Replaces the HF decode internals the reference drives through
``model.generate`` (`/root/reference/models/base_model.py:69`). Design is
TPU-first and fully functional:

- the KV cache is an explicit pytree input/output (no mutable module state),
  laid out length-major ``[B, max_len, kv_heads, head_dim]`` per layer — the
  layout XLA prefers for decode reads, so donated caches update in place;
- prompts are **left-aligned** with per-sequence ``kv_len``; padding is
  masked, so batched prefill + slot-based continuous batching need no
  re-tokenization (SURVEY.md §7 "Continuous batching");
- per-slot cache writes are vectorized masked selects over the length axis
  (TPU scatters serialize) — jit-static shapes everywhere, no
  data-dependent Python control flow.

Variant knobs: RMSNorm vs LayerNorm, Gemma's ``(1+w)`` norm and
``sqrt(hidden)`` embedding scale, gated-SiLU vs plain-ReLU MLP, RoPE vs OPT's
offset-by-2 learned positions, GQA/MQA via ``kv_heads``, biased projections
(OPT), tied embeddings.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .configs import DecoderConfig
from .layers import Dense, LayerNorm, RMSNorm, activation


class QuantizedKV(NamedTuple):
    """One int8-quantized cache layer: values + per-row (abs-max) scales.

    ``q`` [B, max_len, kv_heads, D] int8; ``scale`` [B, max_len, kv_heads, 1]
    float32 with ``value ≈ q * scale``. A NamedTuple, so it is a pytree —
    donation, sharding and tree-mapped cache surgery (beam gather, batcher
    slot scatter) all work unchanged."""
    q: jax.Array
    scale: jax.Array


def quantize_kv_rows(x: jax.Array) -> "QuantizedKV":
    """Symmetric int8 per-(seq, pos, head) row quantization of [B,S,H,D] —
    the same abs-max/127 scheme as activation quantization (one shared
    implementation, `vlm_tpu.ops.quant.quantize_activations`)."""
    from ..ops.quant import quantize_activations
    return QuantizedKV(*quantize_activations(x))


def dequantize_kv(ckv: "QuantizedKV", dtype) -> jax.Array:
    # The multiply fuses into the attention reduction under XLA: HBM reads
    # stay int8 (+ the tiny scale array); bf16 values exist only on-chip.
    # The product is formed in float32 (int8 values are exact in f32, the
    # scale stays f32) and rounds to `dtype` once — rounding the scale to
    # bf16 first would add ~0.4% relative error on top of int8 rounding.
    return (ckv.q.astype(jnp.float32) * ckv.scale).astype(dtype)


# ------------------------- rotary embeddings -------------------------

def rope_table(head_dim: int, max_pos: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """(cos, sin) tables [max_pos, head_dim//2] in float32."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, positions: jax.Array, cos: jax.Array,
               sin: jax.Array) -> jax.Array:
    """Rotate pairs (x1, x2) = (x[..., :d/2], x[..., d/2:]) — the LLaMA/Gemma
    "half" convention. x: [B, H, S, D]; positions: [B, S]."""
    d2 = x.shape[-1] // 2
    c = cos[positions][:, None, :, :]          # [B, 1, S, d2]
    s = sin[positions][:, None, :, :]
    x1, x2 = x[..., :d2], x[..., d2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([xf1 * c - xf2 * s, xf2 * c + xf1 * s], axis=-1)
    return out.astype(x.dtype)


# ------------------------- KV cache -------------------------

def init_kv_cache(cfg: DecoderConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16) -> Dict[str, tuple]:
    """Slot-based cache: per-layer tuples of ``k``/``v``
    [B, max_len, kv_heads, D] arrays.

    Two deliberate layout choices, both measured on v5e:

    - *length-major* per-layer arrays — the layout XLA prefers for decode
      attention reads (head-major caches made XLA insert full-cache layout
      copies per step: 2.4 GB on a 7B model);
    - a *tuple of per-layer buffers* instead of one stacked [L, ...] array —
      layer i's read/write then only touches its own buffer, so there are
      no false cross-layer dependencies and every buffer aliases in place
      independently (stacked caches forced either a full-cache copy per
      step or serialized ``.at[i].set`` chains).
    """
    shape = (batch, max_len, cfg.kv_heads, cfg.head_dim)
    if dtype in ("int8", jnp.int8):
        # Quantized cache: int8 rows + a per-(seq, pos, head) float scale.
        # Halves the decode-step HBM cache read — the dominant stream for
        # MHA decoders (LLaVA/BLIP-2: 32 KV heads; measured ~4 GB/step at
        # 12 slots on 7B in bf16). Dequantization fuses into the attention
        # reduction (XLA), so the bf16 values never round-trip HBM.
        def layer():
            return QuantizedKV(
                q=jnp.zeros(shape, jnp.int8),
                scale=jnp.zeros(shape[:-1] + (1,), jnp.float32))
        return {"k": tuple(layer() for _ in range(cfg.layers)),
                "v": tuple(layer() for _ in range(cfg.layers))}
    return {"k": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.layers)),
            "v": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.layers))}


def _write_kv(ck: jax.Array, cv: jax.Array, k: jax.Array, v: jax.Array,
              start: jax.Array, uniform: bool = False):
    """Write ``k``/``v`` [B, H, S, D] into caches [B, max, H, D] at
    per-sequence offsets ``start`` [B]. Returns the updated (ck, cv).

    Three paths, all O(new) on the hot configurations:

    - ``uniform=True`` (static) REQUIRES every sequence to write at the
      same offset; only ``start[0]`` is read. True for prefill (all start
      at 0) and for wave-engine decode (the engine verifies batch-constant
      prompt lengths on the host and falls back to the per-row path
      otherwise). A single scalar-offset ``dynamic_update_slice`` writes
      only the new rows.
    - non-uniform decode (S == 1, the continuous batcher: every slot is at
      its own length) on TPU: the Pallas scatter-write kernel
      (:func:`vlm_tpu.ops.kvcache.kv_scatter_write`) — per-sequence rows via
      scalar-prefetched offsets, cache aliased in place. The XLA
      alternatives are a vmapped ``dynamic_update_slice`` (lowers to TPU
      scatters that serialize, ~3 ms/layer measured) or a masked select
      (streams the full cache layer: ~3.5 GB/step at batch 128 on 3B).
    - anything else: the masked-select fallback (full-layer stream, correct
      everywhere).

    An int8 cache layer (:class:`QuantizedKV`) quantizes the new rows first
    and writes values + scales through the same three paths.
    """
    k = k.transpose(0, 2, 1, 3)                        # [B, S, H, D]
    v = v.transpose(0, 2, 1, 3)
    quantized = isinstance(ck, QuantizedKV)
    if quantized:
        qk, qv = quantize_kv_rows(k), quantize_kv_rows(v)
    from ..ops._compat import pallas_interpret
    from ..ops.kvcache import (kv_masked_write, kv_scatter_write,
                               kv_uniform_write)
    # One platform decision for both dispatch branches below — diverging
    # rules between the uniform and scatter paths would be a silent hazard.
    on_tpu = (jax.devices()[0].platform == "tpu" or pallas_interpret())
    if uniform:
        zero = jnp.zeros((), jnp.int32)
        off = (zero, start[0].astype(jnp.int32), zero, zero)
        dus = jax.lax.dynamic_update_slice
        kvh = k.shape[2]
        if k.shape[1] == 1 and on_tpu and kvh > 1:
            # Single-row MHA/GQA decode write: the one-program Pallas
            # kernel pins the cache's default layout across the jit
            # boundary — a plain dus lets XLA relayout-copy every donated
            # cache argument (4.95 GB of HLO temps on LLaVA-7B at 12
            # slots → OOM; see kv_uniform_write). MQA (kvh == 1) stays on
            # dus: its cache is ~1/heads the size, the relayout temp is
            # ~1.2 GB at 3B/B=128 and amortizes to <0.1 ms/step, and the
            # transposed layout XLA then picks makes the decode attention
            # measurably faster (53.8 vs 50.3 img/s end-to-end).
            if quantized:
                q8k, q8v = kv_uniform_write(ck.q, cv.q, qk.q, qv.q, start)
                return (QuantizedKV(q8k, dus(ck.scale, qk.scale, off)),
                        QuantizedKV(q8v, dus(cv.scale, qv.scale, off)))
            return kv_uniform_write(ck, cv, k, v, start)
        if quantized:
            return (QuantizedKV(dus(ck.q, qk.q, off),
                                dus(ck.scale, qk.scale, off)),
                    QuantizedKV(dus(cv.q, qv.q, off),
                                dus(cv.scale, qv.scale, off)))
        return (dus(ck, k.astype(ck.dtype), off),
                dus(cv, v.astype(cv.dtype), off))
    if k.shape[1] == 1 and on_tpu:
        if quantized:
            # int8 rows take the O(new) scatter kernel; the [B,S,H,1]
            # scale arrays are tiny (<2 MB/layer) — the masked full-layer
            # stream is cheaper than a second badly-tiled kernel.
            q8k, q8v = kv_scatter_write(ck.q, cv.q, qk.q, qv.q, start)
            return (QuantizedKV(q8k, kv_masked_write(ck.scale, qk.scale,
                                                     start)),
                    QuantizedKV(q8v, kv_masked_write(cv.scale, qv.scale,
                                                     start)))
        return kv_scatter_write(ck, cv, k, v, start)
    if quantized:
        return (QuantizedKV(kv_masked_write(ck.q, qk.q, start),
                            kv_masked_write(ck.scale, qk.scale, start)),
                QuantizedKV(kv_masked_write(cv.q, qv.q, start),
                            kv_masked_write(cv.scale, qv.scale, start)))
    return (kv_masked_write(ck, k, start), kv_masked_write(cv, v, start))


# ------------------------- modules -------------------------

class DecoderAttention(nn.Module):
    cfg: DecoderConfig
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    attn_impl: str = "auto"
    quant_bits: int = 0

    @nn.compact
    def __call__(self, x, positions, rope, cache_kv=None, write_start=None,
                 kv_len=None, causal=True, prefix_len=None,
                 uniform_write=False, kv_valid=None, kv_window=None):
        cfg = self.cfg
        b, s, _ = x.shape
        hd = cfg.head_dim
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  use_bias=cfg.attn_bias, quant_bits=self.quant_bits)
        q = Dense(cfg.heads * hd, shard=(None, "model"), name="q_proj", **dd)(x)
        k = Dense(cfg.kv_heads * hd, shard=(None, "model"), name="k_proj", **dd)(x)
        v = Dense(cfg.kv_heads * hd, shard=(None, "model"), name="v_proj", **dd)(x)
        q = q.reshape(b, s, cfg.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, cfg.kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, cfg.kv_heads, hd).transpose(0, 2, 1, 3)

        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, positions, cos, sin)
            k = apply_rope(k, positions, cos, sin)

        new_cache = None
        kv_layout = "bhsd"
        k_scale = v_scale = None
        if cache_kv is not None:
            ck, cv = cache_kv                      # [B, max, kvH, D]
            ck, cv = _write_kv(ck, cv, k, v, write_start,
                               uniform=uniform_write)
            new_cache = (ck, cv)
            if s == 1:
                # decode step: attend over the cache (in its native
                # length-major layout), masked by kv_len. int8 caches:
                # the values enter the dot as a bare int8→dtype cast
                # (fuses into the operand stream) and the per-row scales
                # ride the SCORES/probs instead — q·(k8·s) == (q·k8)·s —
                # touching S·KV elements instead of S·KV·D (measured
                # 1.09x/layer at BLIP-2 MHA decode shapes).
                if isinstance(ck, QuantizedKV):
                    # Raw int8 rows: ops.attention either streams them as
                    # int8 through the fused decode kernel (MHA/GQA on
                    # TPU — half the HBM traffic) or applies the bare
                    # cast itself on the XLA fallback.
                    k_att, v_att = ck.q, cv.q
                    k_scale, v_scale = ck.scale, cv.scale
                else:
                    k_att, v_att = ck, cv
                kv_layout = "bshd"
                att_causal = False
                att_kv_len = kv_len
            else:
                # prefill: self-attention over current tokens only
                k_att, v_att = k, v
                att_causal = causal
                att_kv_len = kv_len
        else:
            k_att, v_att = k, v
            att_causal = causal
            att_kv_len = kv_len

        # GQA/MQA: k_att/v_att keep their kv_heads; ops.attention contracts
        # groups against the shared KV heads (no repeated cache traffic).
        # LLaMA-family scale is head_dim**-0.5 (ops.attention applies it).
        # Decode steps (s == 1): "auto" routes int8 MHA/GQA caches to the
        # fused flash-decode kernel (raw int8 stream) and everything else
        # to XLA's batched matvec; prefill uses the fused Pallas prefill
        # kernel incl. kv_len masking. int8 caches pass through unconverted.
        if k_att.dtype != jnp.int8:
            k_att = k_att.astype(self.dtype)
            v_att = v_att.astype(self.dtype)
        # decode_impl applies only to true cached decode steps (s == 1 AND
        # a cache present, i.e. kv_layout == "bshd"): the cache-less
        # single-token call (full forward over one token) stays on "xla" —
        # "auto" there could pick the prefill flash kernel for a 1-row q
        # tile, which under-utilizes the MXU.
        is_decode = s == 1 and cache_kv is not None
        decode_impl = "xla" if self.attn_impl == "xla" else "auto"
        o = attention(q.astype(self.dtype), k_att, v_att,
                      causal=att_causal,
                      kv_len=att_kv_len, kv_valid=kv_valid,
                      kv_window=kv_window if is_decode else None,
                      prefix_len=prefix_len, kv_layout=kv_layout,
                      k_scale=k_scale, v_scale=v_scale,
                      impl=decode_impl if is_decode else
                      ("xla" if s == 1 else self.attn_impl))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.heads * hd)
        o = Dense(cfg.hidden, shard=("model", None), name="o_proj", **dd)(o)
        return o, new_cache


class DecoderMLP(nn.Module):
    cfg: DecoderConfig
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    quant_bits: int = 0

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        act = activation(cfg.act)
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  use_bias=cfg.attn_bias, quant_bits=self.quant_bits)
        if cfg.gated_mlp:
            g = Dense(cfg.mlp_dim, shard=(None, "model"), name="gate_proj", **dd)(x)
            u = Dense(cfg.mlp_dim, shard=(None, "model"), name="up_proj", **dd)(x)
            h = act(g) * u
        else:
            h = act(Dense(cfg.mlp_dim, shard=(None, "model"),
                          name="fc1", **dd)(x))
        return Dense(cfg.hidden, shard=("model", None), name="down_proj", **dd)(h)


class DecoderBlock(nn.Module):
    cfg: DecoderConfig
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    attn_impl: str = "auto"
    quant_bits: int = 0

    @nn.compact
    def __call__(self, x, positions, rope, cache_kv=None, write_start=None,
                 kv_len=None, causal=True, prefix_len=None,
                 uniform_write=False, kv_valid=None, kv_window=None):
        cfg = self.cfg
        if cfg.norm == "rmsnorm":
            mk_norm = lambda name: RMSNorm(eps=cfg.norm_eps,
                                           gemma_style=cfg.gemma_norm,
                                           param_dtype=self.param_dtype,
                                           name=name)
        else:
            mk_norm = lambda name: LayerNorm(eps=cfg.norm_eps,
                                             param_dtype=self.param_dtype,
                                             name=name)
        h, new_cache = DecoderAttention(
            cfg, self.dtype, self.param_dtype, self.attn_impl,
            self.quant_bits, name="attn")(
                mk_norm("input_norm")(x), positions, rope, cache_kv,
                write_start, kv_len, causal, prefix_len, uniform_write,
                kv_valid, kv_window)
        x = x + h
        x = x + DecoderMLP(cfg, self.dtype, self.param_dtype,
                           self.quant_bits, name="mlp")(
            mk_norm("post_attn_norm")(x))
        return x, new_cache


class Decoder(nn.Module):
    """Decoder LM.

    Call with either ``input_ids`` [B,S] or pre-merged ``input_embeds``
    [B,S,H] (the VLM path injects projected image embeddings via
    :meth:`embed_tokens` + concatenation). Returns
    ``(logits [B,S,V], new_cache | None)``.
    """
    cfg: DecoderConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # int8/int4 weight quantization for the block projections (embeddings and
    # lm_head stay fp, matching bitsandbytes' default skip list).
    quant_bits: int = 0

    def setup(self):
        cfg = self.cfg
        # dtype=self.dtype so embed.attend computes in the compute dtype
        # even when param_dtype is wider (fp32 params + bf16 compute) —
        # without it flax promotes the attend matmul to fp32 and the
        # logits_dtype contract below ("float32 return is an exact upcast
        # of the same compute-dtype values") would silently break for the
        # tied-embedding head while holding for lm_head.
        self.embed = nn.Embed(
            cfg.vocab_size, cfg.hidden,
            embedding_init=nn.with_partitioning(
                nn.initializers.normal(0.02), ("model", None)),
            dtype=self.dtype, param_dtype=self.param_dtype, name="embed")
        if cfg.pos == "learned":
            # OPT: learned positions with a +2 offset quirk.
            self.pos_embed = nn.Embed(
                cfg.max_position + 2, cfg.hidden,
                embedding_init=nn.initializers.normal(0.02),
                param_dtype=self.param_dtype, name="pos_embed")
        self.blocks = [
            DecoderBlock(cfg, self.dtype, self.param_dtype, self.attn_impl,
                         self.quant_bits, name=f"block_{i}")
            for i in range(cfg.layers)]
        if cfg.final_norm:
            if cfg.norm == "rmsnorm":
                self.final_norm = RMSNorm(
                    eps=cfg.norm_eps, gemma_style=cfg.gemma_norm,
                    param_dtype=self.param_dtype, name="final_norm")
            else:
                self.final_norm = LayerNorm(
                    eps=cfg.norm_eps, param_dtype=self.param_dtype,
                    name="final_norm")
        if not cfg.tie_embeddings:
            self.lm_head = Dense(
                cfg.vocab_size, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, shard=(None, "model"),
                name="lm_head")

    def embed_tokens(self, input_ids: jax.Array) -> jax.Array:
        """Token embeddings incl. Gemma's sqrt(hidden) scaling — exactly what
        is concatenated with projected image embeddings (the HF equivalent
        scales after the merge; dividing image features by sqrt(hidden) first,
        which nets out to unscaled image features — we skip both)."""
        x = self.embed(input_ids).astype(self.dtype)
        if self.cfg.embed_scale:
            x = x * jnp.asarray(self.cfg.hidden ** 0.5, self.dtype)
        return x

    def __call__(self, *, input_ids: Optional[jax.Array] = None,
                 input_embeds: Optional[jax.Array] = None,
                 positions: Optional[jax.Array] = None,
                 cache: Optional[Dict[str, jax.Array]] = None,
                 write_start: Optional[jax.Array] = None,
                 kv_len: Optional[jax.Array] = None,
                 causal: bool = True,
                 prefix_len: Optional[jax.Array] = None,
                 logits_index: Optional[jax.Array] = None,
                 uniform_write: bool = False,
                 kv_valid: Optional[jax.Array] = None,
                 kv_window=None,
                 logits_dtype: Optional[jnp.dtype] = None):
        """``prefix_len`` [B]: prefix-LM masking — the first prefix_len
        positions attend bidirectionally, the rest causally.
        ``logits_index`` [B]: compute logits only at these positions
        ([B, 1, V]). Essential for prefill: full-sequence logits over a
        250k-vocab decoder would materialize ~10 GB at batch 24.
        ``logits_dtype``: output dtype for the logits (default float32).
        The head matmul computes in the compute dtype either way (lm_head
        is Dense(dtype=self.dtype); the tied embed is built with
        dtype=self.dtype so attend matches — see setup), so a
        float32 return is an EXACT upcast of the same bf16 values —
        requesting ``self.dtype`` instead changes no value, only the
        materialized buffer: [B, V] fp32 is 132 MB/step at B=128 on
        Gemma's 257k vocab vs 66 MB in bf16 (greedy argmax and
        upcast-then-softmax sampling are invariant to it; the generation
        hot paths pass the compute dtype, see vlm.py prefill/decode_step)."""
        cfg = self.cfg
        if input_embeds is None:
            input_embeds = self.embed_tokens(input_ids)
        x = input_embeds.astype(self.dtype)
        b, s, _ = x.shape

        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))

        rope = None
        if cfg.pos == "rope":
            rope = rope_table(cfg.head_dim, cfg.max_position, cfg.rope_theta)
        elif cfg.pos == "learned":
            x = x + self.pos_embed(positions + 2).astype(self.dtype)

        # Per-layer cache buffers update independently (see init_kv_cache).
        new_cache = None
        new_k, new_v = [], []
        for i, block in enumerate(self.blocks):
            cache_kv = None
            if cache is not None:
                cache_kv = (cache["k"][i], cache["v"][i])
            x, updated = block(x, positions, rope, cache_kv,
                               write_start, kv_len, causal, prefix_len,
                               uniform_write, kv_valid, kv_window)
            if cache is not None:
                new_k.append(updated[0])
                new_v.append(updated[1])
        if cache is not None:
            new_cache = {"k": tuple(new_k), "v": tuple(new_v)}

        if cfg.final_norm:
            x = self.final_norm(x)

        if logits_index is not None:
            idx = jnp.clip(logits_index, 0, s - 1)
            x = jnp.take_along_axis(x, idx[:, None, None], axis=1)

        if cfg.tie_embeddings:
            # Measured on v5e (round 2, isolated microbench): XLA's attend
            # einsum streams the 1.05 GB Gemma LM head at ~460 GB/s
            # (2.3 ms/step, flat in B from 8 to 128); a Pallas row-tile
            # skinny kernel reached only ~190 GB/s at every workable tile
            # size and was removed. XLA is the right path here.
            logits = self.embed.attend(x.astype(self.dtype))
        else:
            logits = self.lm_head(x)
        return logits.astype(logits_dtype or jnp.float32), new_cache


def init_decoder(cfg: DecoderConfig, rng: jax.Array, dtype=jnp.bfloat16,
                 param_dtype=jnp.float32, attn_impl: str = "auto"):
    module = Decoder(cfg, dtype=dtype, param_dtype=param_dtype,
                     attn_impl=attn_impl)
    dummy = jnp.zeros((1, 4), jnp.int32)
    params = module.init(rng, input_ids=dummy)
    return module, params
