"""Attention ops: fused Pallas TPU kernel + XLA reference path.

The reference delegates attention to HF/PyTorch CUDA internals
(`/root/reference/models/base_model.py:69`); here it is owned by the
framework. Sequence lengths in this workload are short (≤ 577 vision tokens,
≤ ~1.2k decode tokens — SURVEY.md §5 "Long-context"), so K/V for one (batch,
head) always fits in VMEM. The Pallas kernel therefore uses the simple
optimal schedule for this regime: full K/V resident in VMEM, queries tiled,
scores materialized per q-tile in fp32 — one HBM pass over Q/K/V/O, MXU for
both matmuls, no streaming-softmax bookkeeping. Per-sequence valid-length
masking (``kv_len``) is supported in-kernel so padded prefill batches run
the fused path too.

``attention(..., impl="xla")`` is the fallback used for CPU tests and
arbitrary additive biases. The fused kernel is differentiable through a
``custom_vjp`` (Pallas forward, XLA-derived recompute backward), so probe
training with unfrozen backbone layers stays on the fused forward path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ._compat import pallas_interpret

# Read once at import: attention() is traced under jit, so an inline
# os.environ read would be baked in at first compile anyway — two call
# sites compiled at different times could then disagree if the variable
# changed mid-process. A module constant makes the set-before-import
# contract explicit.
DECODE_ATTN_IMPL = os.environ.get("VLM_TPU_DECODE_ATTN", "xla")

NEG_INF = -1e30



def _xla_attention(q, k, v, *, causal: bool, scale: float,
                   kv_len: Optional[jax.Array] = None,
                   kv_valid: Optional[jax.Array] = None,
                   bias: Optional[jax.Array] = None,
                   prefix_len: Optional[jax.Array] = None,
                   kv_layout: str = "bhsd",
                   k_scale: Optional[jax.Array] = None,
                   v_scale: Optional[jax.Array] = None) -> jax.Array:
    """Reference attention. q: [B, H, Sq, D]; k/v: [B, KV, Sk, D]
    (``kv_layout="bhsd"``) or [B, Sk, KV, D] (``"bshd"`` — the KV cache's
    native layout, contracted in place so decode never transposes the
    cache). KV divides H: grouped-query attention contracts against the
    shared KV heads directly — never materializes a repeated cache, which
    matters for MQA decode where a repeat would 8× the HBM traffic.

    ``k_scale``/``v_scale`` [B, Sk, KV, 1] (bshd only): per-row int8-cache
    dequantization scales applied at SCORE granularity —
    ``q·(k8·s) == (q·k8)·s`` and ``Σ p·(v8·s) == Σ (p·s)·v8`` — so the
    cache convert is a bare int8→dtype cast that fuses into the dot's
    operand stream and the scale multiply touches S·KV elements instead
    of S·KV·D (128x less VPU work; measured 1.09x/layer at BLIP-2 decode
    shapes, ~4.6 ms/step across its 32 MHA layers)."""
    b, h, sq, d = q.shape
    if kv_layout == "bshd":
        kvh, sk = k.shape[2], k.shape[1]
    else:
        kvh, sk = k.shape[1], k.shape[2]
        assert k_scale is None and v_scale is None, \
            "cache scales require the bshd (cache-native) layout"
    g = h // kvh
    qg = q.reshape(b, kvh, g, sq, d)
    k_eq = "bknd" if kv_layout == "bshd" else "bnkd"
    s = jnp.einsum(f"bngqd,{k_eq}->bngqk", qg, k,
                   preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        # [B, Sk, KV, 1] -> [B, KV, 1, 1, Sk]; positive by construction
        # (abs-max/127, floored), so masks applied below stay masks.
        s = s * k_scale[:, :, :, 0].transpose(0, 2, 1)[:, :, None, None, :]
    if bias is not None:
        s = s + jnp.broadcast_to(bias, (b, h, sq, sk)).reshape(
            b, kvh, g, sq, sk)
    if causal:
        # Align the causal diagonal to the *end* of the kv axis so cached
        # prefixes (sk > sq) attend correctly.
        offset = sk - sq
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        allowed = (ki <= qi + offset)[None, None, None]
        if prefix_len is not None:
            # Prefix-LM: the first prefix_len positions are visible to every
            # query (bidirectional prefix, causal suffix).
            in_prefix = ki[None] < prefix_len[:, None, None]
            allowed = allowed | in_prefix[:, None, None]
        s = jnp.where(allowed, s, NEG_INF)
    if kv_len is not None:
        ki = jax.lax.broadcasted_iota(jnp.int32, (sk,), 0)
        mask = ki[None, :] < kv_len[:, None]                  # [B, Sk]
        s = jnp.where(mask[:, None, None, None, :], s, NEG_INF)
    if kv_valid is not None:
        # Arbitrary per-(batch, key) validity [B, Sk] — the continuous
        # batcher's rotating decode window is non-contiguous in the cache,
        # so a prefix length cannot express it.
        s = jnp.where(kv_valid[:, None, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * v_scale[:, :, :, 0].transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(f"bngqk,{k_eq}->bngqd", p.astype(v.dtype), v)
    return out.reshape(b, h, sq, d)


def _flash_kernel(kvl_ref, pfx_ref, q_ref, k_ref, v_ref, o_ref, *,
                  scale: float, causal: bool, offset: int, masked: bool,
                  prefix: bool, heads: int):
    """One (batch*head, q_tile) program: full-K/V fused attention.

    ``offset = sk - sq`` aligns the causal diagonal to the end of the kv axis
    (cached-prefix decoding). ``kvl_ref``/``pfx_ref`` are scalar-prefetch [B]
    vectors of valid kv lengths (when ``masked``) and prefix-LM lengths (when
    ``prefix`` — the first pfx positions are visible to every query,
    bidirectional prefix + causal suffix, matching _xla_attention). Padded
    query rows attend unmasked; their outputs are sliced away by the caller.
    """
    from jax.experimental import pallas as pl

    # q/k enter the dot in their stored dtype with fp32 ACCUMULATION —
    # bf16×bf16→fp32 is the MXU's native mode. Upcasting the operands to
    # fp32 first (the original form) silently dropped the score matmul to
    # fp32 MXU throughput (~1/4 of bf16 on v5e) and made the kernel MORE
    # precise than the _xla_attention reference, whose einsum also feeds
    # bf16 operands with preferred_element_type=f32.
    q = q_ref[0]                                     # [Tq, D]
    k = k_ref[0]                                     # [Sk, D]
    v = v_ref[0]                                     # [Sk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [Tq, Sk]
    ki = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    g = pl.program_id(0)
    if causal:
        i = pl.program_id(1)
        tq = q.shape[0]
        qi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * tq
        allowed = ki <= qi + offset
        if prefix:
            allowed |= ki < pfx_ref[g // heads]
        s = jnp.where(allowed, s, NEG_INF)
    if masked:
        s = jnp.where(ki < kvl_ref[g // heads], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "q_tile", "heads"))
def _flash_attention(q, k, v, kv_len=None, prefix_len=None, *, causal: bool,
                     heads: int, q_tile: int = 256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, d = q.shape
    kvh, sk = k.shape[1], k.shape[2]
    group = h // kvh
    scale = d ** -0.5
    # Lane-width head dims: Mosaic wants D ∈ {64, 128, 256}. Off-width
    # heads (SigLIP/EVA ViTs: 72, 88) are zero-padded up — exact, since
    # zero q/k columns contribute nothing to the scores and the padded v
    # columns are sliced away below. scale uses the TRUE head dim.
    d_orig = d
    if d not in (64, 128, 256):
        if d > 256:
            raise ValueError(f"flash impl supports head_dim <= 256, got {d}")
        d = 64 if d < 64 else (128 if d < 128 else 256)
        padd = ((0, 0), (0, 0), (0, 0), (0, d - d_orig))
        q = jnp.pad(q, padd)
        k = jnp.pad(k, padd)
        v = jnp.pad(v, padd)
    bh = b * h
    q3 = q.reshape(bh, sq, d)
    # Grouped-query support: KV stays at kvh heads; the index map routes
    # each q-head's program to its shared KV row (no repeat materialized).
    k3 = k.reshape(b * kvh, sk, d)
    v3 = v.reshape(b * kvh, sk, d)
    masked = kv_len is not None
    if kv_len is None:
        kv_len = jnp.full((b,), sk, jnp.int32)
    kvl = kv_len.astype(jnp.int32)
    prefix = prefix_len is not None
    if prefix_len is None:
        prefix_len = jnp.zeros((b,), jnp.int32)
    pfx = prefix_len.astype(jnp.int32)

    tq = min(q_tile, sq)
    # Pad sq up to a tile multiple; padded queries attend to everything but
    # their outputs are sliced away.
    pad = (-sq) % tq
    if pad:
        q3 = jnp.pad(q3, ((0, 0), (0, pad), (0, 0)))
    nq = (sq + pad) // tq

    def kv_row(g):
        return (g // h) * kvh + (g % h) // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda g, i, *_: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda g, i, *_: (kv_row(g), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda g, i, *_: (kv_row(g), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda g, i, *_: (g, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal,
                          offset=sk - sq, masked=masked, prefix=prefix,
                          heads=heads),
        out_shape=jax.ShapeDtypeStruct((bh, sq + pad, d), q.dtype),
        grid_spec=grid_spec,
        interpret=pallas_interpret(),
    )(kvl, pfx, q3, k3, v3)
    if pad:
        out = out[:, :sq]
    out = out.reshape(b, h, sq, d)
    if d != d_orig:
        out = out[..., :d_orig]
    return out


# ------------------------- differentiable wrapper -------------------------
#
# The fused kernel has no Pallas backward; probe training with unfrozen
# backbone layers (reference end-to-end mode,
# `/root/reference/probing/train/singletask_trainer.py:142-180`) still wants
# the fused FORWARD. custom_vjp keeps the Pallas kernel on the forward pass
# and computes gradients by differentiating the (numerically equivalent) XLA
# attention — recompute-based, so nothing extra is saved from the forward.
# Training attention never uses kv_len/bias/prefix masks (full images, no
# padding), so the differentiable wrapper covers exactly (q, k, v, causal).

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_diff(q, k, v, causal: bool, heads: int):
    return _flash_attention(q, k, v, None, causal=causal, heads=heads)


def _flash_diff_fwd(q, k, v, causal, heads):
    return _flash_attention(q, k, v, None, causal=causal, heads=heads), \
        (q, k, v)


def _flash_diff_bwd(causal, heads, res, g):
    q, k, v = res
    scale = q.shape[-1] ** -0.5
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_attention(q, k, v, causal=causal, scale=scale),
        q, k, v)
    return vjp(g)


_flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
              causal: bool = False,
              kv_len: Optional[jax.Array] = None,
              kv_valid: Optional[jax.Array] = None,
              kv_window=None,
              bias: Optional[jax.Array] = None,
              prefix_len: Optional[jax.Array] = None,
              kv_layout: str = "bhsd",
              k_scale: Optional[jax.Array] = None,
              v_scale: Optional[jax.Array] = None,
              impl: str = "auto") -> jax.Array:
    """Multi-head attention. ``q``: [B, H, Sq, D]; ``k/v``: [B, KV, Sk, D]
    with KV dividing H (grouped/multi-query attention handled natively —
    both paths contract against the shared KV heads without repeating).

    Args:
        causal: causal masking with the diagonal aligned to the end of the
            kv axis (supports cached prefixes where Sk > Sq).
        kv_len: optional [B] valid kv lengths (padding mask).
        kv_valid: optional [B, Sk] per-key validity mask.
        kv_window: optional ``(pcol, window, acol, gcnt)`` scalar form of
            the continuous batcher's rotating-window validity. PURELY an
            optimization hint: it must describe the same mask as
            ``kv_valid`` (required alongside it), and only the fused decode
            kernel consumes it — reconstructing the mask from an in-kernel
            iota instead of streaming a pre-repeated [B, Sk, H] mask. Every
            other path uses ``kv_valid``; when the kernel takes the window,
            the kv_valid build is dead code XLA removes.
        bias: optional additive bias [B|1, H|1, Sq, Sk] (XLA path only).
        impl: "auto" (Pallas on TPU when applicable, else XLA), "flash", "xla".
    """
    if kv_window is not None and kv_valid is None:
        raise ValueError("kv_window is an optimization hint for kv_valid "
                         "and requires it (non-kernel paths mask with "
                         "kv_valid)")
    scale = q.shape[-1] ** -0.5
    if impl == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        # Interpret mode counts as "TPU" for the decode-kernel gate so CPU
        # parity tests can exercise the exact product dispatch.
        if ((on_tpu or pallas_interpret()) and q.shape[2] == 1
                and kv_layout == "bshd"
                and not causal and bias is None and prefix_len is None
                and k_scale is not None and v_scale is not None
                and k.shape[2] > 1
                and (k.shape[2] * q.shape[-1]) % 128 == 0
                and DECODE_ATTN_IMPL == "flash"):
            # OPT-IN (VLM_TPU_DECODE_ATTN=flash): fused decode kernel over
            # the raw int8 cache. Wins 4x on an isolated full-cache
            # stream (0.392 vs 1.608 ms at B=64/S=1152 MHA int8) but LOSES
            # end-to-end in the continuous batcher (12.8 vs 21.3 img/s,
            # BLIP-2 64-slot recipe): the batcher's windowed decode keeps
            # the effective attended length far below the cache capacity,
            # where the kernel's fixed per-layer costs (block-diagonal
            # query expansion, mask widening, custom-call layout pins)
            # outweigh the int8-stream saving. XLA stays the default;
            # the kernel is kept for long-context decode regimes.
            impl = "flash_decode"
        else:
            # Measured gate (scripts/bench_attn_shapes.py, r4, v5e, 32-iter
            # scan-amortized per-layer ms at the product shapes):
            #   opt_prefill   S=1030 d=128: xla 17.05  flash 10.15  (1.68x)
            #   vicuna_prefill S=806 d=128: xla 10.67  flash  7.55  (1.41x)
            #   clip_tower    S=577  d=64 : xla  2.99  flash  2.69  (1.11x)
            #   siglip_tower  S=256  d=72 : xla  1.14  flash  1.28  (0.89x)
            #   eva_tower     S=257  d=88 : xla  1.43  flash  2.03  (0.71x)
            #   gemma prefix  S=404  d=256: xla  1.37  flash  1.51  (0.91x)
            # Off-width head dims (ViT 72/88) pad to the lane width inside
            # _flash_attention — exact but 0.7-0.9x at tower shapes, so auto
            # keeps them on XLA; the padded path stays an explicit-impl
            # capability. Prefix-LM (PaliGemma prefill) is kernel-native when
            # causal but loses at the short S=404 product shape — auto keeps
            # it on XLA too (explicit "flash" serves long-prefix regimes).
            use_flash = (on_tpu and bias is None and prefix_len is None
                         and kv_valid is None and kv_layout == "bhsd"
                         and q.shape[-1] in (64, 128, 256))
            impl = "flash" if use_flash else "xla"
    if impl == "flash_decode":
        if kv_layout != "bshd" or causal or bias is not None or \
                prefix_len is not None:
            raise ValueError(
                "flash_decode impl is the cache-native decode step: bshd "
                "layout, no causal/bias/prefix masks")
        from .decode_attention import flash_decode_attention
        return flash_decode_attention(q, k, v, kv_len=kv_len,
                                      kv_valid=kv_valid,
                                      kv_window=kv_window, k_scale=k_scale,
                                      v_scale=v_scale)
    if impl == "flash":
        if bias is not None or (prefix_len is not None and not causal) or \
                kv_valid is not None or kv_layout != "bhsd" or \
                k_scale is not None or v_scale is not None:
            raise ValueError(
                "flash impl does not support additive bias / non-causal "
                "prefix masks / kv_valid masks / bshd kv layout / cache "
                "scales")
        if q.shape[-1] > 256:
            # the same gate the auto path applies — an explicit "flash"
            # with an unsupported head_dim would otherwise surface as an
            # opaque Mosaic lowering error
            raise ValueError(
                f"flash impl supports head_dim <= 256, got {q.shape[-1]}")
        if kv_len is None and prefix_len is None:
            # differentiable: fused forward + XLA-derived backward
            return _flash_attention_diff(q, k, v, causal, q.shape[1])
        return _flash_attention(q, k, v, kv_len, prefix_len, causal=causal,
                                heads=q.shape[1])
    if k.dtype == jnp.int8:
        # int8 cache reaching the XLA path (MQA, CPU, or
        # VLM_TPU_DECODE_ATTN=xla): bare cast, fused into the dot's
        # operand stream (scales already ride the scores).
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
    return _xla_attention(q, k, v, causal=causal, scale=scale,
                          kv_len=kv_len, kv_valid=kv_valid, bias=bias,
                          prefix_len=prefix_len, kv_layout=kv_layout,
                          k_scale=k_scale, v_scale=v_scale)
