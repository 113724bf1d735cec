"""Fused Pallas decode-step attention over the (optionally int8) KV cache.

The decode step's attention is the KV-cache stream: one query row per slot
against the whole cache. The XLA bshd path (`ops/attention._xla_attention`)
runs it as a batched matvec and measures ~2.5x its HBM stream floor at MHA
decode shapes (B=64, S=1130, H=32, D=128: 1.77 ms vs a 0.72 ms int8-cache
floor) — the 1-row query under-utilizes the MXU and the cache rows arrive
head-strided. This kernel restores the speed-of-light schedule:

- **Contiguous cache DMA.** The cache keeps its pinned, write-friendly
  ``[B, S, KV, D]`` layout (see `models/decoder.kv_uniform_write`) and is
  viewed as ``[B, S, F=KV*D]`` (a free trailing-dims collapse), so each
  grid step streams one fully contiguous ``[Sb, F]`` slab per batch row —
  1 MB DMAs at Sb=256, F=4096, int8.
- **Block-diagonal query trick, built in-kernel.** Per-head matvecs become
  ONE MXU matmul: q is passed compact as ``[B, D, H]`` (0.5 MB at B=64)
  and expanded once per batch row — at the first s-tile, into VMEM scratch
  — to a block-diagonal ``[F, H]`` operand with q[h] placed in its
  KV-head's D-block, so ``scores[s, h] = k_slab[s] @ q_bd[:, h]`` computes
  every head at once. (Round-3 built this operand in XLA and streamed
  ``[B, F, H]`` from HBM every layer — 32 MB/layer of pure overhead at
  BLIP-2 shapes, one of the measured reasons the kernel lost end-to-end in
  the windowed regime.) The (KV x) wasted MACs are free — at B=64/S=1130
  the MXU is busy ~0.44 ms while the int8 DMA floor is 0.72 ms: the kernel
  is bandwidth-bound, which is the point. MQA degenerates to the exact
  matmul (F = D, no waste); the 3B MQA decoder stays on the XLA path
  anyway because XLA picks a faster transposed cache layout there.
- **Streaming softmax over S-tiles** (flash-decode): running per-head
  max / denominator / accumulator in VMEM scratch; one HBM pass over the
  cache. The accumulator is kept ``[F, H]`` (not ``[H, F]``) so every
  flash rescale broadcasts a ``[1, H]`` row across sublanes — Mosaic has
  no lane->sublane transpose for the ``[1, H] -> [H, 1]`` the transposed
  layout would need ("Not implemented: Lane broadcast").
- **int8 cache enters as int8.** The dequant scales ride the scores and
  probabilities (``q.(k8*s) == (q.k8)*s``; see `ops/attention` docstring)
  so the cache is cast int8->bf16 only inside VMEM — the HBM stream is
  genuinely halved, unlike the pre-cast XLA path.
- **Masks in-kernel**: per-slot valid length (``kv_len``) rides the
  scalar-prefetch row. The continuous batcher's rotating-window validity
  is passed as THREE SCALARS per slot (prompt length, admission column,
  generated count — ``kv_window``) and reconstructed from an iota inside
  the kernel, so the window costs no HBM mask traffic at all. (Round 3
  pre-repeated a ``[B, S, H]`` int8 mask in XLA per layer — both the
  materialization and the extra stream are gone.) Arbitrary ``kv_valid``
  masks keep the pre-repeated-to-lane-width path (Mosaic has no
  ``[Sb, 1] -> [Sb, H]`` lane broadcast for a loaded mask).

The per-head output lands in the accumulator's own KV-block of ``[F, H]``;
the caller extracts each head's block outside the kernel (a one-hot einsum
over a [B, KV, D, H] view — ~3% extra HBM traffic at MHA shapes, nothing
at MQA shapes where F == D). An in-kernel extraction would need the
``[F, 1] -> [1, F]`` lane<->sublane relayout Mosaic lacks.

Reference parity target: `ops/attention._xla_attention` with
``kv_layout="bshd"`` (the reference itself delegates decode attention to
HF/torch CUDA internals, `/root/reference/models/base_model.py:69`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ._compat import pallas_interpret

NEG_INF = -1e30


def _decode_kernel(win_ref, qt_ref, k_ref, v_ref, ks_ref, vs_ref, kvv_ref,
                   o_ref, acc_scr, m_scr, l_scr, qbd_scr, *,
                   s_total: int, s_tile: int, group: int, window: int,
                   has_scales: bool, has_valid: bool, has_window: bool,
                   ragged: bool):
    """One (batch, s_tile) program. Grid iterates s-tiles innermost, so the
    VMEM scratch carries the flash-decode running state across tiles of the
    same batch row. Layout rule: all running state is [1, H] / [F, H] so
    every broadcast runs along sublanes (no lane->sublane relayouts)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    d, h = qt_ref.shape[1], qt_ref.shape[2]
    f = k_ref.shape[2]
    kvh = f // d

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        # Block-diagonal query operand [F, H]: tile q^T [D, H] down the
        # sublanes (one copy per KV head) and zero every (row, col) pair
        # whose KV blocks disagree. Static concat — kvh is a compile-time
        # constant; MQA (kvh == 1) reduces to the plain q^T with an
        # all-true mask.
        qt = qt_ref[0]                                          # [D, H]
        qrep = qt if kvh == 1 else jnp.concatenate([qt] * kvh, axis=0)
        rowkv = jax.lax.broadcasted_iota(jnp.int32, (f, h), 0) // d
        colkv = jax.lax.broadcasted_iota(jnp.int32, (f, h), 1) // group
        qbd_scr[:] = jnp.where(rowkv == colkv, qrep,
                               jnp.zeros_like(qrep)).astype(qbd_scr.dtype)

    kb = k_ref[0].astype(jnp.bfloat16)                          # [Sb, F]
    # head_dim**-0.5 is pre-folded into qt by the caller.
    s = jax.lax.dot_general(
        kb, qbd_scr[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [Sb, H]
    if has_scales:
        s = s * ks_ref[0]                                       # [Sb, H]

    # Masking. Iota-derived compares against scalar-prefetch values all
    # share the lane-replicated i1 layout, so the window mask folds into
    # one select. A LOADED mask (kv_valid) is lane-distributed and Mosaic
    # cannot relayout between the two ("Invalid relayout ... vector<...xi1>")
    # — it stays a separate select.
    rows = jax.lax.broadcasted_iota(jnp.int32, (s_tile, h), 0) + j * s_tile
    if has_window:
        # Rotating decode window from 3 scalars (see kv_window below):
        # prompt rows [0, pcol) always valid; window row r holds the
        # occupant's token of age (r - pcol - acol) mod W, valid iff that
        # age < gcnt. Matches generate/batcher._decode_chunk_impl's
        # valid_key construction bit-for-bit.
        pcol = win_ref[b, 1]
        acol = win_ref[b, 2]
        gcnt = win_ref[b, 3]
        age = jnp.mod(rows - pcol - acol, window)
        live = (rows < jnp.minimum(pcol, s_total)) | (
            (rows < jnp.minimum(pcol + window, s_total)) & (age < gcnt))
        # kv_len composes with the window (win[b, 0] defaults to s_total
        # when the caller passes none): a caller passing both gets rows
        # beyond kv_len masked, not silently unmasked. Same iota-vs-scalar
        # compare layout as the window predicates, so it folds into the
        # one select.
        live = live & (rows < win_ref[b, 0])
        s = jnp.where(live, s, NEG_INF)
    else:
        s = jnp.where(rows < jnp.minimum(s_total, win_ref[b, 0]), s, NEG_INF)
        if has_valid:
            s = jnp.where(kvv_ref[0] != 0, s, NEG_INF)

    # Streaming softmax update (per head column).
    m_new = jnp.maximum(m_scr[:], jnp.max(s, axis=0, keepdims=True))
    corr = jnp.exp(m_scr[:] - m_new)                            # [1, H]
    p = jnp.exp(s - m_new)                                      # [Sb, H]
    # Fully-masked tiles produce p rows of exp(NEG_INF - NEG_INF) = 1;
    # zero them so they contribute nothing to l/acc. The predicate reads
    # the masked scores themselves (real scores are O(10), never near
    # NEG_INF) so its i1 layout matches, avoiding mask-mixing relayouts.
    alive = s > (NEG_INF * 0.5)                                 # [Sb, H]
    p = jnp.where(alive, p, 0.0)
    l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=0, keepdims=True)
    m_scr[:] = m_new
    if has_scales:
        vs = vs_ref[0]                                          # [Sb, H]
        if ragged:
            # Out-of-bounds block rows hold undefined values (NaN in
            # interpret mode); 0-probability x NaN-scale would still NaN.
            vs = jnp.where(alive, vs, 0.0)
        pv = p * vs                                             # [Sb, H]
    else:
        pv = p
    vb = v_ref[0].astype(jnp.bfloat16)                          # [Sb, F]
    if ragged:
        # Same undefined-padding hazard through the vb^T @ pv dot (0 x NaN).
        # Static gate: caches whose length is a tile multiple skip this
        # select entirely; kv_len/kv_valid masking already rides the
        # (always-masked) score side. Only rows past s_total hold undefined
        # values, so a full-shape iota compare suffices (and avoids the
        # [Sb, 1] -> [Sb, F] lane broadcast Mosaic lacks).
        rows_f = (jax.lax.broadcasted_iota(jnp.int32, (s_tile, vb.shape[1]), 0)
                  + j * s_tile)
        vb = jnp.where(rows_f < s_total, vb, jnp.bfloat16(0))
    tile_out = jax.lax.dot_general(
        vb, pv.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [F, H]
    acc_scr[:] = acc_scr[:] * corr + tile_out

    @pl.when(j == nt - 1)
    def _finish():
        denom = jnp.maximum(l_scr[:], 1e-30)                    # [1, H]
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "s_tile", "window",
                     "has_scales", "has_valid", "has_window"))
def _decode_call(qt, k2, v2, ks2, vs2, kvv2, win, *, heads: int,
                 s_tile: int, window: int, has_scales: bool,
                 has_valid: bool, has_window: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s_total, f = k2.shape
    d = qt.shape[1]
    nt = pl.cdiv(s_total, s_tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, d, heads), lambda i, j, win_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, f), lambda i, j, win_ref: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, f), lambda i, j, win_ref: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # Unused (dummy) scale/valid inputs are [B, s_tile, ...]-shaped;
            # pin their block index to 0 so no out-of-bounds block is mapped.
            pl.BlockSpec((1, s_tile, heads),
                         (lambda i, j, win_ref: (i, j, 0)) if has_scales
                         else (lambda i, j, win_ref: (i, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, heads),
                         (lambda i, j, win_ref: (i, j, 0)) if has_scales
                         else (lambda i, j, win_ref: (i, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile, heads),
                         (lambda i, j, win_ref: (i, j, 0)) if has_valid
                         else (lambda i, j, win_ref: (i, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, heads),
                               lambda i, j, win_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((f, heads), jnp.float32),        # output accumulator
            pltpu.VMEM((1, heads), jnp.float32),        # running max
            pltpu.VMEM((1, heads), jnp.float32),        # running denominator
            pltpu.VMEM((f, heads), jnp.bfloat16),       # block-diagonal q
        ],
    )
    kernel = functools.partial(
        _decode_kernel, s_total=s_total, s_tile=s_tile,
        group=heads // (f // d), window=window,
        has_scales=has_scales, has_valid=has_valid, has_window=has_window,
        ragged=bool(s_total % s_tile))
    bytes_cache = k2.size * k2.dtype.itemsize * 2
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, f, heads), jnp.bfloat16),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s_total * f * heads,
            bytes_accessed=bytes_cache + b * heads * f * 2,
            transcendentals=b * s_total * heads),
        interpret=pallas_interpret(),
    )(win, qt, k2, v2, ks2, vs2, kvv2)
    return out


def flash_decode_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                           kv_len: Optional[jax.Array] = None,
                           kv_valid: Optional[jax.Array] = None,
                           kv_window: Optional[Tuple] = None,
                           k_scale: Optional[jax.Array] = None,
                           v_scale: Optional[jax.Array] = None,
                           s_tile: int = 256) -> jax.Array:
    """Decode-step attention. ``q``: [B, H, 1, D]; ``k``/``v``: the cache in
    its native ``[B, S, KV, D]`` layout — int8 (with ``k_scale``/``v_scale``
    [B, S, KV, 1]) or the compute dtype. ``kv_len``: [B] valid lengths;
    ``kv_valid``: [B, S] row validity (arbitrary mask — costs a pre-repeated
    [B, S, H] stream); ``kv_window``: ``(pcol, window, acol, gcnt)`` with
    scalar prompt column ``pcol``, static window size ``window`` and per-slot
    [B] admission columns / generated counts — the continuous batcher's
    rotating-window validity as scalars, reconstructed in-kernel for free
    (preferred over ``kv_valid`` when both describe the same mask;
    ``kv_valid`` is ignored when ``kv_window`` is given, while ``kv_len``
    composes — rows at or beyond ``kv_len`` are masked in both). Returns
    [B, H, 1, D] in q's dtype; numerics match `_xla_attention(bshd)` for
    every row with at least one live KV position. A fully-masked row
    (kv_len == 0 or kv_valid all-False) diverges by design: this kernel
    returns zeros (denominator clamped to 1e-30) where the XLA softmax
    degenerates to uniform probabilities and returns the mean of V. The
    batcher only hits that case on inactive slots, whose outputs are
    discarded."""
    b, h, sq, d = q.shape
    if sq != 1:
        raise ValueError(f"flash_decode_attention is single-token (Sq=1), "
                         f"got Sq={sq}")
    s_total, kvh = k.shape[1], k.shape[2]
    f = kvh * d
    has_scales = k_scale is not None
    if has_scales != (v_scale is not None):
        raise ValueError("k_scale and v_scale must be provided together")
    has_window = kv_window is not None
    has_valid = kv_valid is not None and not has_window

    group = h // kvh
    # Compact transposed query [B, D, H] (head_dim scale folded in); the
    # kernel expands it to the block-diagonal [F, H] operand in VMEM.
    qt = (q.reshape(b, h, d).astype(jnp.float32) * (d ** -0.5)) \
        .transpose(0, 2, 1).astype(jnp.bfloat16)

    k2 = k.reshape(b, s_total, f)
    v2 = v.reshape(b, s_total, f)
    # VMEM budget: the k/v blocks are double-buffered by the grid pipeline
    # (2 inputs x 2 buffers x st x F x itemsize); keep them within ~10 MB of
    # the 16 MB scoped-vmem limit, leaving room for scratch/scales/output.
    st_cap = (10 << 20) // (4 * f * jnp.dtype(k2.dtype).itemsize)
    st = min(s_tile, max(32, s_total), max(32, st_cap))
    if st >= 128:
        st = (st // 128) * 128
    if has_scales:
        # Per-row KV-head scales broadcast to the query heads they serve
        # (scores land in [S, H]). MHA (group == 1): a pure reshape.
        ks2 = jnp.repeat(k_scale.reshape(b, s_total, kvh).astype(jnp.float32),
                         group, axis=2)
        vs2 = jnp.repeat(v_scale.reshape(b, s_total, kvh).astype(jnp.float32),
                         group, axis=2)
    else:
        ks2 = jnp.zeros((b, st, h), jnp.float32)
        vs2 = jnp.zeros((b, st, h), jnp.float32)
    if has_valid:
        # Pre-repeat to lane width: [B, S, H] int8 (2% of the int8 cache
        # stream) so the kernel's where() is full-shape — Mosaic has no
        # [Sb, 1] -> [Sb, H] lane broadcast.
        kvv2 = jnp.repeat(kv_valid.reshape(b, s_total, 1).astype(jnp.int8),
                          h, axis=2)
    else:
        kvv2 = jnp.zeros((b, st, h), jnp.int8)
    if kv_len is None:
        kvl = jnp.full((b,), s_total, jnp.int32)
    else:
        kvl = kv_len.astype(jnp.int32)
    window = 1
    if has_window:
        pcol, window, acol, gcnt = kv_window
        window = int(window)
        win = jnp.stack([
            kvl,
            jnp.broadcast_to(jnp.asarray(pcol, jnp.int32), (b,)),
            acol.astype(jnp.int32),
            gcnt.astype(jnp.int32)], axis=1)
    else:
        zero = jnp.zeros((b,), jnp.int32)
        win = jnp.stack([kvl, zero, zero, zero], axis=1)

    out2 = _decode_call(qt, k2, v2, ks2, vs2, kvv2, win, heads=h,
                        s_tile=st, window=window, has_scales=has_scales,
                        has_valid=has_valid, has_window=has_window)
    # Each head's result lives in its own KV head's D-block of [F, H].
    out4 = out2.reshape(b, kvh, d, h)
    if kvh == 1:
        out = out4[:, 0].transpose(0, 2, 1)                     # [B, H, D]
    else:
        pick = jax.nn.one_hot(jnp.arange(h) // group, kvh,
                              dtype=out4.dtype)
        out = jnp.einsum("bkdh,hk->bhd", out4, pick)
    return out[:, :, None, :].astype(q.dtype)
