"""Weight quantization: int8 per-channel and int4 group-wise, with fused
Pallas dequant-matmul kernels.

TPU-native replacement for the bitsandbytes capability surface the reference
requests via quantization strings (`/root/reference/models/base_model.py:85-97`:
``load_in_8bit``, nf4 4-bit double-quant). Semantics are
capability-equivalent, not bit-equivalent (SURVEY.md §7 "Quantization
parity"): on TPU the idiomatic scheme is

- **8bit**: per-output-channel symmetric int8 weights, bf16 activations.
  HBM traffic for weights halves vs bf16; the Pallas kernel dequantizes
  tiles in VMEM and feeds the MXU in bf16 — one pass, no materialized fp
  copy of the weight matrix;
- **4bit**: two nibbles packed per int8 along the input dim with per-
  [group_size × column] scales (the nf4-analogue block scheme), unpacked
  and dequantized in VMEM.

Both paths fall back to pure-jnp dequant matmul off-TPU (same numerics).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ._compat import pallas_interpret



class QuantizedWeight(NamedTuple):
    """int8: q [in, out] int8, scale [1, out] f32, group_size == 0.
    int4: q [in/2, out] int8 (two nibbles per byte along in), scale
    [n_groups, out] f32, group_size > 0."""
    q: jax.Array
    scale: jax.Array
    group_size: int = 0

    @property
    def bits(self) -> int:
        return 4 if self.group_size else 8


# ------------------------- quantize -------------------------

def quantize_int8(w: jax.Array) -> QuantizedWeight:
    """Per-output-channel symmetric int8 quantization of [in, out]."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)       # [1, out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight(q=q, scale=scale, group_size=0)


def quantize_int4(w: jax.Array, group_size: int = 128) -> QuantizedWeight:
    """Group-wise symmetric int4 quantization of [in, out]; groups run along
    the input dim. ``in`` must divide by ``group_size`` (pad first)."""
    w = w.astype(jnp.float32)
    k, n = w.shape
    assert k % group_size == 0, (k, group_size)
    g = k // group_size
    wg = w.reshape(g, group_size, n)
    absmax = jnp.max(jnp.abs(wg), axis=1)                     # [g, n]
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7).astype(jnp.int8)
    q = q.reshape(k, n)
    # pack pairs along the input dim: byte = (hi << 4) | (lo & 0xF)
    lo = q[0::2]
    hi = q[1::2]
    packed = ((hi.astype(jnp.int32) << 4) |
              (lo.astype(jnp.int32) & 0xF)).astype(jnp.int8)
    return QuantizedWeight(q=packed, scale=scale, group_size=group_size)


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """[in/2, out] int8 → [in, out] int8 (sign-extended nibbles)."""
    as_i32 = packed.astype(jnp.int32)
    lo = (as_i32 << 28) >> 28            # sign-extend low nibble
    hi = as_i32 >> 4                     # arithmetic shift keeps sign
    k2, n = packed.shape
    out = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
    return out.astype(jnp.int8)


def dequantize(qw: QuantizedWeight, dtype=jnp.float32) -> jax.Array:
    if qw.group_size == 0:
        return (qw.q.astype(jnp.float32) * qw.scale).astype(dtype)
    q = _unpack_int4(qw.q).astype(jnp.float32)
    k, n = q.shape
    g = qw.scale.shape[0]
    q = q.reshape(g, qw.group_size, n) * qw.scale[:, None, :]
    return q.reshape(k, n).astype(dtype)


# ------------------------- activation quantization -------------------------

def quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 activation quantization (the llm.int8 scheme,
    minus outlier decomposition): x [m, K] → (q int8 [m, K], scale [m, 1]).
    One fused elementwise pass under XLA."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _int8xint8_kernel(qx_ref, sx_ref, qw_ref, sw_ref, o_ref):
    """int8 × int8 on the MXU (2x bf16 throughput on v5e), int32 accumulate,
    scales applied on the accumulator."""
    acc = jax.lax.dot_general(
        qx_ref[:], qw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # [tm, tn]
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
                ).astype(o_ref.dtype)


def _pick_block_n(n: int, cap: int) -> int:
    """Largest lane-aligned tile ≤ cap that divides n exactly. Padding the
    weight operand to a non-dividing tile materializes a full padded copy
    of the [K, n] matrix as an HLO temp *per matmul call* (measured: 44 MB
    per 7B MLP layer, an OOM contributor at 24+ decode slots) — a dividing
    tile streams the weight from its parameter buffer instead."""
    for b in range(min(cap, n), 127, -128):
        if n % b == 0:
            return b
    return min(cap, n)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "out_dtype"))
def _int8xint8_matmul_pallas(qx, sx, qw, sw, *, block_m=256, block_n=512,
                             out_dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = qx.shape
    _, n = qw.shape
    bm = min(block_m, max(32, m))
    bn = _pick_block_n(n, block_n)
    pad_m = (-m) % bm
    pad_n = (-n) % bn
    if pad_m:
        qx = jnp.pad(qx, ((0, pad_m), (0, 0)))
        sx = jnp.pad(sx, ((0, pad_m), (0, 0)))
    if pad_n:
        qw = jnp.pad(qw, ((0, 0), (0, pad_n)))
        sw = jnp.pad(sw, ((0, 0), (0, pad_n)))

    out = pl.pallas_call(
        _int8xint8_kernel,
        out_shape=jax.ShapeDtypeStruct((m + pad_m, n + pad_n), out_dtype),
        grid=(pl.cdiv(m + pad_m, bm), pl.cdiv(n + pad_n, bn)),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(qx, sx, qw, sw)
    return out[:m, :n]


def quant_matmul_dynamic(x: jax.Array, qw: QuantizedWeight, *,
                         out_dtype=None,
                         use_pallas: bool | None = None) -> jax.Array:
    """llm.int8-style matmul: dynamic per-row int8 activations × int8
    weights on the MXU (v5e int8 peak is 2x bf16). int8-weight mode only.

    Default path is XLA's NATIVE int8 dot — int8 operands passed straight
    to ``dot_general`` with an int32 accumulator. Measured on v5e at the
    3B prefill shapes (m=12928): 229/220 TFLOP/s on the k=2048→16384 /
    k=16384→2048 MLP matmuls vs 144/132 for bf16 — the real 1.6x int8 MXU
    win. The hand-written Pallas tile kernel reaches only 132/130 TFLOP/s
    (slower than bf16: its one-shot [bm,K]x[K,bn] tiles can't pipeline the
    weight stream the way XLA's k-tiled schedule does) and the old
    ``.astype(int32)`` fallback upcast the operands before the dot, missing
    the int8 MXU path entirely. ``use_pallas=True`` keeps the kernel
    reachable for A/B."""
    assert qw.group_size == 0, "dynamic path requires int8 weights"
    out_dtype = out_dtype or x.dtype
    qx, sx = quantize_activations(x)
    if use_pallas:
        # Shrink tiles for wide contractions so the double-buffered int8
        # operand tiles stay inside the ~16 MB VMEM budget.
        wide = x.shape[1] > 8192
        return _int8xint8_matmul_pallas(
            qx, sx, qw.q, qw.scale,
            block_m=128 if wide else 256,
            block_n=256 if wide else 512,
            out_dtype=jnp.float32).astype(out_dtype)
    acc = jax.lax.dot_general(qx, qw.q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * qw.scale).astype(out_dtype)


# ------------------------- llm.int8 outlier decomposition ----------------

def quant_matmul_outlier(x: jax.Array, qw: QuantizedWeight, *,
                         n_outliers: int = 32,
                         out_dtype=None,
                         use_pallas: bool | None = None) -> jax.Array:
    """llm.int8-style matmul with outlier decomposition
    (Dettmers et al. 2022 — the scheme bitsandbytes' ``load_in_8bit`` runs,
    `/root/reference/models/base_model.py:85-91`).

    Activation columns with the largest magnitudes (emergent outlier
    features) destroy per-row int8 activation scales. The ``n_outliers``
    highest-|x| input columns are therefore computed in bf16 against the
    dequantized weight rows, and only the well-behaved remainder goes
    through the int8×int8 MXU path. Static shapes throughout (fixed
    outlier budget → jit-stable), unlike bitsandbytes' dynamic
    threshold-6.0 selection; budget 32 covers the reported outlier counts
    for ≤13B models.
    """
    assert qw.group_size == 0, "outlier decomposition requires int8 weights"
    out_dtype = out_dtype or x.dtype
    k = x.shape[-1]
    n_out = min(n_outliers, k)
    col_mag = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=0)     # [K]
    _, idx = jax.lax.top_k(col_mag, n_out)                        # [n_out]
    # bf16 path for the outlier columns. The [m, n] correction matrix is
    # materialized in bf16, not f32 — bitsandbytes itself computes the
    # outlier matmul in fp16, so a bf16 correction stays within the same
    # accuracy class (measured 5e-4 relative vs the f32 correction, under
    # the ~1e-2 int8 rounding floor) while halving the correction's HBM
    # traffic: 5.84→5.14 / 7.24→7.08 / 2.30→2.06 ms at the three 7B
    # prefill shapes (m=12928; v5e microbench).
    x_out = jnp.take(x, idx, axis=-1)                             # [m, n_out]
    w_rows = jnp.take(qw.q, idx, axis=0).astype(jnp.float32) * qw.scale
    y_out = jnp.dot(x_out.astype(jnp.bfloat16),
                    w_rows.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    # int8 path for everything else (outlier columns zeroed → contribute 0)
    mask = jnp.ones((k,), x.dtype).at[idx].set(0)
    y_int8 = quant_matmul_dynamic(x * mask, qw, out_dtype=jnp.float32,
                                  use_pallas=use_pallas)
    return (y_int8 + y_out.astype(jnp.float32)).astype(out_dtype)


# ------------------------- matmul kernels -------------------------

def _int8_matmul_kernel(x_ref, q_ref, s_ref, o_ref):
    x = x_ref[:]                                         # [tm, K] bf16
    # Dequantize in VMEM and feed the MXU in bf16 (fp32 operands would run
    # the systolic array at 1/4 rate); accumulate fp32, apply the
    # per-channel scale on the fp32 accumulator for accuracy.
    w = q_ref[:].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "out_dtype"))
def _int8_matmul_pallas(x, q, scale, *, block_m=256, block_n=512,
                        out_dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    _, n = q.shape
    bm = min(block_m, m)
    bn = _pick_block_n(n, block_n)
    pad_m = (-m) % bm
    pad_n = (-n) % bn
    xp = jnp.pad(x, ((0, pad_m), (0, 0))) if pad_m else x
    qp = jnp.pad(q, ((0, 0), (0, pad_n))) if pad_n else q
    sp = jnp.pad(scale, ((0, 0), (0, pad_n))) if pad_n else scale

    out = pl.pallas_call(
        _int8_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m + pad_m, n + pad_n), out_dtype),
        grid=(pl.cdiv(m + pad_m, bm), pl.cdiv(n + pad_n, bn)),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(xp, qp, sp)
    return out[:m, :n]


def _int4_matmul_kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref, *,
                        rows_per_group: int, mxu_dtype=jnp.bfloat16):
    """Fused int4 dequant-matmul tile.

    The weight arrives packed two-nibbles-per-byte along the input dim
    (packed row i holds original rows 2i in the low nibble, 2i+1 in the
    high). Instead of re-interleaving in VMEM, the contraction is split:

        y = x[:, 0::2] @ LO + x[:, 1::2] @ HI

    where LO/HI are the sign-extended nibble planes — two MXU dots against
    operands produced entirely in VMEM, no [K, n] fp weight ever exists in
    HBM. Group scales (groups along the input dim) collapse to one scale
    row per ``rows_per_group = group_size // 2`` packed rows, identical for
    both planes.
    """
    a = q_ref[:].astype(jnp.int32)                       # [bk2, bn]
    lo = ((a << 28) >> 28).astype(jnp.float32)
    hi = (a >> 4).astype(jnp.float32)
    s = s_ref[:]                                         # [g_tile, bn] f32
    srep = jnp.repeat(s, rows_per_group, axis=0).astype(jnp.float32)
    wlo = (lo * srep).astype(mxu_dtype)
    whi = (hi * srep).astype(mxu_dtype)
    acc = jax.lax.dot_general(
        xe_ref[:].astype(mxu_dtype), wlo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        xo_ref[:].astype(mxu_dtype), whi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_m",
                                             "block_n", "out_dtype"))
def _int4_matmul_pallas(x, q, scale, *, group_size, block_m=256,
                        block_n=256, out_dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    k2, n = q.shape                                       # k2 = k // 2
    g = scale.shape[0]
    rows_per_group = group_size // 2

    bm = min(block_m, max(8, m))
    bn = _pick_block_n(n, block_n)
    pad_m = (-m) % bm
    pad_n = (-n) % bn
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    if pad_m:
        xe = jnp.pad(xe, ((0, pad_m), (0, 0)))
        xo = jnp.pad(xo, ((0, pad_m), (0, 0)))
    qp = jnp.pad(q, ((0, 0), (0, pad_n))) if pad_n else q
    sp = jnp.pad(scale, ((0, 0), (0, pad_n))) if pad_n else scale

    # Interpret mode (CPU backend) compiles the kernel body with XLA:CPU,
    # whose DotThunk cannot execute bf16×bf16→f32; run the check-mode dots
    # in f32 (real TPU runs feed the MXU bf16 at full rate).
    kernel = functools.partial(
        _int4_matmul_kernel, rows_per_group=rows_per_group,
        mxu_dtype=jnp.float32 if pallas_interpret() else jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m + pad_m, n + pad_n), out_dtype),
        grid=(pl.cdiv(m + pad_m, bm), pl.cdiv(n + pad_n, bn)),
        in_specs=[
            pl.BlockSpec((bm, k2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(xe, xo, qp, sp)
    return out[:m, :n]


def quant_matmul(x: jax.Array, qw: QuantizedWeight, *,
                 out_dtype=None, use_pallas: bool | None = None) -> jax.Array:
    """``x @ dequant(qw)``: [m, in] × [in, out] → [m, out].

    On TPU both int8 (per-channel) and int4 (grouped, packed) run fused
    Pallas dequant-in-VMEM kernels; off-TPU uses the jnp dequant fallback
    (same numerics, XLA fuses the dequant into the matmul's operand stream).
    """
    out_dtype = out_dtype or x.dtype
    if use_pallas is None:
        import os

        # The kernels keep [block_m, K]-shaped x tiles plus a [K, block_n]
        # weight tile in VMEM; shrink tiles for wide contractions so both
        # fit the ~16 MB budget. VLM_TPU_QUANT_XLA=1 forces the XLA-fused
        # dequant matmul everywhere (A/B knob for kernel-vs-fusion
        # measurements).
        #
        # int8 at decode sizes (m < 512) defaults to the XLA path: the
        # int8→bf16 cast fuses into the matmul's operand stream and beat
        # the in-VMEM dequant kernel by 1.6-1.7x on v5e (7B B=12: 15.6 vs
        # 25.0 ms/step; 3B B=32: 4.46 ms vs 7.6 ms even for bf16 weights).
        # int4 keeps the fused kernel at decode — XLA cannot fuse the
        # nibble unpack and collapses (33.8 → 11.7 img/s end-to-end).
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and x.ndim == 2
                      and x.shape[1] <= 16384
                      and (qw.group_size > 0 or x.shape[0] >= 512)
                      and os.environ.get("VLM_TPU_QUANT_XLA", "0") != "1")
    wide = x.shape[1] > 8192
    if use_pallas and qw.group_size == 0:
        return _int8_matmul_pallas(
            x, qw.q, qw.scale,
            block_m=128 if wide else 256,
            block_n=128 if wide else 512,
            out_dtype=jnp.float32).astype(out_dtype)
    if use_pallas and qw.group_size > 0:
        return _int4_matmul_pallas(
            x, qw.q, qw.scale, group_size=qw.group_size,
            block_m=64 if wide else 256,
            block_n=128 if wide else 256,
            out_dtype=jnp.float32).astype(out_dtype)
    w = dequantize(qw, dtype=jnp.bfloat16 if out_dtype == jnp.bfloat16
                   else jnp.float32)
    y = jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)
    return y.astype(out_dtype)
