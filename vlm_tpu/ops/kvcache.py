"""Per-slot KV-cache scatter writes (Pallas).

The continuous batcher's decode step writes one new K/V row per sequence at a
*per-sequence* offset (each slot is at its own length — SURVEY.md §7
"Continuous batching"). The two XLA-expressible forms are both wrong on TPU:

- vmapped ``dynamic_update_slice`` lowers to scatters that serialize
  (measured ~3 ms/layer on v5e, round 1);
- a masked select streams the *entire* cache layer through HBM every step
  (read + write); at batch 128 on a 3B model that is ~3.5 GB/step of pure
  overhead.

This kernel makes the write O(new): grid over the batch, the per-sequence
write offset arrives via scalar prefetch and selects the one target row of
the cache through the output ``index_map``; ``input_output_aliases`` keeps
the rest of the (donated) cache in place. Traffic per step: B rows, not
B × max_len.

The wave engine never needs this — its slots advance in lockstep, so a
scalar-offset ``dynamic_update_slice`` already writes O(new)
(`vlm_tpu/models/decoder.py` ``uniform_write``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._compat import pallas_interpret


def _write_kernel(start_ref, k_new_ref, v_new_ref, k_in_ref, v_in_ref,
                  k_out_ref, v_out_ref):
    del start_ref, k_in_ref, v_in_ref      # consumed by the index maps
    k_out_ref[:] = k_new_ref[:]
    v_out_ref[:] = v_new_ref[:]


def _kv_write_call(k_cache, v_cache, k_new, v_new, start, *, grid,
                   block_b, new_map, cache_map):
    """Shared pallas_call scaffolding for the two in-place KV writers:
    per-sequence scatter (grid=(B,), 1-row blocks) and uniform column
    (grid=(1,), whole-batch block). Inputs: 0=start (scalar prefetch),
    1=k_new, 2=v_new, 3=k_cache, 4=v_cache — the caches alias onto the
    outputs (in-place)."""
    s, h, d = k_new.shape[1], k_cache.shape[2], k_cache.shape[3]
    new_spec = pl.BlockSpec((block_b, s, h, d), new_map)
    cache_spec = pl.BlockSpec((block_b, s, h, d), cache_map)
    out = pl.pallas_call(
        _write_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[new_spec, new_spec, cache_spec, cache_spec],
            out_specs=[cache_spec, cache_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)],
        input_output_aliases={3: 0, 4: 1},
        interpret=pallas_interpret(),
    )(start, k_new, v_new, k_cache, v_cache)
    return out[0], out[1]


def _kv_scatter_write_tpu(k_cache, v_cache, k_new, v_new, start):
    b = k_cache.shape[0]
    s = k_new.shape[1]
    # Block = the S new rows of one sequence. The output index_map points
    # dim 1 at this sequence's write offset (block index == element index
    # only because the block spans 1 unit of dim 1 per row; S>1 writes need
    # start[i] % s == 0, which holds for the only S>1 caller: prefill at 0).
    return _kv_write_call(
        k_cache, v_cache, k_new, v_new, start, grid=(b,), block_b=1,
        new_map=lambda i, st: (i, 0, 0, 0),
        cache_map=lambda i, st: (i, st[i] // s, 0, 0))


def kv_scatter_write(k_cache: jax.Array, v_cache: jax.Array,
                     k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array):
    """Write ``k_new``/``v_new`` [B, S, H, D] into the length-major caches
    [B, max_len, H, D] at per-sequence row offsets ``start`` [B], in place.

    S must be 1 (decode) unless every ``start`` is a multiple of S (the
    batcher only ever calls this with S == 1).
    """
    if k_new.shape[1] > 1:
        # S is static under jit, so this is a compile-time gate: the S>1
        # index_map rounds starts down to multiples of S (st[i]//S) and
        # would silently misplace rows for misaligned offsets. No current
        # caller needs S>1; use kv_masked_write for multi-row windows.
        raise ValueError(
            f"kv_scatter_write requires S == 1 (got S={k_new.shape[1]}); "
            f"use kv_masked_write for multi-token windows")
    start = start.astype(jnp.int32)
    k_new = k_new.astype(k_cache.dtype)
    v_new = v_new.astype(v_cache.dtype)
    return _kv_scatter_write_tpu(k_cache, v_cache, k_new, v_new, start)


def _kv_uniform_write_tpu(k_cache, v_cache, k_new, v_new, start):
    b = k_cache.shape[0]
    s = k_new.shape[1]
    return _kv_write_call(
        k_cache, v_cache, k_new, v_new, start, grid=(1,), block_b=b,
        new_map=lambda i, st: (0, 0, 0, 0),
        cache_map=lambda i, st: (0, st[0] // s, 0, 0))


def kv_uniform_write(k_cache: jax.Array, v_cache: jax.Array,
                     k_new: jax.Array, v_new: jax.Array,
                     start: jax.Array):
    """Write one new K/V row per sequence at the SAME row offset
    ``start[0]`` for every sequence (the rotating decode window / wave
    decode), in place, as a single one-program Pallas kernel.

    Functionally identical to a scalar-offset ``dynamic_update_slice`` —
    it exists because the dus leaves XLA free to pick a transposed layout
    for the cache inside the decode-chunk jit, which then RELAYOUT-COPIES
    every donated cache argument at the loop boundary (measured: 64 ×
    78.8 MB HLO temps = 4.95 GB on LLaVA-7B at 12 slots → OOM). A Pallas
    op touching the cache pins the default layout end-to-end, exactly as
    the per-slot scatter kernel used to, while staying O(new) with ONE
    program instead of a B-program grid.
    """
    if k_new.shape[1] != 1:
        raise ValueError(
            f"kv_uniform_write requires S == 1 (got S={k_new.shape[1]}); "
            f"prefill-sized windows use dynamic_update_slice")
    start = start.astype(jnp.int32)
    k_new = k_new.astype(k_cache.dtype)
    v_new = v_new.astype(v_cache.dtype)
    return _kv_uniform_write_tpu(k_cache, v_cache, k_new, v_new,
                                 start[:1])


def kv_masked_write(cache_layer: jax.Array, new: jax.Array,
                    start: jax.Array) -> jax.Array:
    """XLA fallback: vectorized masked select over the length axis (streams
    the full cache layer — correct everywhere, used off-TPU)."""
    b, s, h, d = new.shape
    max_len = cache_layer.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, max_len, 1, 1), 1)
    rel = pos - start[:, None, None, None]
    in_window = (rel >= 0) & (rel < s)
    if s == 1:
        update = jnp.broadcast_to(new, (b, max_len, h, d))
    else:
        idx = jnp.clip(rel[:, :, 0, 0], 0, s - 1)
        update = jnp.take_along_axis(new, idx[:, :, None, None], axis=1)
    return jnp.where(in_window, update.astype(cache_layer.dtype), cache_layer)
