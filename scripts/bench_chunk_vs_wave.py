#!/usr/bin/env python
"""Apples-to-apples decode-step cost: continuous-batcher chunk vs wave
engine, at IDENTICAL cache geometry (same prompt, same max_new_tokens).

The r3/r4 numbers that framed "the chunk gap" were never comparable:
bench_decode_step ran a short prompt (cache_len ~390) while
bench_batcher_phases sized its cache for the chunk count
(cache_len = 404 + 336 = 740) — an extra ~0.8 GB/step of MQA KV stream
on 3B at B=128. This script measures both at the headline geometry and
uses the same marginal method on both sides so per-chunk/per-call fixed
costs drop out:

- wave:  (t(hi) - t(lo)) / (hi - lo)               [caps traced]
- chunk: (t(K=hi_steps) - t(K=lo_steps)) / delta   [max_steps traced]

Usage: python scripts/bench_chunk_vs_wave.py [--batch 128] [--quant bf16]
"""

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from vlm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--model", default="paligemma")
    ap.add_argument("--size", default="3b")
    ap.add_argument("--quant", default="bf16")
    ap.add_argument("--lo", type=int, default=10)
    ap.add_argument("--hi", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--profile", default=None,
                    help="dump a jax.profiler trace of one hi-step chunk "
                         "and one wave run to this directory")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vlm_tpu.generate.batcher import ContinuousBatcher
    from vlm_tpu.generate.decode import GenerationEngine, build_prompt_ids
    from vlm_tpu.models.decoder import init_kv_cache
    from vlm_tpu.models.factory import VLMModelFactory
    from vlm_tpu.models.vlm import num_image_tokens
    from vlm_tpu.ops.preprocess import host_batch, normalize_images

    log(f"[a/b] devices: {jax.devices()}")
    t0 = time.perf_counter()
    model = VLMModelFactory.create_model(args.model, quantization=args.quant,
                                         size=args.size)
    log(f"[a/b] model built in {time.perf_counter() - t0:.1f}s")

    from bench import MIVIA_PROMPT as prompt   # headline prompt -> plen 404
    pre_t, post_t, bos_pre, bos_post = model.format_prompt(prompt)
    B, lo, hi = args.batch, args.lo, args.hi
    pre_ids, post_ids, plen = build_prompt_ids(
        model.tokenizer, pre_t, post_t, num_image_tokens(model.cfg), B,
        add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
    plen_scalar = int(plen[0])
    cache_len = plen_scalar + hi
    log(f"[a/b] B={B} prompt_len={plen_scalar} max_new={hi} "
        f"cache_len={cache_len}")

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (128, 96, 3), dtype=np.uint8))
    pixels = normalize_images(
        jnp.asarray(host_batch([img] * B, model.recipe)),
        recipe=model.recipe, compute_dtype=model.policy.compute_dtype)

    # ---- wave engine marginal ----
    eng = GenerationEngine(model.module, model.cfg, batch_size=B,
                           max_prompt_len=plen_scalar, max_new_tokens=hi,
                           cache_dtype=model.policy.compute_dtype,
                           eos_id=-1, pad_id=model.tokenizer.pad_id)

    def wave(n_tok):
        caps = jnp.full((B,), n_tok, jnp.int32)
        r = eng.generate(model.params, pixels, pre_ids, post_ids, plen,
                         max_new_per_seq=caps)
        _ = np.asarray(r.tokens)

    wave(lo)
    wave(hi)
    t_lo = t_hi = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter(); wave(lo)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); wave(hi)
        t_hi = min(t_hi, time.perf_counter() - t0)
    wave_ms = 1e3 * (t_hi - t_lo) / (hi - lo)
    log(f"[a/b] wave   step {wave_ms:6.2f} ms  {B/(wave_ms/1e3):8.0f} tok/s"
        f"  (lo {t_lo:.3f}s hi {t_hi:.3f}s)")

    # ---- batcher chunk marginal (same cache geometry) ----
    batcher = ContinuousBatcher(
        model.module, model.cfg, batch_size=B,
        max_prompt_len=plen_scalar, max_new_tokens=hi,
        admit_block=B, cache_dtype=model.policy.compute_dtype,
        eos_id=-1, pad_id=model.tokenizer.pad_id)
    assert batcher.cache_len == cache_len

    def chunk_run(n_steps):
        # Fresh state + admission each run so every chunk starts from the
        # same column origin; caps = hi keeps all slots active throughout.
        cache = init_kv_cache(model.cfg.decoder, B, batcher.cache_len,
                              model.policy.compute_dtype)
        state = batcher._init_state()
        caps_arr = jnp.full((B,), hi, jnp.int32)
        state, cache = batcher._admit_group(
            model.params, pixels, pre_ids, post_ids, plen, caps_arr,
            state, cache)
        packed, state, cache = batcher._decode_chunk(
            model.params, state, cache, jnp.asarray(B + 1, jnp.int32),
            jnp.asarray(n_steps, jnp.int32))
        _ = np.asarray(packed)

    chunk_run(lo)
    chunk_run(hi)
    t_lo = t_hi = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter(); chunk_run(lo)
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); chunk_run(hi)
        t_hi = min(t_hi, time.perf_counter() - t0)
    chunk_ms = 1e3 * (t_hi - t_lo) / (hi - lo)
    log(f"[a/b] chunk  step {chunk_ms:6.2f} ms  {B/(chunk_ms/1e3):8.0f} "
        f"tok/s  (lo {t_lo:.3f}s hi {t_hi:.3f}s)")
    log(f"[a/b] chunk/wave = {chunk_ms/wave_ms:.3f}x")

    if args.profile:
        jax.profiler.start_trace(args.profile)
        chunk_run(hi)
        wave(hi)
        jax.profiler.stop_trace()
        log(f"[a/b] trace written to {args.profile}")


if __name__ == "__main__":
    main()
