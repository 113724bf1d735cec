#!/usr/bin/env python
"""Decode-step microbenchmark: isolates the per-step decode cost of the
flagship model at several batch sizes.

Method: run the jitted generate twice per batch size with per-sequence caps
(traced, no recompile) of ``lo`` and ``hi`` tokens; the difference divided by
(hi - lo) is the marginal decode-step time, free of prefill/host costs.

The decode step is weight-HBM-bound (every step streams all decoder params),
so the step time should be ~flat in batch until KV/activation traffic bites;
tokens/sec then scales with batch. This script finds the knee.

Usage: python scripts/bench_decode_step.py [--batches 32,64,128,192]
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
    ap.add_argument("--batches", default="32,64,128,192")
    ap.add_argument("--model", default="paligemma",
                    help="model family (paligemma|llava|blip2)")
    ap.add_argument("--size", default=None,
                    help="model size (default: family's production size)")
    ap.add_argument("--quant", default="bf16")
    ap.add_argument("--lo", type=int, default=10)
    ap.add_argument("--hi", type=int, default=110)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vlm_tpu.generate.decode import build_prompt_ids
    from vlm_tpu.models.factory import VLMModelFactory
    from vlm_tpu.models.vlm import num_image_tokens
    from vlm_tpu.ops.preprocess import host_batch, normalize_images

    log(f"[decode-bench] devices: {jax.devices()}")
    t0 = time.perf_counter()
    model = VLMModelFactory.create_model(args.model, quantization=args.quant,
                                         size=args.size)
    log(f"[decode-bench] model built in {time.perf_counter() - t0:.1f}s")

    prompt = "describe the person"
    pre_t, post_t, bos_pre, bos_post = model.format_prompt(prompt)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (128, 96, 3), dtype=np.uint8))

    for batch in [int(b) for b in args.batches.split(",")]:
        pre_ids, post_ids, plen = build_prompt_ids(
            model.tokenizer, pre_t, post_t, num_image_tokens(model.cfg),
            batch, add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
        try:
            eng = model._engine(batch, int(plen[0]), args.hi)
            pixels = normalize_images(
                jnp.asarray(host_batch([img] * batch, model.recipe)),
                recipe=model.recipe,
                compute_dtype=model.policy.compute_dtype)

            def run(n_tok):
                caps = jnp.full((batch,), n_tok, jnp.int32)
                r = eng.generate(model.params, pixels, pre_ids, post_ids,
                                 plen, max_new_per_seq=caps)
                # host pull, not block_until_ready: the TPU tunnel in this
                # environment does not block on the latter
                _ = np.asarray(r.tokens)

            run(args.lo)   # compile
            run(args.hi)
            t_lo = t_hi = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter(); run(args.lo)
                t_lo = min(t_lo, time.perf_counter() - t0)
                t0 = time.perf_counter(); run(args.hi)
                t_hi = min(t_hi, time.perf_counter() - t0)
            step_ms = 1e3 * (t_hi - t_lo) / (args.hi - args.lo)
            tok_s = batch / (step_ms / 1e3)
            log(f"[decode-bench] B={batch:4d}  step {step_ms:6.2f} ms  "
                f"{tok_s:8.0f} tok/s  (lo {t_lo:.3f}s hi {t_hi:.3f}s)")
        except Exception as e:  # OOM etc. — report and continue
            log(f"[decode-bench] B={batch}: FAILED ({type(e).__name__}: "
                f"{str(e)[:200]})")


if __name__ == "__main__":
    main()
