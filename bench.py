#!/usr/bin/env python
"""Headline benchmark: zero-shot VLM eval throughput (images/sec) on TPU.

Measures the north-star metric from BASELINE.json — images/sec on
MiviaPar-style zero-shot eval — for the PaliGemma-3B configuration
(BASELINE "configs" list) with the full TPU pipeline: host decode → fused
preprocessing → batched prefill → ``lax.while_loop`` greedy decode.

Baseline: the reference's hot loop is one ``model.generate`` per image
(`/root/reference/scripts/prompt_inference.py:75-79`) and it publishes no
numbers, so the comparison that isolates this rebuild's claim is measured in
the same run on the same chip: the sequential batch-1 path (the reference's
loop structure) vs the batched path. ``vs_baseline`` = batched / sequential
throughput.

Output: ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Env knobs: VLM_TPU_BENCH_SIZE (default "3b"; "test" for CI),
VLM_TPU_BENCH_N (measured images, default 96),
VLM_TPU_BENCH_BATCH (default 24), VLM_TPU_BENCH_TOKENS (default 32).
"""

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("VLM_TPU_ROOT", str(REPO_ROOT))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


MIVIA_PROMPT = (
    "Analyze the person in this image and return comma-separated values: "
    "Color Upper Clothes,Color Lower Clothes,Gender,Presence of bag,"
    "Presence of hat")


def main():
    import numpy as np
    from PIL import Image

    size = os.environ.get("VLM_TPU_BENCH_SIZE", "3b")
    quant = os.environ.get("VLM_TPU_BENCH_QUANT", "bf16")
    n_images = int(os.environ.get("VLM_TPU_BENCH_N", "96"))
    # Batch 32 measured best on v5e (64 loses to host decode + cache size).
    batch = int(os.environ.get("VLM_TPU_BENCH_BATCH", "32"))
    max_tokens = int(os.environ.get("VLM_TPU_BENCH_TOKENS", "32"))
    n_seq = int(os.environ.get("VLM_TPU_BENCH_SEQ_N", "6"))

    import jax
    log(f"[bench] devices: {jax.devices()}")
    log(f"[bench] paligemma size={size} N={n_images} batch={batch} "
        f"max_tokens={max_tokens}")

    from vlm_tpu.models.factory import VLMModelFactory
    t0 = time.perf_counter()
    model = VLMModelFactory.create_model("paligemma", quantization=quant,
                                         size=size)
    log(f"[bench] model built in {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    imgs = [Image.fromarray(rng.integers(0, 255, (128, 96, 3),
                                         dtype=np.uint8))
            for _ in range(max(n_images, batch))]

    # ---------- sequential batch-1 baseline (reference loop structure) ----
    seq_ips = 0.0
    if n_seq > 0:
        model.generate_text(imgs[0], MIVIA_PROMPT,
                            max_tokens=max_tokens)  # compile
        t0 = time.perf_counter()
        for i in range(n_seq):
            model.generate_text(imgs[i + 1], MIVIA_PROMPT,
                                max_tokens=max_tokens)
        seq_ips = n_seq / (time.perf_counter() - t0)
        log(f"[bench] sequential batch-1: {seq_ips:.3f} img/s")

    # ---------- batched path (host decode + device) ----------
    model.generate_batch(imgs[:batch], MIVIA_PROMPT,
                         max_tokens=max_tokens)  # compile
    t0 = time.perf_counter()
    done = 0
    while done < n_images:
        chunk = imgs[done % len(imgs):][:batch]
        if len(chunk) < batch:
            chunk = (chunk + imgs)[:batch]
        model.generate_batch(chunk, MIVIA_PROMPT, max_tokens=max_tokens)
        done += batch
    batched_ips = done / (time.perf_counter() - t0)
    log(f"[bench] batched (B={batch}): {batched_ips:.2f} img/s")

    # ---------- device-only (pre-staged pixels; isolates TPU throughput
    # from this host's single CPU core) ----------
    import jax.numpy as jnp

    from vlm_tpu.generate.decode import build_prompt_ids
    from vlm_tpu.models.vlm import num_image_tokens
    from vlm_tpu.ops.preprocess import host_batch, normalize_images

    pixels = normalize_images(
        jnp.asarray(host_batch(imgs[:batch], model.recipe)),
        recipe=model.recipe, compute_dtype=model.policy.compute_dtype)
    pre_t, post_t, bos_pre, bos_post = model.format_prompt(MIVIA_PROMPT)
    pre_ids, post_ids, plen = build_prompt_ids(
        model.tokenizer, pre_t, post_t, num_image_tokens(model.cfg), batch,
        add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
    engine = model._engine(batch, int(plen[0]), max_tokens)
    r = engine.generate(model.params, pixels, pre_ids, post_ids, plen)
    _ = np.asarray(r.tokens)
    t0 = time.perf_counter()
    done = 0
    while done < n_images:
        r = engine.generate(model.params, pixels, pre_ids, post_ids, plen)
        _ = np.asarray(r.tokens)
        done += batch
    device_ips = done / (time.perf_counter() - t0)
    log(f"[bench] device-only (B={batch}): {device_ips:.2f} img/s")

    # ---------- optional: probing feature-extraction throughput ----------
    if os.environ.get("VLM_TPU_BENCH_PROBE", "0") == "1":
        bb = model.get_vision_backbone(cleanup=True)
        feats = bb.forward(imgs[:batch])             # compile
        _ = np.asarray(feats)
        t0 = time.perf_counter()
        done = 0
        while done < n_images:
            _ = np.asarray(bb.forward(imgs[done % batch:][:batch]))
            done += batch
        log(f"[bench] probing feature extraction (B={batch}): "
            f"{done / (time.perf_counter() - t0):.1f} img/s")

    print(json.dumps({
        "metric": f"paligemma_{size}_{quant}_zero_shot_images_per_sec"
        if quant != "bf16" else f"paligemma_{size}_zero_shot_images_per_sec",
        "value": round(batched_ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(batched_ips / seq_ips, 2) if seq_ips > 0
        else 0.0,
    }), flush=True)


if __name__ == "__main__":
    main()
