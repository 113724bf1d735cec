#!/usr/bin/env python
"""One-process continuous-batcher config sweep (slots x admit x split).

Round-5 follow-up to the admit-block sweep: the admit=8 default fixed the
occupancy loss between admissions, which moves the optimal SLOT COUNT —
r2's "128 slots best" was measured under admit=B/4. This script builds the
model ONCE and measures each (batch, admit, split) batcher config on the
same variable-length workload as bench.py, so a sweep point costs a batcher
compile + reps instead of a full model build.

Usage:
    python scripts/bench_slot_sweep.py --points 128:8,192:8,256:8 \
        [--n 512] [--reps 2] [--tokens 100] [--split-admit 0]
Point syntax: BATCH:ADMIT[:split]  (split = 1 enables VLM_TPU_SPLIT_ADMIT
for that point only).

Env: same model knobs as bench.py (VLM_TPU_BENCH_MODEL/_QUANT/_SIZE,
VLM_TPU_INT8_PREFILL, VLM_TPU_KV_CACHE, ...). Emits one JSON line per
point on stdout; progress on stderr.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("VLM_TPU_ROOT", str(REPO_ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO_ROOT / ".jax_bench_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

from vlm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True,
                    help="comma list of BATCH:ADMIT[:split]")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=100)
    ap.add_argument("--prompt-ids", type=int, default=0)
    args = ap.parse_args()

    points = []
    for p in args.points.split(","):
        parts = p.strip().split(":")
        points.append((int(parts[0]), int(parts[1]),
                       len(parts) > 2 and parts[2] == "1"))

    import numpy as np
    from PIL import Image

    import bench
    from vlm_tpu.data.native_loader import load_batch
    from vlm_tpu.generate.batcher import ContinuousBatcher
    from vlm_tpu.models.factory import VLMModelFactory
    from vlm_tpu.ops.preprocess import normalize_images

    model_name = os.environ.get("VLM_TPU_BENCH_MODEL", "paligemma")
    quant = os.environ.get("VLM_TPU_BENCH_QUANT", "bf16")
    size = os.environ.get("VLM_TPU_BENCH_SIZE") or \
        {"paligemma": "3b", "blip2": "6.7b", "llava": "7b"}.get(
            model_name, "3b")
    t0 = time.perf_counter()
    model = VLMModelFactory.create_model(model_name, quantization=quant,
                                         size=size)
    log(f"[sweep] {model_name} {size} {quant} built in "
        f"{time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    import tempfile
    img_dir = tempfile.mkdtemp(prefix="vlm_sweep_imgs_")
    max_b = max(b for b, _, _ in points)
    img_paths = []
    for i in range(max(args.n, max_b)):
        p = f"{img_dir}/img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (128, 96, 3),
                                     dtype=np.uint8)).save(p, quality=92)
        img_paths.append(p)
    caps = rng.integers(min(8, args.tokens), args.tokens + 1,
                        size=args.n).astype(np.int32)

    def pixel_fn(idxs):
        import jax.numpy as jnp
        batch_u8 = load_batch([img_paths[i % len(img_paths)] for i in idxs],
                              model.recipe)
        return normalize_images(
            jnp.asarray(batch_u8),
            recipe=model.recipe, compute_dtype=model.policy.compute_dtype)

    for batch, admit, split in points:
        pre_ids, post_ids, plen = bench.build_regime_prompts(
            model, args.prompt_ids, batch)
        plen_scalar = int(plen[0])
        os.environ["VLM_TPU_SPLIT_ADMIT"] = "1" if split else "0"
        batcher = ContinuousBatcher(
            model.module, model.cfg, batch_size=batch,
            max_prompt_len=plen_scalar, max_new_tokens=args.tokens,
            admit_block=admit,
            cache_dtype=model.kv_cache_dtype(),
            eos_id=model.tokenizer.eos_id, pad_id=model.tokenizer.pad_id)
        batcher.run(model.params, pixel_fn, np.asarray(pre_ids[0]),
                    np.asarray(post_ids[0]), plen_scalar,
                    n_images=batch, max_new_per_image=[4] * batch)
        rows = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            batcher.run(model.params, pixel_fn, np.asarray(pre_ids[0]),
                        np.asarray(post_ids[0]), plen_scalar,
                        n_images=args.n, max_new_per_image=caps)
            ips = args.n / (time.perf_counter() - t0)
            lats = sorted(l for l in batcher.last_latency_s if l is not None)
            rows.append((ips, 1e3 * lats[len(lats) // 2],
                         1e3 * lats[min(len(lats) - 1,
                                        int(len(lats) * 0.99))]))
            log(f"[sweep] B={batch} admit={admit} split={int(split)} "
                f"rep{rep}: {ips:.2f} img/s p50 {rows[-1][1]:.0f} "
                f"p99 {rows[-1][2]:.0f}")
        best = max(rows, key=lambda r: r[0])
        print(json.dumps({
            "batch": batch, "admit": admit, "split": int(split),
            "img_s": round(best[0], 2), "p50_ms": round(best[1], 0),
            "p99_ms": round(best[2], 0),
            "reps": [round(r[0], 2) for r in rows]}), flush=True)


if __name__ == "__main__":
    main()
