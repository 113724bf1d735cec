#!/usr/bin/env python
"""Probing hot-loop benchmark on TPU (SURVEY.md §3.2 HOT LOOP 1 + 2).

Measures the trainers' REAL paths at full encoder size:

1. ``VisionBackbone.extract_features_dataset`` — native C++ image loader +
   prefetch feeding the jitted encoder (what ``SingleTaskTrainer.
   _ensure_features`` runs once per split,
   `/root/reference/probing/train/singletask_trainer.py:219-285`);
2. one cached-feature head-training epoch — the jitted
   BN→Dropout→Linear train step over the extracted [N, D] features (what
   every subsequent epoch runs).

Usage: python scripts/bench_probing.py [--family llava] [--n 2048]
       [--batch 64] [--dataset-dir DIR]
If --dataset-dir is omitted a synthetic 512-image directory is generated.
Output: one JSON line on stdout.
"""

import argparse
import json
import sys
import tempfile
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
    ap.add_argument("--family", default="llava",
                    help="vision tower family (llava=CLIP-L/336, "
                         "paligemma=SigLIP-224, blip2=EVA-ViT-g)")
    ap.add_argument("--size", default=None)
    ap.add_argument("--n", type=int, default=2048,
                    help="images pushed through the extraction loop")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dataset-dir", default=None,
                    help="directory of images (default: synthesize 512)")
    ap.add_argument("--head-epochs", type=int, default=3)
    ap.add_argument("--head-batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"[probe-bench] devices: {jax.devices()}")

    from vlm_tpu.core.dtypes import policy_for
    from vlm_tpu.models.backbone import VisionBackbone
    from vlm_tpu.models.configs import VLM_CONFIGS
    from vlm_tpu.models.vit import ViTEncoder

    cfg = VLM_CONFIGS[args.family](
        args.size or {"llava": "7b", "paligemma": "3b",
                      "blip2": "6.7b"}[args.family])
    policy = policy_for("bf16")
    # Vision tower only — the probing trainers steal exactly this tower from
    # the VLM (get_vision_backbone drops the decoder); building it directly
    # measures the same extraction path without 7B-decoder HBM.
    t0 = time.perf_counter()
    tower = ViTEncoder(cfg.vision, dtype=policy.compute_dtype,
                       param_dtype=jnp.float32)
    s = cfg.vision.image_size
    vparams = tower.init(jax.random.key(0), jnp.zeros((1, s, s, 3),
                                                      policy.compute_dtype))
    bb = VisionBackbone(cfg, vparams, policy, batch_size=args.batch)
    log(f"[probe-bench] {args.family} tower built in "
        f"{time.perf_counter() - t0:.1f}s "
        f"(dim {cfg.backbone_dim}, image {s}px, "
        f"{cfg.vision.layers} layers)")

    # ---------------- image directory ----------------
    if args.dataset_dir:
        paths = sorted(Path(args.dataset_dir).glob("**/*.jpg"))
        assert paths, f"no .jpg under {args.dataset_dir}"
    else:
        from vlm_tpu.testing.synthetic import write_image
        td = Path(tempfile.mkdtemp(prefix="probe_bench_"))
        paths = []
        for i in range(512):
            p = td / f"img_{i:04d}.jpg"
            write_image(p, seed=i, size=(128, 96))
            paths.append(p)
    all_paths = [paths[i % len(paths)] for i in range(args.n)]

    # ---------------- HOT LOOP 1: extraction ----------------
    # warm-up batch compiles the encoder at the extraction batch size
    _ = np.asarray(bb.extract_features_dataset(all_paths[:args.batch],
                                               progress=False))
    t0 = time.perf_counter()
    feats = bb.extract_features_dataset(all_paths, progress=False)
    extract_s = time.perf_counter() - t0
    extract_ips = args.n / extract_s
    log(f"[probe-bench] extract_features_dataset: {extract_ips:.1f} img/s "
        f"({args.n} imgs in {extract_s:.1f}s, batch {args.batch}, "
        f"native loader + prefetch)")

    # ---------------- HOT LOOP 2: cached-feature head epoch -------------
    import optax

    from vlm_tpu.probing.heads import make_head
    from vlm_tpu.probing.train.utils import masked_cross_entropy

    n_classes = 9
    y = np.random.default_rng(1).integers(0, n_classes,
                                          feats.shape[0]).astype(np.int32)
    head = make_head(n_classes=n_classes)
    hstate = head.init(jax.random.key(1),
                       jnp.zeros((2, feats.shape[1]), jnp.float32),
                       train=True)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(hstate["params"])
    cw = jnp.ones((n_classes,), jnp.float32)

    def loss_fn(params, stats, x, yy, rng):
        logits, mut = head.apply({"params": params, "batch_stats": stats},
                                 x, train=True, mutable=["batch_stats"],
                                 rngs={"dropout": rng})
        return masked_cross_entropy(logits, yy, cw), mut["batch_stats"]

    @jax.jit
    def train_step(params, stats, opt_state, x, yy, rng):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, x, yy, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    hb = min(args.head_batch, feats.shape[0])
    xd = jnp.asarray(feats)
    yd = jnp.asarray(y)
    params, stats = hstate["params"], hstate["batch_stats"]
    n_batches = feats.shape[0] // hb
    # epoch 0 = compile
    epoch_s = []
    for ep in range(args.head_epochs):
        t0 = time.perf_counter()
        loss = None
        for b in range(n_batches):
            params, stats, opt_state, loss = train_step(
                params, stats, opt_state, xd[b * hb:(b + 1) * hb],
                yd[b * hb:(b + 1) * hb], jax.random.fold_in(
                    jax.random.key(2), ep * n_batches + b))
        _ = float(loss)
        epoch_s.append(time.perf_counter() - t0)
    head_epoch_s = min(epoch_s[1:]) if len(epoch_s) > 1 else epoch_s[0]
    head_ips = n_batches * hb / head_epoch_s
    log(f"[probe-bench] cached-feature head epoch: {head_epoch_s * 1e3:.0f} "
        f"ms ({head_ips:.0f} samples/s, {n_batches} batches of {hb}, "
        f"D={feats.shape[1]})")

    print(json.dumps({
        "metric": f"{args.family}_probe_extract_images_per_sec",
        "value": round(extract_ips, 1),
        "unit": "images/sec",
        "extract_batch": args.batch,
        "n_images": args.n,
        "head_epoch_ms": round(head_epoch_s * 1e3, 1),
        "head_samples_per_sec": round(head_ips, 1),
        "feature_dim": int(feats.shape[1]),
    }), flush=True)


if __name__ == "__main__":
    main()
