"""Measure the reference's actual inference-loop structure on torch CPU.

The reference's hot loop is one HF ``model.generate`` per image, batch 1, in
Python (`/root/reference/scripts/prompt_inference.py:75-79`). No published
throughput numbers exist (SURVEY.md §6), so this script produces a *measured*
anchor: it runs that exact loop structure with a tiny random-weight HF model
(constructed from config — no hub access), then runs the same tiny model
through the vlm_tpu stack (same images, same prompt ids) sequentially and
batched, on the same host.

This makes ``vs_baseline`` in the bench JSON honest: the structural speedup
(batched TPU-native decode vs per-image generate) is measured against the
reference's own machinery (torch + transformers), not against a re-enactment
inside our stack.

Usage:
    VLM_TPU_PLATFORM=cpu python scripts/measure_reference_baseline.py \
        [--n 16] [--max-tokens 32] [--family paligemma] [--json out.json]

Writes one JSON line with both numbers and the ratio.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def measure_reference_loop(hf_model, input_ids, attention_mask, pixels,
                           n_images: int, max_tokens: int) -> float:
    """The reference loop: per-image, batch-1 ``model.generate``
    (`/root/reference/scripts/prompt_inference.py:75-79`,
    `models/base_model.py:54-74`). Returns images/sec."""
    import torch
    with torch.no_grad():
        # warmup (the reference pays this on its first image too, but we
        # exclude one-time allocator/jit effects from the steady-state rate)
        hf_model.generate(input_ids=input_ids[:1], pixel_values=pixels[:1],
                          attention_mask=attention_mask[:1],
                          do_sample=False, max_new_tokens=max_tokens,
                          pad_token_id=0)
        t0 = time.perf_counter()
        for i in range(n_images):
            j = i % pixels.shape[0]
            hf_model.generate(
                input_ids=input_ids[j:j + 1], pixel_values=pixels[j:j + 1],
                attention_mask=attention_mask[j:j + 1],
                do_sample=False, max_new_tokens=max_tokens, pad_token_id=0)
        dt = time.perf_counter() - t0
    return n_images / dt


def measure_ours(ours, pixels_nhwc, prompt: str, n_images: int,
                 max_tokens: int, batch: int):
    """Same tiny model through the vlm_tpu engine: sequential batch-1 (the
    structural mirror of the reference loop) and batched. Returns
    (seq_img_s, batched_img_s)."""
    import jax.numpy as jnp
    import numpy as np

    from vlm_tpu.generate.decode import GenerationEngine, build_prompt_ids
    from vlm_tpu.models.vlm import num_image_tokens

    pre_t, post_t, bos_pre, bos_post = ours.format_prompt(prompt)

    def run(bs: int, n: int) -> float:
        pre_ids, post_ids, plen = build_prompt_ids(
            ours.tokenizer, pre_t, post_t, num_image_tokens(ours.cfg), bs,
            add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
        engine = GenerationEngine(
            ours.module, ours.cfg, batch_size=bs,
            max_prompt_len=int(plen[0]), max_new_tokens=max_tokens,
            cache_dtype=jnp.float32, eos_id=ours.cfg.decoder.eos_token_id,
            pad_id=0)
        px = jnp.asarray(np.tile(pixels_nhwc, (max(1, bs // pixels_nhwc.shape[0] + 1), 1, 1, 1))[:bs])
        r = engine.generate(ours.params, px, pre_ids, post_ids, plen)
        np.asarray(r.tokens)  # warmup + sync
        t0 = time.perf_counter()
        done = 0
        while done < n:
            r = engine.generate(ours.params, px, pre_ids, post_ids, plen)
            np.asarray(r.tokens)
            done += bs
        return done / (time.perf_counter() - t0)

    return run(1, min(n_images, 8)), run(batch, n_images)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--family", default="paligemma")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import tempfile

    import numpy as np
    import torch

    from vlm_tpu.testing import HF_BUILDERS, IMAGE_TOKEN, hf_text_ids
    from vlm_tpu.models.factory import VLMModelFactory
    from vlm_tpu.models.vlm import num_image_tokens

    ckpt = tempfile.mkdtemp(prefix="hf_tiny_")
    hf = HF_BUILDERS[args.family](ckpt, seed=7)
    ours = VLMModelFactory.create_model(
        args.family, model_id=ckpt, quantization="fp32", size="test",
        batch_size=args.batch, attn_impl="xla")

    prompt = "Describe the clothing of the person"
    rng = np.random.default_rng(0)
    b_img = min(args.n, 4)
    size = ours.cfg.vision.image_size
    px = rng.normal(0, 1, (b_img, 3, size, size)).astype(np.float32)

    pre, post = hf_text_ids(ours, prompt)
    ids = list(pre) + [IMAGE_TOKEN] * num_image_tokens(ours.cfg) + list(post)
    input_ids = torch.tensor([ids] * b_img, dtype=torch.long)
    attn = torch.ones_like(input_ids)

    ref_img_s = measure_reference_loop(
        hf, input_ids, attn, torch.from_numpy(px), args.n, args.max_tokens)
    seq_img_s, batched_img_s = measure_ours(
        ours, px.transpose(0, 2, 3, 1), prompt, args.n, args.max_tokens,
        args.batch)

    out = {
        "metric": f"{args.family}_tiny_reference_loop_images_per_sec",
        "reference_torch_cpu_img_s": round(ref_img_s, 3),
        "ours_sequential_img_s": round(seq_img_s, 3),
        "ours_batched_img_s": round(batched_img_s, 3),
        "speedup_batched_vs_reference": round(batched_img_s / ref_img_s, 2),
        "n_images": args.n,
        "max_tokens": args.max_tokens,
        "batch": args.batch,
        "note": ("tiny random-weight model, torch CPU vs vlm_tpu CPU; "
                 "anchors the loop-structure comparison on the reference's "
                 "own machinery (transformers generate, batch 1/image)"),
    }
    line = json.dumps(out)
    print(line)
    if args.json:
        Path(args.json).write_text(line + "\n")


if __name__ == "__main__":
    main()
