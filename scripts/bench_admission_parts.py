#!/usr/bin/env python
"""Decompose the admission program: vision tower vs decoder prefill vs
scatter/state overhead, each timed as its own jitted program at the
admission group size. The difference between the sum of parts and the
full `_admit_group` program is the fusion benefit / overhead.

Rooflines printed alongside (v5e: 197 bf16 TFLOP/s, 394 int8 TOP/s) so
the MXU efficiency of each phase is visible directly.

Usage: python scripts/bench_admission_parts.py [--admit 32] [--batch 128]
           [--quant 8bit] [--int8-prefill dynamic_noout]
"""

import argparse
import os
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


def timed(fn, reps=5):
    fn()  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--admit", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--model", default="paligemma")
    ap.add_argument("--quant", default="8bit")
    ap.add_argument("--int8-prefill", default="dynamic_noout")
    ap.add_argument("--max-new", type=int, default=100)
    args = ap.parse_args()
    if args.quant == "8bit":
        os.environ.setdefault("VLM_TPU_INT8_PREFILL", args.int8_prefill)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vlm_tpu.generate.batcher import ContinuousBatcher
    from vlm_tpu.generate.decode import build_prompt_ids
    from vlm_tpu.models.decoder import init_kv_cache
    from vlm_tpu.models.factory import VLMModelFactory
    from vlm_tpu.models.vlm import num_image_tokens
    from vlm_tpu.ops.preprocess import host_batch, normalize_images

    log(f"[parts] devices: {jax.devices()}")
    t0 = time.perf_counter()
    model = VLMModelFactory.create_model(args.model, quantization=args.quant)
    log(f"[parts] model built in {time.perf_counter() - t0:.1f}s "
        f"(int8_prefill={os.environ.get('VLM_TPU_INT8_PREFILL')})")
    module, params, cfg = model.module, model.params, model.cfg

    from bench import MIVIA_PROMPT as prompt
    pre_t, post_t, bos_pre, bos_post = model.format_prompt(prompt)
    g, B = args.admit, args.batch
    pre_ids, post_ids, plen = build_prompt_ids(
        model.tokenizer, pre_t, post_t, num_image_tokens(cfg), g,
        add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
    plen_scalar = int(plen[0])
    log(f"[parts] g={g} B={B} prompt_len={plen_scalar}")

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (128, 96, 3), dtype=np.uint8))
    pixels = normalize_images(
        jnp.asarray(host_batch([img] * g, model.recipe)),
        recipe=model.recipe, compute_dtype=model.policy.compute_dtype)

    # ---------------- piece 1: vision tower (+projector-free) -------------
    vis = jax.jit(lambda p, px: module.apply(p, px, method="encode_images"))

    def run_vis():
        jax.block_until_ready(vis(params, pixels))

    t_vis = timed(run_vis)

    # ---------------- piece 2: full prefill into a group cache ------------
    @jax.jit
    def prefill(p, px, pre, post, pl):
        gc = init_kv_cache(cfg.decoder, g, plen_scalar,
                           model.policy.compute_dtype)
        last, gc = module.apply(p, px, pre, post, gc, pl, method="prefill")
        return last, gc

    def run_prefill():
        last, gc = prefill(params, pixels, pre_ids, post_ids, plen)
        jax.block_until_ready(last)
        jax.block_until_ready(gc)

    t_pre = timed(run_prefill)

    # ---------------- piece 3: full admission program ----------------------
    batcher = ContinuousBatcher(
        module, cfg, batch_size=B, max_prompt_len=plen_scalar,
        max_new_tokens=args.max_new, admit_block=g,
        cache_dtype=model.policy.compute_dtype,
        eos_id=-1, pad_id=model.tokenizer.pad_id)

    caps_arr = jnp.full((g,), args.max_new, jnp.int32)

    def run_admit():
        # fresh donated carriers every run (they are consumed)
        cache = init_kv_cache(cfg.decoder, B, batcher.cache_len,
                              model.policy.compute_dtype)
        state = batcher._init_state()
        jax.block_until_ready(cache)
        jax.block_until_ready(jax.tree.leaves(state))
        t0 = time.perf_counter()
        state, cache = batcher._admit_group(
            params, pixels, pre_ids, post_ids, plen, caps_arr, state, cache)
        jax.block_until_ready(cache)
        return time.perf_counter() - t0

    run_admit()  # compile
    t_admit = min(run_admit() for _ in range(5))

    # ---------------- rooflines -------------------------------------------
    def count_params(tree):
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree)
                   if hasattr(x, "shape"))

    d = cfg.decoder
    dec_body = (
        d.layers * (d.hidden * d.heads * d.head_dim          # q
                    + 2 * d.hidden * d.kv_heads * d.head_dim  # kv
                    + d.heads * d.head_dim * d.hidden         # o
                    + (3 if d.gated_mlp else 2) * d.hidden * d.mlp_dim))
    dec_flop = 2 * dec_body * plen_scalar * g
    att_flop = 2 * 2 * g * d.heads * plen_scalar ** 2 * d.head_dim * d.layers
    vis_params = count_params(
        {k: v for k, v in params["params"].items() if "vision" in k.lower()
         or "encoder" in k.lower()})
    n_img = num_image_tokens(cfg)
    vis_flop = 2 * vis_params * g  # dense ViT: ~2*P per token*n_tokens/n...
    # ViT FLOPs: 2 * P_body * tokens per image
    log(f"[parts] decoder body params {dec_body/1e9:.2f}B  "
        f"prefill matmul {dec_flop/1e12:.2f} TFLOP  "
        f"attn {att_flop/1e12:.2f} TFLOP  img_tokens={n_img}")

    int8 = args.quant == "8bit"
    peak = 394e12 if int8 else 197e12
    t_dec = t_pre - t_vis
    log(f"[parts] vision  {1e3 * t_vis:7.1f} ms  ({1e3 * t_vis / g:5.2f} ms/img)")
    log(f"[parts] prefill {1e3 * t_pre:7.1f} ms  ({1e3 * t_pre / g:5.2f} ms/img)"
        f"  decoder-only ~{1e3 * t_dec:6.1f} ms "
        f"-> {dec_flop / max(t_dec, 1e-9) / 1e12:5.0f} "
        f"{'TOP/s' if int8 else 'TFLOP/s'} "
        f"({100 * dec_flop / max(t_dec, 1e-9) / peak:4.1f}% of peak)")
    log(f"[parts] admit   {1e3 * t_admit:7.1f} ms  "
        f"({1e3 * t_admit / g:5.2f} ms/img)  scatter+state overhead "
        f"~{1e3 * (t_admit - t_pre):6.1f} ms")


if __name__ == "__main__":
    main()
