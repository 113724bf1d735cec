#!/usr/bin/env python
"""Phase timings for the continuous batcher: admission (vision + prefill +
scatter) vs decode chunks, measured separately on the device in use.

Prints per-admission and per-chunk wall times so the throughput model
(prefill FLOPs + decode weight stream + host overhead) can be checked
against reality. Usage:

    python scripts/bench_batcher_phases.py [--batch 128] [--admit 32]
        [--sync 8] [--chunks 20]
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
    ap.add_argument("--admit", type=int, default=32)
    ap.add_argument("--sync", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=20)
    ap.add_argument("--size", default="3b")
    ap.add_argument("--quant", default="bf16")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vlm_tpu.generate.batcher import ContinuousBatcher
    from vlm_tpu.generate.decode import build_prompt_ids
    from vlm_tpu.models.factory import VLMModelFactory
    from vlm_tpu.models.vlm import num_image_tokens
    from vlm_tpu.models.decoder import init_kv_cache
    from vlm_tpu.ops.preprocess import host_batch, normalize_images

    log(f"[phases] devices: {jax.devices()}")
    t0 = time.perf_counter()
    model = VLMModelFactory.create_model("paligemma", quantization=args.quant,
                                         size=args.size)
    log(f"[phases] model built in {time.perf_counter() - t0:.1f}s")

    from bench import MIVIA_PROMPT as prompt    # same prompt as the
    # headline bench, so phase timings decompose the number it reports
    pre_t, post_t, bos_pre, bos_post = model.format_prompt(prompt)
    B, g, K = args.batch, args.admit, max(1, args.sync)
    # Caps must outlast every timed chunk (1 compile + timed + unsynced),
    # or the later chunks run on drained slots and time nothing.
    cap_tokens = (1 + 2 * args.chunks) * K + 8
    pre_ids, post_ids, plen = build_prompt_ids(
        model.tokenizer, pre_t, post_t, num_image_tokens(model.cfg), g,
        add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
    plen_scalar = int(plen[0])
    log(f"[phases] B={B} admit={g} sync={K} prompt_len={plen_scalar}")

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (128, 96, 3), dtype=np.uint8))
    pixels = normalize_images(
        jnp.asarray(host_batch([img] * g, model.recipe)),
        recipe=model.recipe, compute_dtype=model.policy.compute_dtype)

    batcher = ContinuousBatcher(
        model.module, model.cfg, batch_size=B,
        max_prompt_len=plen_scalar, max_new_tokens=cap_tokens,
        admit_block=g, sync_every=K,
        cache_dtype=model.policy.compute_dtype,
        # eos_id=-1: random-weight models must not EOS-terminate slots
        # mid-measurement.
        eos_id=-1, pad_id=model.tokenizer.pad_id)

    cache = init_kv_cache(model.cfg.decoder, B, batcher.cache_len,
                          model.policy.compute_dtype)
    state = batcher._init_state()

    # ---- admission phase ----
    # Slots are chosen on-device (first g free, ascending), so successive
    # blocks land at [0,g), [g,2g), ... exactly as the old host-chosen
    # version did.
    n_adm = B // g
    caps_arr = jnp.asarray(np.full((g,), cap_tokens, np.int32))
    # compile
    state, cache = batcher._admit_group(
        model.params, pixels, pre_ids, post_ids, plen, caps_arr,
        state, cache)
    _ = np.asarray(state["act"])
    times = []
    for i in range(1, n_adm):
        t0 = time.perf_counter()
        state, cache = batcher._admit_group(
            model.params, pixels, pre_ids, post_ids, plen, caps_arr,
            state, cache)
        _ = np.asarray(state["act"])
        times.append(time.perf_counter() - t0)
    if times:
        log(f"[phases] admission (g={g}, sync'd): "
            f"{', '.join(f'{1e3*t:.0f}' for t in times)} ms "
            f"-> {1e3*min(times)/g:.1f} ms/img best")
    else:
        log(f"[phases] admission: single block (batch == admit), "
            f"no steady-state timing; raise --batch or lower --admit")

    # ---- decode chunk phase (all slots active, synced each chunk) ----
    # Fixed K steps per chunk (stop_free=B+1 disables the free-slot stop).
    stop = jnp.asarray(B + 1, jnp.int32)
    ksteps = jnp.asarray(K, jnp.int32)
    packed, state, cache = batcher._decode_chunk(model.params, state, cache,
                                                 stop, ksteps)
    _ = np.asarray(packed)  # compile
    times = []
    for _ in range(args.chunks):
        t0 = time.perf_counter()
        packed, state, cache = batcher._decode_chunk(
            model.params, state, cache, stop, ksteps)
        _ = np.asarray(packed)
        times.append(time.perf_counter() - t0)
    lo = min(times)
    log(f"[phases] decode chunk (K={K}, sync'd): min {1e3*lo:.1f} ms, "
        f"median {1e3*sorted(times)[len(times)//2]:.1f} ms "
        f"-> {1e3*lo/K:.2f} ms/step, {B*K/lo:.0f} tok/s")

    # ---- back-to-back chunks, one pull at the end ----
    t0 = time.perf_counter()
    for _ in range(args.chunks):
        packed, state, cache = batcher._decode_chunk(
            model.params, state, cache, stop, ksteps)
    _ = np.asarray(packed)
    el = time.perf_counter() - t0
    log(f"[phases] decode chunks unsynced: {1e3*el/args.chunks:.1f} "
        f"ms/chunk -> {1e3*el/args.chunks/K:.2f} ms/step, "
        f"{B*K*args.chunks/el:.0f} tok/s")


if __name__ == "__main__":
    main()
