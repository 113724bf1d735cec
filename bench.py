#!/usr/bin/env python
"""Headline benchmark: zero-shot VLM eval throughput + latency on TPU.

Measures the north-star metric from BASELINE.json — images/sec on
MiviaPar-style zero-shot eval **and p50 per-image generate latency** — for
the PaliGemma-3B configuration with the full TPU pipeline: host decode →
fused preprocessing → batched prefill → decode.

The headline number is the **continuous batcher** (what
``scripts/prompt_inference.py`` actually runs) on a realistic variable-length
workload: per-image generation caps drawn uniformly from [8, max_tokens]
model the reference's EOS-early behavior under ``max_tokens: 100``
(`/root/reference/configs/prompt_inference.yaml:9`). The wave engine is
measured on the *same* workload (per-sequence caps are a traced argument —
no recompiles) to quantify the continuous-batching win.

Baseline: the reference's hot loop is one ``model.generate`` per image
(`/root/reference/scripts/prompt_inference.py:75-79`). ``vs_baseline`` is
the same-chip structural ratio (continuous vs sequential batch-1 loop); the
measured torch-CPU reference anchor lives in BASELINE.md
(scripts/measure_reference_baseline.py).

Output: ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N,
   "p50_latency_ms": N, "p99_latency_ms": N, ...}

Artifact durability (round-5 contract): the JSON line is guaranteed even if
the driver kills this process mid-run. Three layers:
  1. an internal wall-clock budget (``VLM_TPU_BENCH_BUDGET_S``, default
     1140 s — sized under the driver's observed kill window: the round-4
     run was SIGTERMed somewhere in [~1200, ~2200] s, so 1140 + the hard
     per-child deadline (``EXIT_SLACK_S``) keeps the process exit — and
     therefore rc = 0 — before 1200 s even at the pessimistic end) —
     variants and extra prompt regimes are *skipped with a recorded
     reason* rather than run past the deadline (the per-family numbers
     are also committed as FAMILIES.json via scripts/bench_families.py,
     so a skipped variant row loses nothing permanent);
  2. the result dict is built incrementally and emitted exactly once by an
     ``atexit`` hook, so any normal exit path prints it;
  3. a SIGTERM/SIGINT handler emits the best-known partial result and exits
     0 — ``timeout``-style drivers send SIGTERM first, so even a hard
     driver deadline yields a parseable artifact (only SIGKILL loses it,
     which the internal budget is sized to avoid).
A persistent XLA compile cache (``.jax_bench_cache/``, shared with variant
subprocesses) cuts repeat compiles so the budget buys more measurement.

Prompt-length regimes: without local tokenizer files the factory falls back
to the byte-level tokenizer (~1 id/char), so the text prompt is ~230 ids vs
~60 with a real SentencePiece model. Throughput is dominated by the image
tokens + decode, but absolute prefill cost is overstated versus a
real-checkpoint run — the conservative direction. ``VLM_TPU_BENCH_REGIMES``
(comma-separated id counts; 0 = byte-fallback default) measures several
prompt regimes in ONE process — the model builds once, only the batcher
recompiles — so the variants can record both the byte-fallback and the
realistic 60-id deployment regime per family cheaply.

Variant rows: by default (driver invocation) the headline is followed by
the documented per-family best recipes, each run in a fresh subprocess
(clean HBM between models) with the same rep/median/p50/p99 protocol, and
recorded in a ``variants: [...]`` array of the single output JSON line —
so the bench artifact itself carries the family evidence instead of prose
notes. VLM_TPU_BENCH_VARIANTS=0 skips them (single-config mode, used by CI
and by the variant subprocesses themselves). Variant env is PINNED: every
regime-defining knob is set explicitly from the recipe or its default, so a
user-set headline override can never silently change a labeled variant row.

Env knobs: VLM_TPU_BENCH_MODEL (paligemma|llava|blip2, default paligemma),
VLM_TPU_BENCH_SIZE (default: the family's canonical size — paligemma 3b,
blip2 6.7b, llava 7b; "test" for CI),
VLM_TPU_BENCH_N (measured images, default 512; batch-fill ramp and drain amortize at 4x batch),
VLM_TPU_BENCH_BATCH (default 128), VLM_TPU_BENCH_TOKENS (max cap, default 100),
VLM_TPU_BENCH_SEQ_N (sequential-baseline images; 0 skips),
VLM_TPU_BENCH_WAVE=0 skips the wave comparison,
VLM_TPU_BENCH_PROMPT_IDS=n replaces the text prompt halves with n ids
(single-regime form of VLM_TPU_BENCH_REGIMES),
VLM_TPU_BENCH_BUDGET_S total wall-clock budget (see above),
VLM_TPU_PROFILE_DIR (write a jax.profiler trace of the continuous phase).
"""

import atexit
import json
import os
import signal
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("VLM_TPU_ROOT", str(REPO_ROOT))

# Persistent XLA compile cache shared across bench runs AND variant
# subprocesses (children inherit the env): the per-family prefill/decode
# programs compile once per machine instead of once per process. Keyed by
# backend+flags, so TPU and CPU-CI entries never collide.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO_ROOT / ".jax_bench_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

from vlm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

_START = time.monotonic()
# Default sized under the driver's observed kill window (round 4: SIGTERM
# somewhere in [~1200, ~2200] s): 1140 s of measurement + the hard
# variant-child deadline (EXIT_SLACK_S) keeps the PROCESS EXIT before
# 1200 s even when a cold compile cache makes every phase slow — the
# round-5 validation run showed the old 1200 s budget + slack child
# backstop leaking to 1285 s+ of wall clock.
BUDGET_S = float(os.environ.get("VLM_TPU_BENCH_BUDGET_S", "1140"))


def elapsed() -> float:
    return time.monotonic() - _START


def remaining() -> float:
    return BUDGET_S - elapsed()


# ---------------------------------------------------------------------------
# Un-losable artifact: RESULT is filled incrementally; _emit prints it
# exactly once. atexit covers normal exits; the signal handler covers a
# driver SIGTERM (e.g. `timeout`'s first strike). Stdout carries EXACTLY one
# JSON line in every path.
# ---------------------------------------------------------------------------
RESULT = {}
_EMITTED = False


def _emit():
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if "value" not in RESULT:
        # Killed before the headline finished: still emit a parseable
        # record so the driver artifact explains itself.
        RESULT.setdefault("error", "terminated before headline measurement")
    print(json.dumps(RESULT), file=sys.__stdout__, flush=True)


def _on_term(signum, frame):  # noqa: ARG001
    RESULT["terminated"] = f"signal {signum} at {elapsed():.0f}s"
    _emit()
    os._exit(0)


def install_artifact_guards():
    """Install the emit-on-exit guards (atexit + SIGTERM/SIGINT handlers).

    Called from script mode only — library importers (tests drive
    run_variants in-process) must not have their process's signal
    handlers/atexit hijacked by a bench import."""
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    atexit.register(_emit)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


MIVIA_PROMPT = (
    "Analyze the person in this image and return comma-separated values: "
    "Color Upper Clothes,Color Lower Clothes,Gender,Presence of bag,"
    "Presence of hat")


def build_regime_prompts(model, want_ids, batch):
    """Prompt arrays for one prompt-length regime.

    ``want_ids=0`` is the byte-fallback default (the tokenizer the factory
    ships without local tokenizer files); ``want_ids>0`` replaces the text
    halves with that many arbitrary ids (same pre/post split ratio, same
    BOS structure) — the realistic-tokenization workload a real
    SentencePiece/BPE checkpoint produces (~60 ids for this prompt).
    """
    import numpy as np
    import jax.numpy as jnp

    from vlm_tpu.generate.decode import build_prompt_ids
    from vlm_tpu.models.vlm import num_image_tokens

    pre_t, post_t, bos_pre, bos_post = model.format_prompt(MIVIA_PROMPT)
    pre_ids, post_ids, plen = build_prompt_ids(
        model.tokenizer, pre_t, post_t, num_image_tokens(model.cfg), batch,
        add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
    if want_ids > 0:
        n_pre, n_post = pre_ids.shape[1], post_ids.shape[1]
        n_text = n_pre + n_post
        k_pre = round(want_ids * (n_pre / max(1, n_text)))
        k_post = max(0, want_ids - k_pre)
        mk = lambda k, seed: jnp.asarray(  # noqa: E731
            np.random.default_rng(seed).integers(
                1000, 2000, size=(batch, k)), jnp.int32)
        pre_ids, post_ids = mk(k_pre, 1), mk(k_post, 2)
        plen = jnp.full((batch,), k_pre + num_image_tokens(model.cfg)
                        + k_post, jnp.int32)
        log(f"[bench] prompt-ids override: text {n_text} -> {want_ids} ids "
            f"(merged prompt {int(plen[0])})")
    return pre_ids, post_ids, plen


def measure_regime(model, want_ids, *, batch, max_tokens, n_images, caps,
                   pixel_fn, reps, n_seq, run_wave, profile_dir,
                   model_name, size, quant):
    """One full measurement row (sequential/continuous/wave) at one prompt
    regime. Returns the result-row dict."""
    import numpy as np
    import jax.numpy as jnp

    from vlm_tpu.generate.batcher import ContinuousBatcher
    from vlm_tpu.utils.profiling import profile_trace

    pre_ids, post_ids, plen = build_regime_prompts(model, want_ids, batch)
    plen_scalar = int(plen[0])

    # ---------- sequential batch-1 baseline (reference loop structure) ----
    seq_ips = 0.0
    if n_seq > 0:
        # First rows of the (batch-constant) prompt arrays — ALWAYS the
        # same prompt this regime runs, including a prompt-ids override
        # (rebuilding from text here would compare the override workload
        # against a byte-fallback-length baseline).
        pre1, post1, plen1 = pre_ids[:1], post_ids[:1], plen[:1]
        eng1 = model._engine(1, int(plen1[0]), max_tokens)
        r = eng1.generate(model.params, pixel_fn([0]), pre1, post1, plen1,
                          max_new_per_seq=jnp.asarray(caps[:1]))
        _ = np.asarray(r.tokens)  # compile
        t0 = time.perf_counter()
        for i in range(n_seq):
            # batch-1 at each image's own length — the reference's EOS-early
            # per-image loop (caps are traced; no recompilation)
            r = eng1.generate(model.params, pixel_fn([i + 1]), pre1, post1,
                              plen1,
                              max_new_per_seq=jnp.asarray(
                                  caps[i % len(caps):][:1]))
            _ = np.asarray(r.tokens)
        seq_ips = n_seq / (time.perf_counter() - t0)
        log(f"[bench] sequential batch-1: {seq_ips:.3f} img/s")

    # ---------- continuous batcher (HEADLINE) ----------
    admit = int(os.environ.get("VLM_TPU_BENCH_ADMIT", "0")) or None
    sync_every = int(os.environ.get("VLM_TPU_BENCH_SYNC", "0"))
    batcher = ContinuousBatcher(
        model.module, model.cfg, batch_size=batch,
        max_prompt_len=plen_scalar, max_new_tokens=max_tokens,
        admit_block=admit, sync_every=sync_every,
        cache_dtype=model.kv_cache_dtype(),   # VLM_TPU_KV_CACHE=int8 opt-in
        eos_id=model.tokenizer.eos_id, pad_id=model.tokenizer.pad_id)
    # compile (prefill group + decode step) on a short run
    batcher.run(model.params, pixel_fn, np.asarray(pre_ids[0]),
                np.asarray(post_ids[0]), plen_scalar,
                n_images=batch, max_new_per_image=[4] * batch)
    # N timed runs (default 3), ALL recorded in the JSON. The shared-tenancy
    # TPU attachment shows transient multi-x degradation windows, so the
    # headline is the best rep — but only while the median agrees within
    # 5%; a best/median gap beyond that means the samples disagree and the
    # median (robust) becomes the headline. Identical work per run.
    rep_rows = []
    for rep in range(reps):
        # Budget guard: once at least one rep exists, never start a rep
        # the budget can't fit — a truncated-reps row beats a lost artifact.
        if rep_rows:
            rep_cost = rep_rows[-1][3]
            if remaining() < rep_cost * 1.3 + 15:
                log(f"[bench] budget: stopping after {len(rep_rows)} reps "
                    f"({remaining():.0f}s left)")
                break
        t0 = time.perf_counter()
        with profile_trace(profile_dir,
                           enabled=bool(profile_dir) and rep == 0):
            batcher.run(model.params, pixel_fn, np.asarray(pre_ids[0]),
                        np.asarray(post_ids[0]), plen_scalar,
                        n_images=n_images, max_new_per_image=caps)
        wall = time.perf_counter() - t0
        ips = n_images / wall
        if os.environ.get("VLM_TPU_BENCH_STATS", "0") == "1":
            log(f"[bench] batcher stats (rep {rep}): {batcher.last_stats}")
        lats = sorted(l for l in batcher.last_latency_s if l is not None)
        r50 = 1e3 * lats[len(lats) // 2]
        r99 = 1e3 * lats[min(len(lats) - 1, int(len(lats) * 0.99))]
        log(f"[bench] continuous (B={batch}, rep {rep}): {ips:.2f} img/s, "
            f"latency p50 {r50:.0f} ms / p99 {r99:.0f} ms")
        rep_rows.append((ips, r50, r99, wall))
    rep_ips = sorted(r[0] for r in rep_rows)
    median_ips = float(np.median(rep_ips))
    best = max(rep_rows, key=lambda r: r[0])
    if best[0] <= 1.05 * median_ips:
        cont_ips, p50, p99 = best[:3]
        headline_policy = "best (median within 5%)"
    else:
        # disagreeing samples: fall back to the robust middle. Lower middle
        # for even n — upper middle IS the outlier when n=2.
        by_ips = sorted(rep_rows, key=lambda r: r[0])
        cont_ips, p50, p99 = by_ips[(len(by_ips) - 1) // 2][:3]
        headline_policy = "median (best deviated >5%)"
    log(f"[bench] continuous (B={batch}): headline {cont_ips:.2f} img/s "
        f"[{headline_policy}], median {median_ips:.2f}, "
        f"latency p50 {p50:.0f} ms / p99 {p99:.0f} ms")
    if profile_dir:
        log(f"[bench] profiler trace written to {profile_dir}")

    # ---------- wave engine on the same workload ----------
    wave_ips = 0.0
    if run_wave and remaining() > 120:
        engine = model._engine(batch, plen_scalar, max_tokens)
        pixels = pixel_fn(list(range(batch)))
        r = engine.generate(model.params, pixels, pre_ids, post_ids, plen,
                            max_new_per_seq=jnp.asarray(
                                np.resize(caps, batch)))
        _ = np.asarray(r.tokens)  # compile
        t0 = time.perf_counter()
        done = 0
        while done < n_images:
            wave_caps = np.resize(caps[done:done + batch], batch)
            r = engine.generate(model.params, pixels, pre_ids, post_ids,
                                plen,
                                max_new_per_seq=jnp.asarray(wave_caps))
            _ = np.asarray(r.tokens)
            done += batch
        wave_ips = done / (time.perf_counter() - t0)
        log(f"[bench] wave (B={batch}, device-resident pixels): "
            f"{wave_ips:.2f} img/s")
    elif run_wave:
        log(f"[bench] budget: skipping wave ({remaining():.0f}s left)")

    row = {
        "metric": f"{model_name}_{size}_{quant}_zero_shot_images_per_sec"
        if quant != "bf16"
        else f"{model_name}_{size}_zero_shot_images_per_sec",
        "value": round(cont_ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(cont_ips / seq_ips, 2) if seq_ips > 0 else 0.0,
        "p50_latency_ms": round(p50, 1),
        "p99_latency_ms": round(p99, 1),
        "reps_img_s": [round(r, 3) for r in rep_ips],
        "median_img_s": round(median_ips, 3),
        "headline_policy": headline_policy,
        "wave_img_s": round(wave_ips, 3),
        "sequential_img_s": round(seq_ips, 3),
        "sequential_n": n_seq,
        "prompt_ids": want_ids,
        "max_tokens": max_tokens,
        "batch": batch,
        "engine": "continuous_batcher",
    }
    if len(rep_rows) < reps:
        row["reps_truncated"] = f"{len(rep_rows)}/{reps} (budget)"
    return row


def main():
    import numpy as np
    from PIL import Image

    model_name = os.environ.get("VLM_TPU_BENCH_MODEL", "paligemma")
    # Default size label = the family's canonical decoder size (any
    # non-"test" string builds the same full-size config, but the metric
    # name carries it — "blip2_3b_..." would mislabel OPT-6.7B).
    size = os.environ.get("VLM_TPU_BENCH_SIZE") or \
        {"paligemma": "3b", "blip2": "6.7b", "llava": "7b"}.get(
            model_name, "3b")
    quant = os.environ.get("VLM_TPU_BENCH_QUANT", "bf16")
    n_images = int(os.environ.get("VLM_TPU_BENCH_N", "512"))
    # 128 slots measured best on v5e with adaptive chunks (round 2);
    # decode-step cost is nearly flat in batch, so more slots win once
    # host syncs no longer scale with tokens. Admission block rides the
    # batcher default (clamp(B//8, 4, 8) — round-5 sweep) unless
    # VLM_TPU_BENCH_ADMIT pins it.
    batch = int(os.environ.get("VLM_TPU_BENCH_BATCH", "128"))
    max_tokens = int(os.environ.get("VLM_TPU_BENCH_TOKENS", "100"))
    n_seq = int(os.environ.get("VLM_TPU_BENCH_SEQ_N", "16"))
    run_wave = os.environ.get("VLM_TPU_BENCH_WAVE", "1") != "0"
    profile_dir = os.environ.get("VLM_TPU_PROFILE_DIR", "")
    reps = max(1, int(os.environ.get("VLM_TPU_BENCH_REPS", "3")))
    # Prompt regimes: VLM_TPU_BENCH_REGIMES="0,60" measures both in this
    # process; VLM_TPU_BENCH_PROMPT_IDS=n is the single-regime spelling.
    regimes_env = os.environ.get("VLM_TPU_BENCH_REGIMES", "").strip()
    if regimes_env:
        regimes = [int(x) for x in regimes_env.split(",") if x.strip()]
    else:
        regimes = [int(os.environ.get("VLM_TPU_BENCH_PROMPT_IDS", "0"))]

    import jax
    log(f"[bench] devices: {jax.devices()}")
    log(f"[bench] {model_name} size={size} N={n_images} batch={batch} "
        f"max_tokens={max_tokens} regimes={regimes} "
        f"budget={BUDGET_S:.0f}s")

    from vlm_tpu.models.factory import VLMModelFactory
    t0 = time.perf_counter()
    model = VLMModelFactory.create_model(model_name, quantization=quant,
                                         size=size)
    log(f"[bench] model built in {time.perf_counter() - t0:.1f}s "
        f"(elapsed {elapsed():.0f}s)")

    rng = np.random.default_rng(0)
    # Images live on DISK and are decoded through the native C++ loader —
    # exactly the product path (`VLMModel.generate_dataset`'s pixel_fn,
    # models/base_model.py). The earlier in-memory PIL variant decoded on
    # one thread and, after the round-3 prefill/decode wins, became the
    # bottleneck: batcher stats showed 0.5-1.1 s of block_wait per 4.5 s
    # run (prefetch could no longer hide single-threaded host decode).
    import tempfile
    img_dir = tempfile.mkdtemp(prefix="vlm_bench_imgs_")
    img_paths = []
    for i in range(max(n_images, batch)):
        p = f"{img_dir}/img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (128, 96, 3),
                                     dtype=np.uint8)).save(p, quality=92)
        img_paths.append(p)
    # Variable-length workload: per-image caps model EOS-early generations
    # under the reference's max_tokens=100. VLM_TPU_BENCH_CAP_LO=100 pins
    # every cap to max_tokens (fixed-length workload — comparable to a
    # random-weight product run where greedy never samples EOS).
    cap_lo = int(os.environ.get("VLM_TPU_BENCH_CAP_LO", "0")) or \
        min(8, max_tokens)
    cap_lo = min(cap_lo, max_tokens)
    caps = rng.integers(cap_lo, max_tokens + 1,
                        size=n_images).astype(np.int32)
    mean_len = float(caps.mean())
    log(f"[bench] variable-length caps: mean {mean_len:.1f}, "
        f"min {caps.min()}, max {caps.max()}")

    import jax.numpy as jnp  # noqa: F401 — ensures backend ready pre-measure

    from vlm_tpu.data.native_loader import load_batch
    from vlm_tpu.ops.preprocess import normalize_images

    def pixel_fn(idxs):
        import jax.numpy as jnp
        batch_u8 = load_batch([img_paths[i % len(img_paths)] for i in idxs],
                              model.recipe)
        return normalize_images(
            jnp.asarray(batch_u8),
            recipe=model.recipe, compute_dtype=model.policy.compute_dtype)

    common = dict(batch=batch, max_tokens=max_tokens, n_images=n_images,
                  caps=caps, pixel_fn=pixel_fn, reps=reps,
                  profile_dir=profile_dir, model_name=model_name, size=size,
                  quant=quant)

    # First regime fills the top-level result (headline continuity with
    # rounds 1-4); extra regimes ride a "regimes" array. The headline JSON
    # is complete — and therefore recoverable — the moment regime 0 is done.
    row = measure_regime(model, regimes[0], n_seq=n_seq, run_wave=run_wave,
                         **common)
    row["mean_gen_len"] = round(mean_len, 1)
    RESULT.update(row)

    extra_rows = []
    for want_ids in regimes[1:]:
        # A second regime costs one batcher compile + reps (~rep cost known
        # from regime 0). Skip with a recorded reason if it can't fit.
        if remaining() < 180:
            log(f"[bench] budget: skipping regime prompt_ids={want_ids} "
                f"({remaining():.0f}s left)")
            extra_rows.append({"prompt_ids": want_ids, "skipped": "budget"})
            continue
        extra_rows.append(measure_regime(model, want_ids, n_seq=0,
                                         run_wave=False, **common))
    if extra_rows:
        RESULT["regimes"] = extra_rows

    # ---------- optional: probing feature-extraction throughput ----------
    if os.environ.get("VLM_TPU_BENCH_PROBE", "0") == "1":
        bb = model.get_vision_backbone(cleanup=True)

        def open_window(start):
            # Open per-window: holding every image's fd at once would hit
            # the ulimit at large VLM_TPU_BENCH_N (PIL keeps fds open).
            sl = img_paths[start:start + batch]
            return [Image.open(p) for p in sl]

        feats = bb.forward(open_window(0))           # compile
        _ = np.asarray(feats)
        t0 = time.perf_counter()
        done = 0
        while done < n_images:
            start = done % max(1, len(img_paths) - batch + 1)  # rotate
            _ = np.asarray(bb.forward(open_window(start)))
            done += batch
        log(f"[bench] probing feature extraction (B={batch}): "
            f"{done / (time.perf_counter() - t0):.1f} img/s")

    # Variant rows ride the default driver invocation but never the CI
    # tiny-model config (size="test"): each variant subprocess builds a
    # full-size model.
    if os.environ.get("VLM_TPU_BENCH_VARIANTS", "1") != "0" \
            and size != "test":
        RESULT["variants"] = run_variants()
    RESULT["bench_wall_s"] = round(elapsed(), 1)
    _emit()


# Documented per-family best recipes (IMPLEMENTATION_NOTES round-3/4 family
# tables; VERDICT r4 items 1+4): each row is measured with the same
# reps/median/p50/p99 protocol as the headline, in a fresh subprocess so
# model HBM footprints never overlap. Each family measures BOTH prompt
# regimes in one subprocess via "regimes": the byte-fallback default (0)
# and the realistic 60-id text prompt a real SentencePiece/BPE checkpoint
# produces. Order within "regimes" is priority order — the budget drops the
# tail first (for BLIP-2 the realistic regime leads: its 32 Q-Former image
# tokens make the text prompt the dominant prefill cost, so the 60-id row
# is its deployment number).
VARIANTS = [
    {
        "label": "paligemma_3b_8bit_noout_max",
        "recipe": "3B int8 MXU prefill (dynamic_noout), 128 slots, "
                  "admit 8, bf16 KV",
        "env": {"VLM_TPU_BENCH_QUANT": "8bit",
                "VLM_TPU_INT8_PREFILL": "dynamic_noout",
                "VLM_TPU_BENCH_ADMIT": "8",
                "VLM_TPU_BENCH_REGIMES": "0,60"},
    },
    {
        "label": "blip2_6.7b_8bit_64slot_int8kv",
        "recipe": "BLIP-2 OPT-6.7B 8bit noout+qv, 64 slots, admit 8, "
                  "int8 KV",
        "env": {"VLM_TPU_BENCH_MODEL": "blip2",
                "VLM_TPU_BENCH_QUANT": "8bit",
                "VLM_TPU_INT8_PREFILL": "dynamic_noout",
                "VLM_TPU_QUANT_VISION": "1",
                "VLM_TPU_KV_CACHE": "int8",
                "VLM_TPU_BENCH_BATCH": "64",
                "VLM_TPU_BENCH_N": "256",
                "VLM_TPU_BENCH_ADMIT": "8",
                "VLM_TPU_BENCH_REGIMES": "60,0"},
    },
    {
        "label": "llava_7b_8bit_16slot_int8kv",
        "recipe": "LLaVA-7B 8bit noout, 16 slots, admit 4, int8 KV",
        "env": {"VLM_TPU_BENCH_MODEL": "llava",
                "VLM_TPU_BENCH_QUANT": "8bit",
                "VLM_TPU_INT8_PREFILL": "dynamic_noout",
                "VLM_TPU_KV_CACHE": "int8",
                "VLM_TPU_BENCH_BATCH": "16",
                "VLM_TPU_BENCH_N": "192",
                "VLM_TPU_BENCH_ADMIT": "4",
                "VLM_TPU_BENCH_REGIMES": "0,60"},
    },
]

# Every regime-defining knob a variant row's label depends on. Children get
# the recipe's value or the hard default — never a user's headline override
# (an inherited VLM_TPU_BENCH_SIZE/TOKENS/... would silently change the
# labeled row's conditions). Empty default = unset in the child.
VARIANT_KNOB_DEFAULTS = {
    "VLM_TPU_BENCH_MODEL": "paligemma",
    "VLM_TPU_BENCH_SIZE": "",
    "VLM_TPU_BENCH_QUANT": "bf16",
    "VLM_TPU_BENCH_N": "512",
    "VLM_TPU_BENCH_BATCH": "128",
    "VLM_TPU_BENCH_TOKENS": "100",
    "VLM_TPU_BENCH_CAP_LO": "",
    "VLM_TPU_BENCH_REPS": "3",
    "VLM_TPU_BENCH_ADMIT": "",
    "VLM_TPU_BENCH_SYNC": "",
    "VLM_TPU_BENCH_PROMPT_IDS": "",
    "VLM_TPU_BENCH_REGIMES": "",
    "VLM_TPU_KV_CACHE": "",
    "VLM_TPU_INT8_PREFILL": "",
    "VLM_TPU_QUANT_VISION": "",
    "VLM_TPU_PROFILE_DIR": "",
    "VLM_TPU_BENCH_STATS": "",
    "VLM_TPU_BENCH_PROBE": "",
}

# Floor for launching another variant: a useful child needs a model build
# (~100-200 s full-size) + batcher compile + >=1 rep. Below this, skip.
MIN_VARIANT_S = 240.0

# Wall-clock the parent reserves for winding a child down (SIGTERM grace +
# emit + exit). The parent exits within ~this of BUDGET_S.
EXIT_SLACK_S = 45.0


def run_variants():
    """Run each family recipe in a fresh subprocess and collect its rows.

    Budget-aware (VERDICT r4 item 1): before each launch the remaining
    wall-clock budget is checked against the variant cost estimate (the max
    of observed completed-variant walls and MIN_VARIANT_S); variants that
    can't fit are recorded as ``{"skipped": reason}`` rows — truncation is
    explicit, never silent. Each child gets the remaining budget via
    VLM_TPU_BENCH_BUDGET_S so it can drop its own tail regimes/reps and
    still exit with a complete JSON line.

    A failed/timed-out variant records its error instead of killing the
    headline result — the driver's artifact degrades row-by-row.

    Hard deadline discipline (learned the hard way in round 5's cold-cache
    validation run): the child's *internal* budget only stops it starting
    new reps/regimes — a cold batcher compile or an in-flight rep can
    overshoot it by minutes, and a slack subprocess backstop then pushes
    the PARENT past its own budget (observed: parent still alive at 1285 s
    of a 1200 s budget → driver rc=124 even though the JSON was emitted).
    So the parent now enforces an absolute deadline per child: at
    ``remaining() - EXIT_SLACK_S`` the child gets SIGTERM — its own signal
    handler emits a partial-but-parseable row — then 15 s later SIGKILL.
    The parent therefore always exits within ~EXIT_SLACK_S of BUDGET_S."""
    import subprocess
    rows = []
    observed_walls = []
    for v in VARIANTS:
        est = max([MIN_VARIANT_S] + observed_walls)
        if remaining() < est + EXIT_SLACK_S:
            log(f"[bench] budget: skipping variant {v['label']} "
                f"({remaining():.0f}s left, est {est:.0f}s)")
            rows.append({"label": v["label"], "recipe": v["recipe"],
                         "skipped": f"budget ({remaining():.0f}s left)"})
            continue
        env = dict(os.environ)
        env.update(VARIANT_KNOB_DEFAULTS)
        env.update(v["env"])
        env = {k: val for k, val in env.items() if val != ""}
        # The child's internal budget is advisory (it can overshoot on a
        # long compile); the parent's SIGTERM at child_deadline is the
        # real bound. Budget the child under the deadline so well-behaved
        # children finish on their own.
        child_deadline = max(30.0, remaining() - EXIT_SLACK_S)
        child_budget = max(30.0, child_deadline - 30.0)
        env.update({
            "VLM_TPU_BENCH_VARIANTS": "0",   # no recursion
            "VLM_TPU_BENCH_SEQ_N": "0",      # structural ratio is headline's
            "VLM_TPU_BENCH_WAVE": "0",
            "VLM_TPU_BENCH_BUDGET_S": f"{child_budget:.0f}",
        })
        log(f"[bench] variant {v['label']}: starting subprocess "
            f"(child budget {child_budget:.0f}s, "
            f"deadline {child_deadline:.0f}s)")
        t0 = time.perf_counter()
        stdout_text, stderr_text, err = "", "", None
        proc = subprocess.Popen(
            [sys.executable, str(Path(__file__).resolve())],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        try:
            stdout_text, stderr_text = proc.communicate(
                timeout=child_deadline)
        except subprocess.TimeoutExpired:
            # Deadline: SIGTERM → the child's handler emits its partial
            # JSON row; SIGKILL only if it ignores that too.
            proc.terminate()
            try:
                stdout_text, stderr_text = proc.communicate(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()
                stdout_text, stderr_text = proc.communicate()
            err = "deadline (SIGTERM)"
        try:
            line = stdout_text.strip().splitlines()[-1] \
                if stdout_text.strip() else ""
            row = json.loads(line)
            row["label"] = v["label"]
            row["recipe"] = v["recipe"]
            row["wall_s"] = round(time.perf_counter() - t0, 1)
            if err:
                row["deadline_hit"] = err
            else:
                observed_walls.append(row["wall_s"])
        except Exception as e:  # noqa: BLE001 — degrade row-by-row
            tail = stderr_text.strip().splitlines()[-1][:300] \
                if stderr_text.strip() else ""
            row = {"label": v["label"], "recipe": v["recipe"],
                   "error": err or f"{type(e).__name__}: {e}"[:300],
                   "stderr_tail": tail}
        log(f"[bench] variant {v['label']}: "
            f"{row.get('value', row.get('error', row.get('skipped')))}")
        rows.append(row)
        RESULT["variants"] = rows  # keep the partial list emit-ready
    return rows


if __name__ == "__main__":
    # Contract: stdout carries EXACTLY one JSON line. Library status prints
    # (model-ready, sharding notices, parse warnings) are routed to stderr
    # for the bench process only; the final JSON goes to sys.__stdout__.
    install_artifact_guards()
    sys.stdout = sys.stderr
    main()
