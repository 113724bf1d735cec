"""Decode-step roofline diagnostic (runs on the real TPU).

The 3B decode step measured ~12 ms in round 1 vs a ~6 ms HBM floor
(weights ≈ 5 GB bf16 at ~819 GB/s on v5e). This script decomposes one decode
step to locate the gap:

  1. end-to-end decode step (scan of K steps inside one jit);
  2. LM head alone (embed.attend over the 257k vocab — ~1 GB of the traffic);
  3. one decoder block's MLP alone (the largest per-layer weights);
  4. a pure weight-streaming pass (achievable read bandwidth upper bound);
  5. decode step WITHOUT the KV-cache write (isolates _write_cache cost).

Usage: python scripts/bench_decode.py  [env: VLM_TPU_BENCH_SIZE=3b,
VLM_TPU_BENCH_BATCH=32, VLM_TPU_BENCH_STEPS=64, VLM_TPU_BENCH_CACHELEN=384]

Timing note: ``block_until_ready`` does not block through this
environment's TPU tunnel — every timed section syncs by pulling a scalar to
host.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("VLM_TPU_ROOT", str(REPO_ROOT))

from vlm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def log(*a):
    print(*a, flush=True)


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=3, **kw):
    """Median wall seconds over ``reps`` calls (first call excluded: compile)."""
    out = fn(*args, **kw)
    sync(out[0] if isinstance(out, tuple) else out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out[0] if isinstance(out, tuple) else out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    size = os.environ.get("VLM_TPU_BENCH_SIZE", "3b")
    batch = int(os.environ.get("VLM_TPU_BENCH_BATCH", "32"))
    n_steps = int(os.environ.get("VLM_TPU_BENCH_STEPS", "64"))
    cache_len = int(os.environ.get("VLM_TPU_BENCH_CACHELEN", "384"))

    log(f"[dec] devices={jax.devices()} size={size} B={batch} "
        f"steps={n_steps} cache_len={cache_len}")

    from vlm_tpu.models.configs import paligemma_config
    from vlm_tpu.models.decoder import init_kv_cache
    from vlm_tpu.models.vlm import init_vlm

    cfg = paligemma_config(size)
    dc = cfg.decoder
    module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.bfloat16,
                              param_dtype=jnp.bfloat16)
    t0 = time.perf_counter()

    dec_params = params["params"]["decoder"]

    def leaves_bytes(tree):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(tree))

    import flax.linen as fnn

    def unbox(t):
        return jax.tree.map(
            lambda x: x.unbox() if isinstance(x, fnn.Partitioned) else x,
            t, is_leaf=lambda x: isinstance(x, fnn.Partitioned))

    dec_params = unbox(dec_params)
    wbytes = leaves_bytes(dec_params)
    log(f"[dec] decoder params: {wbytes / 1e9:.2f} GB "
        f"(built in {time.perf_counter() - t0:.0f}s)")

    # ---- 1. end-to-end decode steps under scan ----
    cache0 = init_kv_cache(dc, batch, cache_len, jnp.bfloat16)
    tok0 = jnp.ones((batch,), jnp.int32)
    seq0 = jnp.full((batch,), cache_len - n_steps - 2, jnp.int32)

    import functools

    def make_run_steps(uniform):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def run_steps(p, cache, tok, seq):
            def body(carry, _):
                tok, seq, cache = carry
                logits, cache = module.apply(p, tok[:, None], seq, cache,
                                             method="decode_step",
                                             uniform_write=uniform)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (nxt, seq + 1, cache), ()
            (tok, seq, cache), _ = jax.lax.scan(body, (tok, seq, cache),
                                                None, length=n_steps)
            return tok, cache
        return run_steps

    for uniform in (False, True):
        run_steps = make_run_steps(uniform)

        def e2e():
            tok, cache = run_steps(
                params, init_kv_cache(dc, batch, cache_len, jnp.bfloat16),
                tok0, seq0)
            return tok

        t = timeit(e2e)
        step_ms = 1e3 * t / n_steps
        log(f"[dec] decode step (uniform_write={uniform}): {step_ms:.2f} ms "
            f"(implied {wbytes / (t / n_steps) / 1e9:.0f} GB/s "
            f"on weights alone)")

    # NOTE: every micro below loops n_steps times INSIDE one jit with a data
    # dependency between iterations — a single call is swamped by the
    # ~30 ms/call dispatch latency of this environment's TPU tunnel.
    def loop_in_jit(step_fn, x0):
        @jax.jit
        def run(x):
            def body(carry, _):
                return step_fn(carry), ()
            out, _ = jax.lax.scan(body, x, None, length=n_steps)
            return out
        return run

    # ---- 2. LM head alone ----
    emb = dec_params["embed"]["embedding"]
    x0 = jnp.ones((batch, dc.hidden), jnp.bfloat16)

    def lm_step(x):
        y = jax.lax.dot_general(x, emb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # cheap dependency folding y back to [B, H]
        return x + jnp.sum(y, axis=-1, keepdims=True).astype(x.dtype) * 1e-9

    t = timeit(loop_in_jit(lm_step, x0), x0) / n_steps
    log(f"[dec] lm head [{batch},{dc.hidden}]x[{emb.shape[0]},{dc.hidden}]^T: "
        f"{1e3 * t:.2f} ms ({emb.size * 2 / t / 1e9:.0f} GB/s)")

    # ---- 3. one block MLP ----
    b0 = dec_params["block_0"]["mlp"]
    gate, up, down = (b0["gate_proj"]["kernel"], b0["up_proj"]["kernel"],
                      b0["down_proj"]["kernel"])

    def mlp_step(x):
        h = jax.nn.silu(x @ gate) * (x @ up)
        return jnp.tanh(h @ down)

    t = timeit(loop_in_jit(mlp_step, x0), x0) / n_steps
    mlp_bytes = (gate.size + up.size + down.size) * 2
    log(f"[dec] one MLP ({mlp_bytes / 1e6:.0f} MB): {1e3 * t:.3f} ms "
        f"({mlp_bytes / t / 1e9:.0f} GB/s)")

    # ---- 4. weight streaming upper bound ----
    leaves = jax.tree.leaves(dec_params)

    @jax.jit
    def stream_loop(c0):
        def body(c, _):
            # (w + c) blocks loop-invariant hoisting of the reduction
            s = sum(jnp.sum((w + c.astype(w.dtype)).astype(jnp.float32))
                    for w in leaves)
            return s * 1e-20, ()
        out, _ = jax.lax.scan(body, c0, None, length=n_steps)
        return out

    t = timeit(stream_loop, jnp.asarray(0.0, jnp.float32)) / n_steps
    log(f"[dec] weight stream (read {wbytes / 1e9:.2f} GB): {1e3 * t:.2f} ms "
        f"({wbytes / t / 1e9:.0f} GB/s achievable)")

    # ---- 5. decode step without cache write ----
    @functools.partial(jax.jit, donate_argnums=(1,))
    def run_steps_nocache(p, cache, tok, seq):
        def body(carry, _):
            tok, seq, cache = carry
            logits, new_cache = module.apply(p, tok[:, None], seq, cache,
                                             method="decode_step")
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            # keep the OLD cache (write results unused -> DCE'd)
            return (nxt, seq + 1, cache), ()
        (tok, seq, cache), _ = jax.lax.scan(body, (tok, seq, cache), None,
                                            length=n_steps)
        return tok, cache

    def e2e_nc():
        tok, cache = run_steps_nocache(
            params, init_kv_cache(dc, batch, cache_len, jnp.bfloat16),
            tok0, seq0)
        return tok

    t = timeit(e2e_nc)
    log(f"[dec] decode step, cache write DCE'd: {1e3 * t / n_steps:.2f} ms")


if __name__ == "__main__":
    main()
