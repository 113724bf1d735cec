#!/usr/bin/env python
"""A/B the prefill attention impls (xla vs flash) at the exact product
shapes: the three vision towers and the three decoder prefills (incl.
PaliGemma's prefix-LM mask, flash-eligible since round 4).

Each row is scan-amortized over ITERS calls of the bare attention op on
device-resident operands, so per-dispatch overhead drops out and the
number is the marginal per-call cost the full program sees.

Usage: python scripts/bench_attn_shapes.py [--iters 32]
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


# (label, b, h, kvh, s, d, causal, prefix) — b is the admission group (32)
# for towers/prefills; BLIP-2 admits into a 64-slot batcher but its bench
# recipe admits 32 at a time too.
SHAPES = [
    ("siglip_tower  (pali g=32)", 32, 16, 16, 256, 72, False, False),
    ("eva_tower     (blip2 g=32)", 32, 16, 16, 257, 88, False, False),
    ("clip_tower    (llava g=32)", 32, 16, 16, 577, 64, False, False),
    ("gemma_prefill (pali S=404)", 32, 8, 1, 404, 256, True, True),
    ("opt_prefill   (blip2 S=1030)", 32, 32, 32, 1030, 128, True, False),
    ("vicuna_prefill(llava S=806)", 32, 32, 32, 806, 128, True, False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_tpu.ops.attention import attention

    log(f"[attn] devices: {jax.devices()}")
    rows = []
    for label, b, h, kvh, s, d, causal, prefix in SHAPES:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, kvh, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, kvh, s, d)), jnp.bfloat16)
        pfx = jnp.full((b,), s - 40, jnp.int32) if prefix else None
        kvl = jnp.full((b,), s, jnp.int32) if causal else None

        def run(impl, q=q, k=k, v=v, pfx=pfx, kvl=kvl, causal=causal):
            @jax.jit
            def many(q, k, v):
                def body(c, _):
                    o = attention(c, k, v, causal=causal, kv_len=kvl,
                                  prefix_len=pfx, impl=impl)
                    # feed output back so scan iterations can't be elided
                    return o.astype(c.dtype), ()
                o, _ = jax.lax.scan(body, q, None, length=args.iters)
                return o

            out = many(q, k, v)
            jax.block_until_ready(out)
            np.asarray(out[0, 0, 0])  # force through the tunnel
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(many(q, k, v)[0, 0, 0])
                best = min(best, time.perf_counter() - t0)
            return 1e3 * best / args.iters

        t_x = run("xla")
        t_f = run("flash")
        rows.append((label, t_x, t_f))
        log(f"[attn] {label:30s} xla {t_x:7.3f} ms  flash {t_f:7.3f} ms  "
            f"xla/flash {t_x / t_f:5.2f}x")
    log("[attn] done")


if __name__ == "__main__":
    main()
