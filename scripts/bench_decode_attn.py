#!/usr/bin/env python
"""Decode-attention microbenchmark: XLA bshd matvec vs the fused Pallas
flash-decode kernel, at the continuous batcher's ACTUAL windowed shapes.

The round-3 kernel won 4x on an isolated full-cache stream but lost
end-to-end; its fixed per-layer costs (XLA-built [B,F,H] block-diagonal
query, pre-repeated [B,S,H] masks) were the measured reasons. The round-4
rework builds the query operand in-kernel from a compact [B,D,H] input and
reconstructs the rotating-window mask from three scalars (kv_window) — this
script closes the loop at the product shapes.

Method: lax.scan over ``--steps`` applications per impl (amortizes dispatch;
the axon tunnel adds ~40-50 ms per dispatch otherwise), jnp.sum-reduced
output fetched to force execution through the remote tunnel.

Usage: python scripts/bench_decode_attn.py [--shapes B,S,pcol[;...]]
       [--heads 32] [--head-dim 128] [--window 100] [--steps 64] [--bf16]
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
    # Defaults: BLIP-2 64-slot byte-inflated (1130), BLIP-2 realistic (192),
    # LLaVA-7B 16-slot (741) — prompt col = S - window.
    ap.add_argument("--shapes", default="64,1130;64,192;16,741")
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=0, help="0 = MHA")
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 cache instead of int8+scales")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_tpu.ops.attention import _xla_attention
    from vlm_tpu.ops.decode_attention import flash_decode_attention

    h, d = args.heads, args.head_dim
    kvh = args.kv_heads or h
    w = args.window
    log(f"[attn] devices: {jax.devices()}  H={h} KV={kvh} D={d} W={w}")

    for spec in args.shapes.split(";"):
        b, s = (int(x) for x in spec.split(","))
        pcol = s - w
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        q = jax.random.normal(ks[0], (b, h, 1, d)).astype(jnp.bfloat16)
        if args.bf16:
            kc = jax.random.normal(ks[1], (b, s, kvh, d)).astype(jnp.bfloat16)
            vc = jax.random.normal(ks[2], (b, s, kvh, d)).astype(jnp.bfloat16)
            ksc = vsc = None
        else:
            kc = jax.random.randint(ks[1], (b, s, kvh, d), -127, 128,
                                    jnp.int8)
            vc = jax.random.randint(ks[2], (b, s, kvh, d), -127, 128,
                                    jnp.int8)
            ksc = jax.random.uniform(ks[3], (b, s, kvh, 1), jnp.float32,
                                     0.005, 0.02)
            vsc = jax.random.uniform(ks[4], (b, s, kvh, 1), jnp.float32,
                                     0.005, 0.02)
        acol = jax.random.randint(ks[5], (b,), 0, w, jnp.int32)
        gcnt = jax.random.randint(ks[0], (b,), w // 2, w + 1, jnp.int32)
        cols = jnp.arange(s, dtype=jnp.int32)[None, :]
        jj = jnp.mod(cols - pcol - acol[:, None], w)
        valid = (cols < pcol) | ((cols < pcol + w) & (jj < gcnt[:, None]))

        kx = kc.astype(jnp.bfloat16) if kc.dtype == jnp.int8 else kc
        vx = vc.astype(jnp.bfloat16) if vc.dtype == jnp.int8 else vc

        @jax.jit
        def run_xla(q, kx, vx, valid, ksc=ksc, vsc=vsc):
            def step(c, _):
                o = _xla_attention(q, kx, vx, causal=False, scale=d ** -0.5,
                                   kv_valid=valid, kv_layout="bshd",
                                   k_scale=ksc, v_scale=vsc)
                return c + jnp.sum(o.astype(jnp.float32)), None
            out, _ = jax.lax.scan(step, jnp.zeros(()), None,
                                  length=args.steps)
            return out

        @jax.jit
        def run_flash(q, kc, vc, acol, gcnt, ksc=ksc, vsc=vsc):
            def step(c, _):
                o = flash_decode_attention(
                    q, kc, vc, kv_valid=None,
                    kv_window=(jnp.asarray(pcol, jnp.int32), w, acol, gcnt),
                    k_scale=ksc, v_scale=vsc)
                return c + jnp.sum(o.astype(jnp.float32)), None
            out, _ = jax.lax.scan(step, jnp.zeros(()), None,
                                  length=args.steps)
            return out

        # parity spot check first (single step, against XLA)
        o_x = _xla_attention(q, kx, vx, causal=False, scale=d ** -0.5,
                             kv_valid=valid, kv_layout="bshd",
                             k_scale=ksc, v_scale=vsc)
        o_f = flash_decode_attention(
            q, kc, vc, kv_valid=None,
            kv_window=(jnp.asarray(pcol, jnp.int32), w, acol, gcnt),
            k_scale=ksc, v_scale=vsc)
        rel = float(jnp.max(jnp.abs(o_x.astype(jnp.float32)
                                    - o_f.astype(jnp.float32)))
                    / (jnp.max(jnp.abs(o_x.astype(jnp.float32))) + 1e-9))
        cache_mb = (kc.size * kc.dtype.itemsize * 2) / 1e6
        floor_ms = cache_mb / 819e3 * 1e6  # v5e ~819 GB/s
        rows = {}
        for name, fn, fa in (("xla", run_xla, (q, kx, vx, valid)),
                             ("flash", run_flash, (q, kc, vc, acol, gcnt))):
            float(fn(*fa))  # compile + warm
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(fn(*fa))
                ts.append((time.perf_counter() - t0) / args.steps * 1e3)
            rows[name] = min(ts)
        log(f"[attn] B={b} S={s} pcol={pcol} "
            f"cache={cache_mb:.0f} MB floor={floor_ms:.3f} ms | "
            f"xla {rows['xla']:.3f} ms  flash {rows['flash']:.3f} ms "
            f"({rows['xla'] / rows['flash']:.2f}x)  relerr={rel:.1e}")


if __name__ == "__main__":
    main()
