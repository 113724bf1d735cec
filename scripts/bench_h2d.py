#!/usr/bin/env python
"""Host→device transfer microbenchmark: times device_put of pixel-block-
sized arrays (and the device-side normalize), to quantify how much of each
batcher admission is input transfer on this attachment."""

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from vlm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    print(f"[h2d] devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    for shape, dtype in [((32, 224, 224, 3), np.uint8),
                         ((32, 224, 224, 3), np.float32),
                         ((2, 224, 224, 3), np.uint8)]:
        x = rng.integers(0, 255, shape).astype(dtype)
        mb = x.nbytes / 1e6
        # warm
        d = jnp.asarray(x); _ = np.asarray(d[0, 0, 0])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            d = jnp.asarray(x)
            _ = np.asarray(d[0, 0, 0])      # force completion
            times.append(time.perf_counter() - t0)
        lo = min(times)
        print(f"[h2d] {shape} {np.dtype(dtype).name:8s} {mb:7.2f} MB: "
              f"min {1e3*lo:7.1f} ms  ({mb/lo:6.0f} MB/s)",
              file=sys.stderr, flush=True)

    # D2H of a [8, 192] token block (the per-chunk pull)
    t = jnp.zeros((8, 192), jnp.int32)
    _ = np.asarray(t)
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(t)
        times.append(time.perf_counter() - t0)
    print(f"[h2d] D2H [8,192] int32: min {1e3*min(times):.1f} ms",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
