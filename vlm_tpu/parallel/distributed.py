"""Multi-host wiring: single-controller JAX over TPU pods.

The reference is strictly single-process (SURVEY.md §2 #35 — no NCCL/MPI/
launchers; its only multi-device mechanism is ``device_map="auto"``). The
TPU-native equivalent of a distributed backend is:

1. every host calls :func:`initialize_multihost` (→
   ``jax.distributed.initialize``; on Cloud TPU coordinator/process ids
   auto-discover from the TPU metadata);
2. build the global mesh over ``jax.devices()`` (all hosts' chips) with
   `vlm_tpu.core.mesh.make_mesh`;
3. everything else is unchanged — params/batches placed with
   `vlm_tpu.parallel.sharding`, collectives compiled by XLA over ICI
   (intra-slice) and DCN (inter-slice).

Per-host input feeding uses :func:`process_local_slice` so each host decodes
only its shard of the batch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (no-op if already
    initialized). On Cloud TPU all arguments auto-discover.

    Must run before anything touches a JAX backend — probing the backend
    first (e.g. ``jax.process_count()``) would initialize it locally and
    make distributed init impossible, so this only inspects the
    distributed-client state."""
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError) as e:
        # Explicit multi-process requests must not fall back silently.
        if num_processes not in (None, 1):
            raise
        print(f"[distributed] single-process mode ({e})")


def process_local_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    per = global_batch // n
    return jax.process_index() * per, per
