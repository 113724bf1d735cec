"""Parallelism layer: param/batch sharding over the (data, model) mesh,
multi-host initialization (SURVEY.md §2 item 35 — the reference has none)."""

from .distributed import initialize_multihost, process_local_slice
from .sharding import param_specs, replicate, shard_batch, shard_params, unbox

__all__ = ["initialize_multihost", "process_local_slice", "param_specs",
           "replicate", "shard_batch", "shard_params", "unbox"]
