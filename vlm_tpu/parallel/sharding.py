"""SPMD sharding: param/batch placement over the (data, model) mesh.

This is the framework's distributed backend (SURVEY.md §5): the reference
has none — its only multi-device mechanism is HF Accelerate's
``device_map="auto"`` vertical split (`/root/reference/models/base_model.py:81`).
Here:

- every weight matrix carries logical axis names via
  ``nn.with_partitioning`` (see `vlm_tpu.models.layers.Dense`): attention
  QKV and MLP up-projections shard their output dim over ``"model"``,
  out/down-projections shard their input dim, embeddings shard the vocab —
  the standard Megatron layout, so each transformer block needs exactly one
  all-reduce per sub-layer, inserted automatically by XLA (GSPMD) over ICI;
- batches shard over ``"data"``;
- ``jax.jit`` with sharded inputs compiles the collectives; no hand-written
  NCCL/MPI anywhere.

Pipeline, sequence and expert parallelism are deliberate non-goals for this
workload (models fit in one or two chips; sequences are ≤ ~1.2k tokens;
no MoE) — documented in SURVEY.md §5 "Long-context".
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree from the flax ``Partitioned`` metadata that the
    model modules attach to their kernels."""
    return nn.get_partition_spec(params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place params on the mesh per their logical axis names; unannotated
    leaves replicate. Flax ``Partitioned`` boxes keep their metadata (the
    array inside is placed)."""
    def place(x):
        if isinstance(x, nn.Partitioned):
            spec = P(*x.names)
            return x.replace_boxed(jax.device_put(
                x.unbox(), NamedSharding(mesh, spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, params,
                        is_leaf=lambda x: isinstance(x, nn.Partitioned))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Shard every array's leading (batch) dim over the data axis."""
    def place(x):
        spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1))) \
            if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, tree)


def shard_batch_if_divisible(tree: Any, mesh: Optional[Mesh]) -> Any:
    """Like :func:`shard_batch`, but per-leaf: leaves whose leading dim does
    not divide over the data axis (ragged tail batches) are left as-is
    (replicated by jit), and ``mesh=None`` is a no-op — the tolerant form the
    trainers use on loader batches."""
    if mesh is None:
        return tree
    d = mesh.shape[DATA_AXIS]

    def place(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] % d == 0:
            spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x
    return jax.tree.map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def assert_params_sharded(params: Any, mesh: Mesh) -> None:
    """Verify placement actually happened: every leaf must live on the mesh's
    devices, and — when the mesh has a non-trivial model axis — at least one
    kernel must be split across devices (not merely replicated). Used by the
    product scripts/tests as a cheap guard against a silently-dead mesh knob."""
    from ..core.mesh import MODEL_AXIS

    mesh_devices = set(mesh.devices.flat)
    leaves = jax.tree.leaves(params, is_leaf=lambda x: isinstance(
        x, nn.Partitioned))
    n_split = 0
    for leaf in leaves:
        arr = leaf.unbox() if isinstance(leaf, nn.Partitioned) else leaf
        if not hasattr(arr, "sharding"):
            continue
        devs = set(arr.sharding.device_set)
        if not devs.issubset(mesh_devices):
            raise AssertionError(
                f"param on devices {devs} outside the mesh {mesh_devices}")
        if not arr.sharding.is_fully_replicated:
            n_split += 1
    if mesh.shape.get(MODEL_AXIS, 1) > 1 and n_split == 0:
        raise AssertionError(
            "mesh has a model axis > 1 but no parameter is split across "
            "devices — shard_params was not applied")


def unbox(params: Any) -> Any:
    """Strip flax Partitioned boxes (after placement, compute code can work
    on raw arrays; `nn.apply` accepts either)."""
    return jax.tree.map(
        lambda x: x.unbox() if isinstance(x, nn.Partitioned) else x,
        params, is_leaf=lambda x: isinstance(x, nn.Partitioned))
