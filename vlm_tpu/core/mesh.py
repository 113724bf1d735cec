"""Device mesh construction and axis conventions.

The framework uses a 2-D logical mesh:

- ``"data"``: batch-sharded SPMD data parallelism (eval batches, probe
  training batches, decode slots);
- ``"model"``: tensor-parallel sharding of the large decoder matmuls.

This replaces the reference's only multi-device mechanism — HF Accelerate's
``device_map="auto"`` vertical layer split (`/root/reference/models/base_model.py:81`) —
with XLA-compiled collectives over ICI (SURVEY.md §5 "Distributed
communication backend").
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh.

    Args:
        data: size of the data axis; ``-1`` = all remaining devices.
        model: size of the model (tensor-parallel) axis.
        devices: device list (defaults to ``jax.devices()``).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1:
        raise ValueError(f"model axis size must be >= 1, got {model}")
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    """1x1 mesh over the first device (single-chip paths)."""
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Batch-dim sharding: first axis over "data", rest replicated."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_from_config(spec) -> Optional[Mesh]:
    """Resolve the config surface's ``mesh: {data, model}`` block to a Mesh.

    This is the product-side entry: the reference reaches multi-device with a
    single config-driven knob (``device_map="auto"``,
    `/root/reference/models/base_model.py:81`); here the same role is played
    by the YAML ``mesh:`` block, consumed by the model factory, the scripts
    and the trainers/testers.

    Accepts ``None`` (single-device), an existing :class:`Mesh` (passed
    through), or a dict with ``data`` (``-1`` = all remaining devices,
    default) and ``model`` (tensor-parallel ways, default 1). Returns
    ``None`` when the resolved mesh would be 1x1, so single-device runs keep
    the exact unsharded code path.
    """
    if spec is None:
        return None
    if isinstance(spec, Mesh):
        return spec if spec.size > 1 else None
    if not isinstance(spec, dict):
        raise TypeError(f"mesh config must be a dict or Mesh, got {spec!r}")
    unknown = set(spec) - {"data", "model"}
    if unknown:
        # A typo'd axis name ("modle: 4") would otherwise silently fall
        # back to its default and run without the intended parallelism.
        raise ValueError(
            f"unknown mesh config key(s) {sorted(unknown)}; "
            "expected only 'data' and 'model'")
    data = int(spec.get("data", -1) if spec.get("data") is not None else -1)
    model = int(spec.get("model") if spec.get("model") is not None else 1)
    n = len(jax.devices())
    if model < 1:
        raise ValueError(f"mesh.model must be >= 1, got {model}")
    if data == -1:
        data = max(1, n // model)
    if data < 1:
        raise ValueError(f"mesh.data must be >= 1 (or -1 for all "
                         f"remaining devices), got {data}")
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, "
            f"have {n}")
    if data * model == 1:
        return None
    return make_mesh(data=data, model=model,
                     devices=jax.devices()[:data * model])


@contextlib.contextmanager
def maybe_mesh(mesh: Optional[Mesh]):
    """Enter ``mesh`` as ambient if given, else no-op."""
    if mesh is None:
        yield
    elif hasattr(jax, "set_mesh"):
        with jax.set_mesh(mesh):
            yield
    else:
        with mesh:
            yield


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
