"""VLM checkpoint save/load in the framework's own format.

The reference has no model-level checkpointing (weights always stream from
the HF hub, `/root/reference/models/base_model.py:31-35`); probing
checkpoints are separate (`vlm_tpu.probing.train.utils`). This module covers
the full-model story: ``save_vlm_checkpoint`` writes the param pytree as
msgpack alongside a ``config.yaml`` describing family/size/quantization, and
:class:`vlm_tpu.models.base_model.VLMModel` auto-detects the format when a
``model_id`` directory contains ``params.msgpack`` (our format) vs
``*.safetensors`` (HF conversion)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np
import yaml


def save_vlm_checkpoint(path, params: Any, meta: Dict[str, Any]) -> None:
    from flax import serialization

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    def to_host(x):
        if isinstance(x, jax.Array) or hasattr(x, "addressable_shards"):
            return np.asarray(x)
        return x

    state = serialization.to_state_dict(jax.tree.map(to_host, params))
    (path / "params.msgpack").write_bytes(
        serialization.msgpack_serialize(state))
    (path / "config.yaml").write_text(
        yaml.safe_dump(meta, sort_keys=False), encoding="utf-8")


def load_vlm_checkpoint(path, params_template: Any) -> Any:
    from flax import serialization

    path = Path(path)
    blob = serialization.msgpack_restore(
        (path / "params.msgpack").read_bytes())
    return serialization.from_state_dict(params_template, blob)


def checkpoint_meta(path) -> Dict[str, Any]:
    p = Path(path) / "config.yaml"
    if not p.exists():
        return {}
    return yaml.safe_load(p.read_text()) or {}
