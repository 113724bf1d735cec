"""Probing train utilities: seeds, class counts/weights, masked losses,
weighted sampling, checkpoint helpers.

Behavioral mirror of `/root/reference/probing/train/utils.py` with JAX-native
replacements: msgpack pytree checkpoints instead of ``torch.save``, a numpy
weighted sampler instead of ``WeightedRandomSampler``, and pure-jnp masked
cross-entropy instead of ``nn.CrossEntropyLoss(ignore_index=-1)``.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MISSING_LABEL = -1


# ---------------- misc ----------------
def set_seed(seed: int = 42):
    random.seed(seed)
    np.random.seed(seed)


def load_config(path) -> dict:
    import yaml
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)


def get_num_classes_for_task(task: str) -> int:
    """Task class-count constants (reference: utils.py:19-25)."""
    t = task.lower()
    if t == "gender":
        return 2
    if t == "emotion":
        return 7
    if t == "ethnicity":
        return 4
    if t == "age":
        return 9
    raise ValueError(f"Unrecognized task: {task}")


def targets_to_arrays(targets_list: List[dict],
                      tasks: List[str]) -> Dict[str, np.ndarray]:
    """Target dicts → int64 arrays with -1 for missing
    (reference ``targets_to_tensors``, utils.py:32-43)."""
    out = {}
    for task in tasks:
        ys = []
        for t in targets_list:
            v = t.get(task, None) if isinstance(t, dict) else None
            try:
                ys.append(int(v) if v is not None else MISSING_LABEL)
            except Exception:
                ys.append(MISSING_LABEL)
        out[task] = np.asarray(ys, dtype=np.int64)
    return out


# ---------------- class / sample weights ----------------
def counts_to_weights(counts: np.ndarray) -> np.ndarray:
    """``w_i = (1/max(c_i,1)) * (C / Σ_j 1/max(c_j,1))`` → mean 1
    (reference: utils.py:46-51)."""
    counts = np.maximum(counts.astype(np.float64), 1.0)
    inv = 1.0 / counts
    return inv * (len(counts) / inv.sum())


def build_per_sample_weights(dataset, tasks: List[str], agg_counts,
                             beta: float = 1.0,
                             eps: float = 1e-8) -> np.ndarray:
    """``w_i ∝ Σ_t 1[y_{i,t} != -1] · (1/freq_t)^β``, normalized to mean ~1
    (reference: utils.py:53-80). Uses bulk metadata — no image decoding."""
    tasks = [t.lower() for t in tasks]
    freq = {t: float(max(1, int(np.sum(
        agg_counts.get(t, []) if isinstance(agg_counts, dict) else []))))
        for t in tasks}
    inv_pow = {t: (1.0 / freq[t]) ** beta for t in tasks}

    labels = {t: _labels_for(dataset, t) for t in tasks}
    N = len(dataset)
    w = np.zeros(N, dtype=np.float32)
    for t in tasks:
        w += np.where(labels[t] != MISSING_LABEL, inv_pow[t], 0.0)
    fallback = min(inv_pow.values()) if inv_pow else 1.0
    w = np.where(w <= 0.0, fallback, w)
    return w / (float(np.mean(w)) + eps)


def _labels_for(dataset, task: str) -> np.ndarray:
    if hasattr(dataset, "get_all_labels"):
        try:
            arr = np.asarray(dataset.get_all_labels(task),
                             dtype=np.int64).reshape(-1)
            if arr.shape[0] == len(dataset):
                return arr
        except Exception:
            pass
    out = np.full(len(dataset), MISSING_LABEL, dtype=np.int64)
    for i in range(len(dataset)):
        sample = dataset[i]
        lab = sample[1] if isinstance(sample, (tuple, list)) else \
            sample.get("labels", {}) if isinstance(sample, dict) else {}
        try:
            out[i] = int(lab.get(task, MISSING_LABEL)) \
                if isinstance(lab, dict) else MISSING_LABEL
        except Exception:
            out[i] = MISSING_LABEL
    return out


def build_weighted_sampler(
    dataset,
    task_class_weights: Dict[str, Optional[np.ndarray]],
    *,
    combine: str = "mean",
    min_weight: float = 1e-4,
    normalize: bool = True,
    replacement: bool = True,
    seed: int = 0,
) -> Tuple["WeightedSampler", np.ndarray]:
    """Per-sample weighted sampler from per-task class weights
    (reference: utils.py:122-215). Returns (sampler, weights)."""
    tasks = list(task_class_weights.keys())
    N = len(dataset)
    labels_per_task = {t: _labels_for(dataset, t) for t in tasks}

    weights = np.zeros(N, dtype=np.float32)
    n_parts = np.zeros(N, dtype=np.int32)
    for t in tasks:
        table = task_class_weights.get(t)
        if table is None:
            continue
        table = np.asarray(table, dtype=np.float32).ravel()
        lab = labels_per_task[t]
        valid = (lab != MISSING_LABEL) & (lab >= 0) & (lab < len(table))
        w_t = np.where(valid, table[np.clip(lab, 0, len(table) - 1)], 0.0)
        if combine == "max":
            weights = np.maximum(weights, w_t)
        else:
            weights += w_t
        n_parts += valid.astype(np.int32)
    if combine == "mean":
        weights = np.where(n_parts > 0, weights / np.maximum(n_parts, 1),
                           weights)
    weights = np.where(n_parts == 0, min_weight, weights)
    if normalize:
        weights = weights / max(float(weights.mean()), 1e-8)
    return WeightedSampler(weights, num_samples=N, replacement=replacement,
                           seed=seed), weights


class WeightedSampler:
    """numpy replacement for ``WeightedRandomSampler``: yields
    ``num_samples`` indices drawn ∝ weights per epoch."""

    def __init__(self, weights: np.ndarray, num_samples: int,
                 replacement: bool = True, seed: int = 0):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.p = self.weights / self.weights.sum()
        self.num_samples = num_samples
        self.replacement = replacement
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        idx = self._rng.choice(len(self.p), size=self.num_samples,
                               replace=self.replacement, p=self.p)
        return iter(idx.tolist())

    def __len__(self):
        return self.num_samples


# ---------------- masked losses ----------------
def masked_cross_entropy(logits: jax.Array, targets: jax.Array,
                         class_weights: Optional[jax.Array] = None
                         ) -> jax.Array:
    """Mean CE over targets != -1, optionally class-weighted.

    Matches ``nn.CrossEntropyLoss(weight=w, ignore_index=-1)`` semantics:
    the mean is weighted — ``Σ w_y·ce / Σ w_y`` (PyTorch's weighted-mean
    reduction). Returns NaN-free 0.0 when no valid targets.
    """
    valid = targets != MISSING_LABEL
    safe_t = jnp.clip(targets, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe_t[:, None], axis=1)[:, 0]
    if class_weights is not None:
        w = class_weights[safe_t]
    else:
        w = jnp.ones_like(ce)
    w = jnp.where(valid, w, 0.0)
    denom = jnp.sum(w)
    return jnp.where(denom > 0, jnp.sum(ce * w) / jnp.maximum(denom, 1e-9),
                     0.0)


def partition_float_params(params):
    """Split a param pytree into (trainable float leaves, frozen non-float
    leaves + structure) so grads are taken only over differentiable leaves.

    Quantized models carry int8/int4 ``q_kernel`` leaves (ops/quant.py) that
    ``jax.grad`` cannot differentiate; the reference's analogue freezes
    bitsandbytes Int8Params via requires_grad=False. Returns
    ``(float_leaves, merge)`` where ``merge(float_leaves)`` rebuilds the full
    pytree — use inside the loss so the grad tree is float-only::

        float_leaves, merge = partition_float_params(params)
        def loss_fn(fl):
            p = merge(fl)
            ...
        grads = jax.grad(loss_fn)(float_leaves)

    Flax ``Partitioned`` boxes are treated as leaves (their metadata rides
    along with the value, keeping shardings intact through the optimizer).
    """
    import flax.linen as nn

    def _is_boxed(x):
        return isinstance(x, nn.Partitioned)

    def _arr(x):
        return x.unbox() if _is_boxed(x) else x

    flat, treedef = jax.tree.flatten(params, is_leaf=_is_boxed)
    float_idx = [i for i, l in enumerate(flat)
                 if jnp.issubdtype(jnp.asarray(_arr(l)).dtype, jnp.inexact)]
    frozen = [None if i in set(float_idx) else l for i, l in enumerate(flat)]
    float_leaves = [flat[i] for i in float_idx]

    def merge(new_float_leaves):
        out = list(frozen)
        for i, leaf in zip(float_idx, new_float_leaves):
            out[i] = leaf
        return jax.tree.unflatten(treedef, out)

    return float_leaves, merge


# ---------------- checkpoint helpers ----------------
def save_state(model_path: Path, state_dicts: dict):
    """Serialize a blob of pytrees (msgpack) — the ``model.pt`` analogue
    (reference: utils.py:83-87)."""
    from flax import serialization

    def to_host(x):
        # Device arrays → numpy; keep strings/scalars as-is (np.asarray on a
        # str yields a unicode dtype msgpack can't round-trip).
        if isinstance(x, jax.Array) or hasattr(x, "addressable_shards"):
            return np.asarray(x)
        return x

    model_path = Path(model_path)
    model_path.parent.mkdir(parents=True, exist_ok=True)
    # to_state_dict first: optimizer states are (named)tuples, which msgpack
    # cannot serialize directly.
    state = serialization.to_state_dict(jax.tree.map(to_host, state_dicts))
    model_path.write_bytes(serialization.msgpack_serialize(state))


def load_state(model_path: Path) -> Optional[dict]:
    from flax import serialization
    model_path = Path(model_path)
    if not model_path.exists():
        return None
    return serialization.msgpack_restore(model_path.read_bytes())


def save_training_state(state_path: Path, opt_state, next_epoch: int,
                        best_val: float, meta: dict, cfg_path: str,
                        lr_scale: float = 1.0, plateau: Optional[dict] = None):
    """Optimizer + scheduler + progress blob — the ``training_state.pth``
    analogue (reference: utils.py:90-104)."""
    blob = {
        "opt_state": opt_state,
        "epoch": int(next_epoch),
        "best_val": float(best_val),
        "meta": meta,
        "config_path": str(cfg_path),
        "lr_scale": float(lr_scale),
        "plateau": plateau or {},
    }
    save_state(state_path, blob)


def try_resume_training(state_path: Path, opt_state_template):
    """Restore (opt_state, start_epoch, best_val, lr_scale, plateau)
    (reference: utils.py:106-120). The template fixes the pytree structure."""
    blob = load_state(state_path)
    if blob is None:
        return opt_state_template, 0, float("inf"), 1.0, {}
    from flax import serialization
    opt_state = serialization.from_state_dict(
        opt_state_template, blob["opt_state"]) \
        if blob.get("opt_state") is not None else opt_state_template
    # msgpack restores tuples as dicts keyed by index when structures differ;
    # from_state_dict handles the mapping against the template.
    start_epoch = int(blob.get("epoch", 0))
    best_val = float(blob.get("best_val", float("inf")))
    lr_scale = float(blob.get("lr_scale", 1.0))
    plateau = blob.get("plateau", {}) or {}
    print(f"[RESUME] training state from {state_path} | "
          f"start_epoch={start_epoch} | best_val={best_val:.6f}")
    return opt_state, start_epoch, best_val, lr_scale, plateau
