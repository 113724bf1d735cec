"""LoRA fine-tuning for probe backbones (functional, module-free).

The reference framework enumerates LoRA targets per backbone
(``get_lora_target_names``, reference: llava.py:189-230, blip2.py:167-199,
paligemma.py:114-222) for use with PEFT but never wires the training loop.
Here LoRA is a first-class probe-training mode, TPU-native by construction:

LoRA's effective weight ``W_eff = W + (alpha/r) * A @ B`` is merged
*functionally* into the (frozen) backbone param tree inside the jitted
train step. No module surgery, exact LoRA math, differentiable through the
merge — gradients flow to ``A``/``B`` while the base ``W`` stays frozen via
``optax.set_to_zero`` — and XLA fuses the rank-r outer product into the
surrounding graph. At test time the adapters are merged once into the
param tree, so inference runs at exactly base-model speed.

Adapter trees are keyed by the same "/"-joined layer names
``get_lora_target_names`` returns (e.g. ``block_23/attn/q_proj``),
so the two surfaces compose directly::

    targets = backbone.get_lora_target_names({"last_k": 2, "attn_only": True})
    lora = init_lora(backbone.params, targets, rank=8, rng=key)
    merged = merge_lora(backbone.params, lora, alpha=16.0)
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

LoraTree = Dict[str, Dict[str, jax.Array]]


def _path_name(path) -> Tuple[List[str], int]:
    """Dict-key names along a flattened path and the index of "kernel"
    within them (-1 if absent). Non-dict path entries (e.g. the component
    ``nn.Partitioned`` boxes append after the leaf name) are ignored."""
    keys = [k.key for k in path
            if isinstance(k, jax.tree_util.DictKey)]
    try:
        ki = keys.index("kernel")
    except ValueError:
        ki = -1
    return keys, ki


def _layer_name(keys: List[str], ki: int) -> str:
    return "/".join(k for k in keys[:ki] if k != "params")


def kernel_shapes(params) -> Dict[str, Tuple[int, int]]:
    """Map of layer name -> (in_dim, out_dim) for every 2-D ``kernel``
    leaf in ``params`` (partitioning boxes are transparent to tree
    flattening, so this works on meshed trees too)."""
    out: Dict[str, Tuple[int, int]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys, ki = _path_name(path)
        if ki < 0 or getattr(leaf, "ndim", 0) != 2:
            continue
        out[_layer_name(keys, ki)] = (int(leaf.shape[0]), int(leaf.shape[1]))
    return out


def init_lora(params, target_names: Sequence[str], rank: int,
              rng: jax.Array) -> LoraTree:
    """Zero-effect initial adapters for ``target_names``: ``A`` he-uniform
    ``[in, r]`` (PEFT's kaiming init), ``B`` zeros ``[r, out]`` — so the
    merged model starts exactly at the base model."""
    if rank < 1:
        raise ValueError(f"lora rank must be >= 1, got {rank}")
    shapes = kernel_shapes(params)
    lora: LoraTree = {}
    init_a = jax.nn.initializers.he_uniform()
    for i, name in enumerate(sorted(set(target_names))):
        if name not in shapes:
            raise KeyError(
                f"LoRA target {name!r} has no 2-D kernel in the param tree "
                f"(quantized towers pack weights as q_kernel and do not "
                f"support LoRA); available: {sorted(shapes)[:8]}...")
        d_in, d_out = shapes[name]
        lora[name] = {
            "A": init_a(jax.random.fold_in(rng, i), (d_in, rank),
                        jnp.float32),
            "B": jnp.zeros((rank, d_out), jnp.float32),
        }
    return lora


def merge_lora(params, lora: LoraTree, alpha: float):
    """Return ``params`` with ``kernel += (alpha/r) * A @ B`` at every
    adapter site. Pure and differentiable w.r.t. both inputs; preserves the
    tree structure (incl. ``nn.Partitioned`` boxes) and leaf dtypes, so the
    result drops into any ``module.apply`` that accepted ``params``."""
    if not lora:
        return params
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    seen = set()
    leaves = []
    for path, leaf in flat:
        keys, ki = _path_name(path)
        if ki >= 0:
            name = _layer_name(keys, ki)
            ab = lora.get(name)
            if ab is not None:
                r = ab["A"].shape[1]
                delta = (alpha / r) * (ab["A"] @ ab["B"])
                leaf = leaf + delta.astype(leaf.dtype)
                seen.add(name)
        leaves.append(leaf)
    missing = set(lora) - seen
    if missing:
        raise KeyError(f"LoRA adapters without a matching kernel in the "
                       f"param tree: {sorted(missing)}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def lora_spec(cfg: dict) -> dict:
    """Normalize a config ``lora:`` block: returns {} when disabled, else
    {rank, alpha, last_k, attn_only, lr (optional)} with defaults."""
    cfg = cfg or {}
    if not cfg.get("enabled"):
        return {}
    return {
        "rank": int(cfg.get("rank", 8)),
        "alpha": float(cfg.get("alpha", 16.0)),
        "last_k": int(cfg.get("last_k", 2)),
        "attn_only": bool(cfg.get("attn_only", True)),
        "lr": cfg.get("lr"),
    }


# ------------------- trainer wiring (shared by both trainers) -------------------

def resolve_lora(mcfg: dict, backbone, seed: int):
    """Parse ``mcfg['lora']`` and initialize adapters against ``backbone``.

    Returns ``(spec, lora_params)`` — ``({}, None)`` when LoRA is disabled.
    Single home for the enable/enumerate/init sequence so SingleTask and
    MultiTask trainers cannot drift."""
    spec = lora_spec(mcfg.get("lora"))
    if not spec:
        return {}, None
    # Quantized towers raise inside get_lora_target_names with their own
    # message; an empty result here therefore means the selection strategy
    # matched nothing (e.g. last_k: 0).
    targets = backbone.get_lora_target_names(
        {"last_k": spec["last_k"], "attn_only": spec["attn_only"]})
    if not targets:
        raise ValueError(
            f"lora.enabled but the target selection matched no layers — "
            f"check lora.last_k (={spec['last_k']}) and lora.attn_only "
            f"(={spec['attn_only']}) against the tower's layer count")
    params = init_lora(backbone.params, targets, spec["rank"],
                       jax.random.fold_in(jax.random.key(seed), 7))
    print(f"[LoRA] enabled: rank {spec['rank']}, "
          f"alpha {spec['alpha']}, {len(targets)} target layers")
    return spec, params


def lora_transform(spec: dict, lora_params, head_lr: float,
                   lr_scale: float, weight_decay: float):
    """``(label_tree, optax transform)`` for the adapter leaves.

    An explicit ``lora.lr: 0.0`` is honored (frozen-adapter ablation);
    only a *missing* lr falls back to the head LR."""
    import optax
    lr = spec["lr"] if spec.get("lr") is not None else head_lr
    labels = jax.tree_util.tree_map(lambda _: "lora", lora_params)
    return labels, optax.adamw(float(lr) * lr_scale,
                               weight_decay=weight_decay)


def features_with_lora(backbone, pooling: str, spec: dict):
    """Feature-extraction closure over a params dict ``{"backbone": ...,
    ["lora": ...]}`` that merges adapters (when enabled) before the
    encoder forward. Differentiable through the merge."""
    alpha = spec.get("alpha") if spec else None

    def feats(params, pixels):
        bp = params["backbone"]
        if alpha is not None:
            bp = merge_lora(bp, params["lora"], alpha)
        return backbone._features(bp, pixels, pooling)

    return feats
