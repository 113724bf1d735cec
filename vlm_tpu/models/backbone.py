"""Vision backbone adapter for probing: batched jitted feature extraction and
pytree-mask freeze/unfreeze.

Mirrors the reference's ``VisionBackbone`` contract
(`/root/reference/models/vision_backbone.py:6-66`): ``forward(images) → [B,D]``
with per-family pooling, ``unfreeze_last_k_layers(k, parts,
include_embeddings)``, and ``get_lora_target_names``.

TPU-first differences:

- ``forward`` takes a batch (list of PIL images or a pre-normalized device
  array) and runs one jitted encoder call — not per-image processor work;
- freeze/unfreeze is expressed as a **boolean pytree mask** over the params
  (the optax ``multi_transform`` idiom) instead of mutating
  ``requires_grad`` — the functional equivalent of the reference's
  regex-over-module-names surgery (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import DTypePolicy
from ..ops.preprocess import (PreprocessRecipe, host_batch, normalize_images,
                              recipe_for)
from .configs import VLMConfig
from .vit import ViTEncoder

_EMBED_KEYS = ("patch_embed", "cls_token", "pos_embed", "pre_ln", "post_ln")
_ATTN_KEYS = ("q_proj", "k_proj", "v_proj", "out_proj")
_MLP_KEYS = ("fc1", "fc2")
_NORM_KEYS = ("ln1", "ln2")


def _param_paths(params) -> List[tuple]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path)
            for path, _ in flat]


class VisionBackbone:
    """Feature extractor over a ViT tower with reference-parity pooling."""

    def __init__(self, cfg: VLMConfig, vision_params: Any,
                 policy: DTypePolicy, attn_impl: str = "auto",
                 batch_size: int = 64, mesh=None, quant_bits: int = 0):
        from ..core.mesh import DATA_AXIS, pad_to_multiple
        self.cfg = cfg
        #: optional (data, model) mesh inherited from the parent VLMModel —
        #: feature-extraction batches shard over "data", the tower's kernels
        #: keep the TP sharding they were placed with.
        self.mesh = mesh
        if mesh is not None:
            batch_size = pad_to_multiple(batch_size, mesh.shape[DATA_AXIS])
        self.vit_cfg = cfg.vision
        self.output_dim = cfg.backbone_dim
        self.recipe: PreprocessRecipe = recipe_for(cfg.name)
        if self.recipe.image_size != cfg.vision.image_size:
            import dataclasses as _dc
            self.recipe = _dc.replace(self.recipe,
                                      image_size=cfg.vision.image_size)
        self.policy = policy
        self.batch_size = batch_size
        #: int8/int4 tower (``quantize_vision`` on the parent model) —
        #: feature extraction only; unfreeze/e2e training raises below.
        self.quant_bits = quant_bits
        self.module = ViTEncoder(cfg.vision, dtype=policy.compute_dtype,
                                 param_dtype=jnp.float32,
                                 attn_impl=attn_impl, quant_bits=quant_bits)
        self.params = vision_params
        # All-frozen by default, like LinearProbe(freeze_backbone=True)
        # (reference: probing/models/base_probe.py:77-83).
        self.trainable_mask = jax.tree.map(lambda _: False, vision_params)
        self._jit_features = jax.jit(self._features,
                                     static_argnames=("pooling",))

    # ------------------------- forward -------------------------
    def _features(self, params, pixels: jax.Array,
                  pooling: str) -> jax.Array:
        out = self.module.apply(params, pixels, keep_hidden_states=False)
        if pooling == "pooler":
            return out["pooled"]
        if pooling == "cls":
            return out["last_hidden_state"][:, 0]
        if pooling == "mean":
            return jnp.mean(out["last_hidden_state"], axis=1)
        raise ValueError(f"unsupported pooling strategy {pooling!r}")

    def forward(self, images, strategy: Optional[str] = None) -> jax.Array:
        """images: list of PIL images, uint8 array [B,S,S,3], or normalized
        device array. Returns [B, output_dim].

        ``strategy`` overrides the pooling ("cls"/"mean") like the reference
        LLaVA backbone's argument (llava.py:101).
        """
        from ..core.mesh import DATA_AXIS, maybe_mesh
        pixels = self._to_pixels(images)
        if (self.mesh is not None
                and pixels.shape[0] % self.mesh.shape[DATA_AXIS] == 0):
            from ..parallel.sharding import shard_batch
            pixels = shard_batch(pixels, self.mesh)
        with maybe_mesh(self.mesh):
            return self._jit_features(self.params, pixels,
                                      pooling=strategy or
                                      self.cfg.backbone_pooling)

    __call__ = forward

    def _to_pixels(self, images) -> jax.Array:
        if isinstance(images, (list, tuple)):
            batch = host_batch(images, self.recipe)
            return normalize_images(jnp.asarray(batch), recipe=self.recipe,
                                    compute_dtype=self.policy.compute_dtype)
        arr = jnp.asarray(images)
        if arr.dtype == jnp.uint8:
            return normalize_images(arr, recipe=self.recipe,
                                    compute_dtype=self.policy.compute_dtype)
        return arr.astype(self.policy.compute_dtype)

    def extract_features_dataset(self, image_paths: Sequence,
                                 batch_size: Optional[int] = None,
                                 progress: bool = True) -> np.ndarray:
        """Stream a whole dataset through the encoder → [N, D] numpy
        (the probing feature-cache hot loop, SURVEY.md §3.2 HOT LOOP 1).

        Host decode runs through the native C++ loader (PIL fallback) and is
        prefetched one batch ahead of the device, so decode overlaps TPU
        compute."""
        from ..data.pipeline import prefetch_batches

        bs = batch_size or self.batch_size
        paths = list(image_paths)
        out = []

        def make_batch(chunk):
            from ..data.native_loader import load_batch
            arr = load_batch(chunk, self.recipe)
            n = len(chunk)
            if n < bs:   # pad the tail to the compiled batch size
                arr = np.concatenate(
                    [arr, np.repeat(arr[-1:], bs - n, axis=0)], axis=0)
            return arr, n

        chunks = [paths[i:i + bs] for i in range(0, len(paths), bs)]
        it = prefetch_batches(chunks, make_batch, depth=2)
        if progress:
            try:
                from tqdm import tqdm
                it = tqdm(it, total=len(chunks), desc="Extracting features",
                          unit="batch")
            except ImportError:
                pass
        # Dispatches are async: keep a few batches in flight so the host
        # feature pull (D2H) of batch i-k overlaps the device compute of
        # batch i, instead of a sync per batch serializing transfer with
        # compute (remote-attached chips pay ~40 ms per blocking pull).
        # Results are [bs, D] — a handful in flight costs ~nothing in HBM.
        from collections import deque
        pending: deque = deque()

        def drain_one():
            feats, n = pending.popleft()
            out.append(np.asarray(feats[:n], dtype=np.float32))

        for arr, n in it:
            pending.append((self.forward(arr), n))
            if len(pending) > 3:
                drain_one()
        while pending:
            drain_one()
        return np.concatenate(out, axis=0)

    # ------------------------- freeze / unfreeze -------------------------
    def set_freeze(self, freeze: bool):
        if not freeze and self.quant_bits:
            # Same rationale as the unfreeze_last_k_layers guard: int8/int4
            # q_kernel leaves stop gradients at the dequant, so full-unfreeze
            # would hand integer params to the optimizer and train nothing.
            raise ValueError(
                "cannot unfreeze a quantized vision tower "
                f"(quant_bits={self.quant_bits}); use quantization=fp32/"
                "fp16 or quantize_vision=false for end-to-end training")
        self.trainable_mask = jax.tree.map(lambda _: not freeze, self.params)

    @property
    def fully_frozen(self) -> bool:
        return not any(jax.tree.leaves(self.trainable_mask))

    def _block_index(self, path: tuple) -> Optional[int]:
        for k in path:
            if isinstance(k, str):
                m = re.fullmatch(r"block_(\d+)", k)
                if m:
                    return int(m.group(1))
        return None

    def unfreeze_last_k_layers(self, k: int = 2, parts: str = "all",
                               include_embeddings: bool = True) -> None:
        """Mark the last ``k`` encoder blocks trainable.

        ``parts``: "all" | "attn" | "mlp" — block LayerNorms are always
        included, embeddings/global norms optionally, mirroring
        `/root/reference/models/llava.py:121-186`.
        """
        if self.quant_bits and int(k) > 0:
            # Quantized Dense stops gradients at the dequant — unfreezing
            # would silently train nothing (bitsandbytes int8 layers have
            # the same limitation; the reference would hit it too).
            raise ValueError(
                "cannot unfreeze layers of a quantized vision tower "
                f"(quant_bits={self.quant_bits}); use quantization=fp32/"
                "fp16 or quantize_vision=false for end-to-end training")
        n_layers = self.vit_cfg.layers
        selected = set(range(max(0, n_layers - int(k)), n_layers)) \
            if int(k) > 0 else set()

        def want(path: tuple) -> bool:
            keys = {p for p in path if isinstance(p, str)}
            bi = self._block_index(path)
            if bi is not None and bi in selected:
                if parts == "all":
                    return True
                attn_hit = bool(keys & set(_ATTN_KEYS)) or "attn" in keys
                mlp_hit = bool(keys & set(_MLP_KEYS))
                norm_hit = bool(keys & set(_NORM_KEYS))
                if parts == "attn":
                    return attn_hit or norm_hit
                if parts == "mlp":
                    return mlp_hit or norm_hit
                return False
            if include_embeddings and (keys & set(_EMBED_KEYS)):
                return True
            return False

        flat = jax.tree_util.tree_flatten_with_path(self.trainable_mask)
        leaves, treedef = flat
        new_leaves = []
        for path, val in leaves:
            keys = tuple(getattr(kk, "key", getattr(kk, "idx", None))
                         for kk in path)
            new_leaves.append(val or want(keys))
        self.trainable_mask = jax.tree_util.tree_unflatten(
            treedef, new_leaves)
        print(f"[unfreeze_last_k_layers] unfroze {len(selected)} layers "
              f"(indices: {sorted(selected)})")

    def get_lora_target_names(self, strategy: Dict) -> List[str]:
        """Names of linear-kernel paths in the last K blocks
        (reference: llava.py:189-230)."""
        if self.quant_bits:
            # Quantized Dense packs weights as (q_kernel, scale) — no fp
            # kernel to merge adapters into, so the name scan below would
            # silently return [] and a LoRA run would train nothing.
            raise ValueError(
                "LoRA targets unavailable on a quantized vision tower "
                f"(quant_bits={self.quant_bits}); use quantize_vision="
                "false (the default) for LoRA fine-tuning")
        last_k = int(strategy.get("last_k", 2))
        attn_only = bool(strategy.get("attn_only", True))
        n_layers = self.vit_cfg.layers
        selected = set(range(max(0, n_layers - last_k), n_layers))
        wanted = set(_ATTN_KEYS) if attn_only else \
            set(_ATTN_KEYS) | set(_MLP_KEYS)
        names = []
        for path in _param_paths(self.params):
            # Partitioned params append a trailing component after "kernel".
            keys = [p for p in path if isinstance(p, str)]
            if "kernel" not in keys:
                continue
            bi = self._block_index(tuple(keys))
            if bi is None or bi not in selected:
                continue
            if any(p in wanted for p in keys):
                names.append("/".join(
                    k for k in keys[:keys.index("kernel")]
                    if k != "params"))
        return sorted(set(names))
