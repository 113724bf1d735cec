"""Single-task probe trainer.

Behavioral mirror of `/root/reference/probing/train/singletask_trainer.py`:

- balancing via class-weighted CE only (``ignore_index=-1`` semantics);
- **feature cache** when the backbone is fully frozen: the dataset is pushed
  once through the jitted encoder ([N, D] saved to
  ``probing/linear_probing/features/<model>_<quant>_<task>/<split>_features.npz``),
  then only the head trains on cached features — HOT LOOP 1 then HOT LOOP 2
  of SURVEY.md §3.2;
- end-to-end fallback with separate head/backbone learning rates when layers
  are unfrozen (optax ``multi_transform`` over a labels pytree instead of
  torch param groups).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core.config import project_root
from ...data.augment import train_augmentation
from ...data.dataset_factory import DatasetFactory
from ...models.factory import VLMModelFactory
from ..probes import LinearProbe
from .base_trainer import BaseTrainer
from .data import ArrayBatchLoader, ImageBatchLoader
from .utils import (counts_to_weights, get_num_classes_for_task,
                    masked_cross_entropy, targets_to_arrays)


class SingleTaskTrainer(BaseTrainer):
    def __init__(self, cfg: dict, run_name: str, ckpt_root: Path):
        self.task = str(cfg["task"]).lower()
        self.use_feature_cache = False
        self.features_dir: Optional[Path] = None
        super().__init__(cfg, run_name, ckpt_root)

    # ------------ probe ------------
    def build_probe(self):
        mcfg = self.cfg["model"]
        bb_cfg = (mcfg.get("backbone") or {})
        freeze_flag = bool(bb_cfg.get("freeze", True))
        unfreeze_k = int(bb_cfg.get("unfreeze_last_k", 0))

        # Resolve the env fallback HERE and write it back so the
        # head_config.yaml snapshot (written after build_probe) records the
        # tower the features/head were actually trained with — a tester in
        # a different shell must not rebuild a different one.
        from ...models.base_model import resolve_quantize_vision
        mcfg["quantize_vision"] = resolve_quantize_vision(
            mcfg.get("quantize_vision"))
        vlm = VLMModelFactory.create_model(
            mcfg["name"], model_id=mcfg.get("model_id"),
            quantization=mcfg.get("quantization"),
            size=mcfg.get("size"), mesh=self.cfg.get("mesh"),
            quantize_vision=mcfg["quantize_vision"])
        backbone = vlm.get_vision_backbone()
        self.mesh = backbone.mesh
        del vlm

        self.probe = LinearProbe(
            backbone=backbone,
            n_out_classes=get_num_classes_for_task(self.task),
            freeze_backbone=freeze_flag,
            dropout_p=float(mcfg.get("dropout_p", 0.3)),
            deeper_head=bool(mcfg.get("deeper_head", False)),
            hidden_dim=int(mcfg.get("hidden_dim", 512)),
            rng=jax.random.key(self.seed))

        if freeze_flag and unfreeze_k > 0:
            self.probe.unfreeze_last_backbone_k_layers(
                k=unfreeze_k,
                parts=str(bb_cfg.get("unfreeze_parts", "all")),
                include_embeddings=bool(bb_cfg.get("include_embeddings",
                                                   True)))

        # LoRA mode: frozen base + low-rank adapters on the last-k blocks
        # (the training loop the reference's get_lora_target_names surface
        # implies but never implements — see vlm_tpu/probing/lora.py).
        from ..lora import resolve_lora
        self.lora_spec, self.lora_params = resolve_lora(
            mcfg, backbone, self.seed)

    # ------------ data ------------
    def build_data(self):
        dcfg = self.cfg["data"]
        base_path = dcfg.get("base_path", None)
        batch_size = int(dcfg.get("batch_size", 64))
        use_augmentation = bool(dcfg.get("use_augmentation", False))
        nclasses = {self.task: get_num_classes_for_task(self.task)}

        transform = train_augmentation(self.seed) if use_augmentation else None
        train_ds, agg_counts = DatasetFactory.create_multi_task_dataset(
            tasks=[self.task], split="train", base_path=base_path,
            transform=transform, num_classes=nclasses)
        val_ds, _ = DatasetFactory.create_multi_task_dataset(
            tasks=[self.task], split="val", base_path=base_path,
            transform=None, num_classes=nclasses)

        counts = agg_counts.get(self.task) if isinstance(agg_counts, dict) \
            else None
        if counts is None:
            w = np.ones(get_num_classes_for_task(self.task), dtype=np.float64)
        else:
            w = counts_to_weights(np.asarray(counts, dtype=np.float64))
        self.class_weights = jnp.asarray(w, jnp.float32)
        print(f"Class weights: {np.asarray(w)}")

        fully_frozen = self.probe.fully_frozen
        # LoRA changes the features during training, so the frozen-backbone
        # feature cache cannot apply even though the base params are frozen.
        self.use_feature_cache = fully_frozen and not self.lora_spec
        print(f"[Trainer] Feature cache for probing: "
              f"{'ENABLED' if self.use_feature_cache else 'DISABLED'} "
              f"(backbone fully frozen: {fully_frozen})")

        if self.use_feature_cache:
            mcfg = self.cfg["model"]
            # Reference cache path scheme (singletask_trainer.py:119-121);
            # non-default model sizes get their own cache dir so a "test"
            # run can never poison a full-size run with wrong-dim features.
            size_tag = f"_{mcfg['size']}" if mcfg.get("size") else ""
            # Quantized-tower features differ numerically from fp-tower
            # features at the same dim — they must never share a cache dir.
            vq_tag = "_vq" if mcfg.get("quantize_vision") else ""
            self.features_dir = (project_root() / "probing" /
                                 "linear_probing" / "features" /
                                 f"{mcfg['name']}_{mcfg.get('quantization')}_"
                                 f"{self.task}{size_tag}{vq_tag}")
            self.features_dir.mkdir(parents=True, exist_ok=True)
            xtr, ytr = self._ensure_features(train_ds, "train")
            xva, yva = self._ensure_features(val_ds, "val")
            self.train_loader = ArrayBatchLoader(
                xtr, ytr, batch_size, shuffle=True, seed=self.seed)
            self.val_loader = ArrayBatchLoader(xva, yva, batch_size)
        else:
            self.train_loader = ImageBatchLoader(
                train_ds, batch_size, shuffle=True, seed=self.seed)
            self.val_loader = ImageBatchLoader(val_ds, batch_size)

    def _ensure_features(self, img_ds, split: str):
        """Feature-cache loading/extraction with the reference's tolerant
        key schema x|features|feats / y|labels
        (reference: singletask_trainer.py:219-285)."""
        fpath = self.features_dir / f"{split}_features.npz"
        if fpath.exists():
            blob = np.load(fpath)
            x_key = next((k for k in ("x", "features", "feats")
                          if k in blob), None)
            y_key = next((k for k in ("y", "labels") if k in blob), None)
            if x_key is None or y_key is None:
                raise KeyError(
                    f"Unrecognized feature cache keys: {list(blob.keys())}")
            feats = blob[x_key]
            if feats.shape[-1] != self.probe.backbone.output_dim:
                raise ValueError(
                    f"stale feature cache {fpath}: dim {feats.shape[-1]} != "
                    f"backbone dim {self.probe.backbone.output_dim} — "
                    f"delete it to re-extract")
            return feats, blob[y_key].astype(np.int64)
        has_transform = any(getattr(d, "transform", None) is not None
                            for d in getattr(img_ds, "datasets", [img_ds]))
        if has_transform:
            # Augmented datasets must extract through __getitem__ so the
            # (one-shot) transform is baked into the cached features, like
            # the reference's DataLoader-based extraction
            # (singletask_trainer.py:252-270).
            feats_list = []
            bs = self.probe.backbone.batch_size
            for start in range(0, len(img_ds), bs):
                images = [img_ds[i][0]
                          for i in range(start, min(start + bs, len(img_ds)))]
                n = len(images)
                if n < bs:
                    images = images + [images[-1]] * (bs - n)
                feats_list.append(np.asarray(
                    self.probe.backbone.forward(images)[:n], np.float32))
            feats = np.concatenate(feats_list, axis=0)
        else:
            feats = self.probe.backbone.extract_features_dataset(
                img_ds.image_paths())
        ys = targets_to_arrays(img_ds.labels_list(), [self.task])[self.task]
        np.savez(fpath, x=feats, y=ys)
        return feats, ys

    # ------------ optimizer ------------
    def build_optimizer(self):
        tcfg = self.cfg.get("train", {})
        self.head_lr = float(tcfg.get("lr", 1e-4))
        self.backbone_lr = float(tcfg.get("backbone_lr", self.head_lr))
        self.weight_decay = float(tcfg.get("weight_decay", 1e-4))
        self._build_tx_and_steps()

    def _build_tx_and_steps(self):
        if self.use_feature_cache:
            self.tx = optax.adamw(self.head_lr * self.lr_scale,
                                  weight_decay=self.weight_decay)
            self._opt_state = self.tx.init(
                self.probe.head_state["params"])
            self._make_cached_steps()
        else:
            labels = {
                "head": jax.tree.map(lambda _: "head",
                                     self.probe.head_state["params"]),
                "backbone": jax.tree.map(
                    lambda m: "backbone" if m else "frozen",
                    self.probe.backbone.trainable_mask),
            }
            txs = {"head": optax.adamw(self.head_lr * self.lr_scale,
                                       weight_decay=self.weight_decay),
                   "backbone": optax.adamw(self.backbone_lr * self.lr_scale,
                                           weight_decay=self.weight_decay),
                   "frozen": optax.set_to_zero()}
            if self.lora_spec:
                from ..lora import lora_transform
                labels["lora"], txs["lora"] = lora_transform(
                    self.lora_spec, self.lora_params, self.head_lr,
                    self.lr_scale, self.weight_decay)
            self.tx = optax.multi_transform(txs, labels)
            self._opt_state = self.tx.init(self._e2e_params())
            self._make_e2e_steps()

    def _e2e_params(self):
        p = {"head": self.probe.head_state["params"],
             "backbone": self.probe.backbone.params}
        if self.lora_spec:
            p["lora"] = self.lora_params
        return p

    def on_lr_change(self):
        # AdamW state is LR-independent; rebuild the transformation with the
        # new scale and keep the optimizer state (structure is identical).
        opt_state = self._opt_state
        self._build_tx_and_steps()
        self._opt_state = opt_state

    # ------------ jitted steps ------------
    def _make_cached_steps(self):
        clf = self.probe.classifier
        cw = self.class_weights
        tx = self.tx

        def loss_fn(params, batch_stats, x, y, rng):
            logits, mut = clf.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return masked_cross_entropy(logits, y, cw), mut["batch_stats"]

        @jax.jit
        def train_step(params, batch_stats, opt_state, x, y, rng):
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats, x, y, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss

        @jax.jit
        def eval_step(params, batch_stats, x, y):
            logits = clf.apply({"params": params,
                                "batch_stats": batch_stats}, x, train=False)
            return masked_cross_entropy(logits, y, cw)

        self._train_step = train_step
        self._eval_step = eval_step

    def _make_e2e_steps(self):
        probe = self.probe
        clf = probe.classifier
        cw = self.class_weights
        tx = self.tx
        from ..lora import features_with_lora
        backbone_feats = features_with_lora(
            probe.backbone, probe.backbone.cfg.backbone_pooling,
            self.lora_spec)

        def loss_fn(params, batch_stats, pixels, y, rng):
            feats = backbone_feats(params, pixels)
            logits, mut = clf.apply(
                {"params": params["head"], "batch_stats": batch_stats},
                feats, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return masked_cross_entropy(logits, y, cw), mut["batch_stats"]

        @jax.jit
        def train_step(params, batch_stats, opt_state, pixels, y, rng):
            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats, pixels, y, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss

        @jax.jit
        def eval_step(params, batch_stats, pixels, y):
            feats = backbone_feats(params, pixels)
            logits = clf.apply({"params": params["head"],
                                "batch_stats": batch_stats}, feats,
                               train=False)
            return masked_cross_entropy(logits, y, cw)

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------ per-batch ------------
    def _next_rng(self):
        self._rng_counter = getattr(self, "_rng_counter", 0) + 1
        return jax.random.fold_in(jax.random.key(self.seed),
                                  self._rng_counter)

    def train_batch(self, batch) -> Dict[str, float]:
        from ...core.mesh import maybe_mesh
        from ...parallel.sharding import shard_batch_if_divisible
        if self.use_feature_cache:
            x, y = batch
            x, y = shard_batch_if_divisible(
                (jnp.asarray(x), jnp.asarray(y)), self.mesh)
            params = self.probe.head_state["params"]
            bs = self.probe.head_state["batch_stats"]
            with maybe_mesh(self.mesh):
                params, bs, self._opt_state, loss = self._train_step(
                    params, bs, self._opt_state, x, y, self._next_rng())
            self.probe.head_state = {"params": params, "batch_stats": bs}
            return {self.task: float(loss)}
        images, targets = batch
        y = targets_to_arrays(targets, [self.task])[self.task]
        pixels = self.probe.backbone._to_pixels(images)
        pixels, y = shard_batch_if_divisible(
            (pixels, jnp.asarray(y)), self.mesh)
        params = self._e2e_params()
        bs = self.probe.head_state["batch_stats"]
        with maybe_mesh(self.mesh):
            params, bs, self._opt_state, loss = self._train_step(
                params, bs, self._opt_state, pixels, y, self._next_rng())
        self.probe.head_state = {"params": params["head"], "batch_stats": bs}
        self.probe.backbone.params = params["backbone"]
        if self.lora_spec:
            self.lora_params = params["lora"]
        return {self.task: float(loss)}

    def eval_batch(self, batch) -> Dict[str, float]:
        from ...core.mesh import maybe_mesh
        from ...parallel.sharding import shard_batch_if_divisible
        if self.use_feature_cache:
            x, y = batch
            x, y = shard_batch_if_divisible(
                (jnp.asarray(x), jnp.asarray(y)), self.mesh)
            with maybe_mesh(self.mesh):
                loss = self._eval_step(self.probe.head_state["params"],
                                       self.probe.head_state["batch_stats"],
                                       x, y)
            return {self.task: float(loss)}
        images, targets = batch
        y = targets_to_arrays(targets, [self.task])[self.task]
        pixels = self.probe.backbone._to_pixels(images)
        pixels, y = shard_batch_if_divisible(
            (pixels, jnp.asarray(y)), self.mesh)
        params = self._e2e_params()
        with maybe_mesh(self.mesh):
            loss = self._eval_step(params,
                                   self.probe.head_state["batch_stats"],
                                   pixels, y)
        return {self.task: float(loss)}

    # ------------ state handles ------------
    def model_state(self) -> dict:
        state = {"head": jax.tree.map(np.asarray, self.probe.head_state)}
        # A fully-frozen backbone (e.g. LoRA runs) is byte-identical to its
        # init and reconstructible from model_id/seed — serializing the
        # 300M-param tower into every checkpoint would only cost transfer
        # and disk (the testers tolerate a blob without "backbone").
        if not self.use_feature_cache and not self.probe.fully_frozen:
            state["backbone"] = jax.tree.map(
                np.asarray, self.probe.backbone.params)
        if self.lora_spec:
            state["lora"] = jax.tree.map(np.asarray, self.lora_params)
        return state

    def load_model_state(self, blob: dict):
        from flax import serialization
        model = blob.get("model", blob)
        if "head" in model:
            self.probe.head_state = serialization.from_state_dict(
                self.probe.head_state, model["head"])
        if "backbone" in model and not self.use_feature_cache:
            self.probe.backbone.params = serialization.from_state_dict(
                self.probe.backbone.params, model["backbone"])
        if "lora" in model and self.lora_spec:
            self.lora_params = serialization.from_state_dict(
                self.lora_params, model["lora"])

    def opt_state_handle(self):
        return self._opt_state

    def set_opt_state(self, opt_state):
        self._opt_state = opt_state

    def run_meta(self) -> dict:
        meta = super().run_meta()
        mcfg = self.cfg["model"]
        bb_cfg = (mcfg.get("backbone") or {})
        meta.update({
            "trainer": "single_task",
            "task": self.task,
            "feature_cache": bool(self.use_feature_cache),
            "sampler": "none",
            "backbone": {
                "freeze": bool(bb_cfg.get("freeze",
                                          mcfg.get("freeze_backbone", True))),
                "unfreeze_last_k": int(bb_cfg.get("unfreeze_last_k", 0)),
                "unfreeze_parts": str(bb_cfg.get("unfreeze_parts", "all")),
                "include_embeddings": bool(bb_cfg.get("include_embeddings",
                                                      True)),
            },
        })
        return meta
