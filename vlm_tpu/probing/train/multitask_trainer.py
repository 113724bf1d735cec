"""Multi-task probe trainer.

Behavioral mirror of `/root/reference/probing/train/multitask_trainer.py`:

- balanced training dataset — the reference hard-codes
  ``desired_fractions={"emotion": 0.33}`` (multitask_trainer.py:117-124);
- per-task masked CE over valid labels, zero-with-grad when none;
- either class-weighted CE, or unweighted CE + per-sample weighted sampler
  (``use_sampler``);
- **dynamic task weights** = inverse loss-EMA normalized to mean 1,
  recomputed each epoch; the EMA updates per batch (only on batches with
  valid labels and finite loss) and persists inside the model checkpoint
  blob (multitask_trainer.py:209-282).

The per-step compute (backbone forward + all heads + weighted reduction)
runs as one jitted function; the epoch-level task weights enter as a traced
array so reweighting never recompiles.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data.augment import train_augmentation
from ...data.dataset_factory import DatasetFactory
from ...models.factory import VLMModelFactory
from ..probes import MultiTaskProbe
from .base_trainer import BaseTrainer
from .data import ImageBatchLoader
from .losses import RunningMeans
from .utils import (build_weighted_sampler, counts_to_weights,
                    get_num_classes_for_task, masked_cross_entropy,
                    targets_to_arrays)


class MultiTaskTrainer(BaseTrainer):
    def __init__(self, cfg: dict, run_name: str, ckpt_root: Path):
        self.tasks = [t.lower() for t in cfg["tasks"]]
        tcfg = cfg["train"]
        rm_cfg = (tcfg.get("running_means") or {})
        self.use_running_means = bool(rm_cfg.get("enabled", True))
        self.rm_alpha = float(rm_cfg.get("alpha", 0.95))
        tw_cfg = (tcfg.get("task_weights") or {})
        self.static_task_weights = {t: float(tw_cfg.get(t, 1.0))
                                    for t in self.tasks}
        self.current_task_weights = {t: 1.0 for t in self.tasks}
        # Homoscedastic uncertainty weighting: the reference ships the
        # UncertaintyWeighter and tags run names with "_uw"
        # (scripts/train_probe.py:54-56) but never wires it into a trainer;
        # here `train.uncertainty_weighting.enabled` makes it a working
        # alternative to the EMA scheme (learnable log-vars optimized with
        # the heads).
        uw_cfg = (tcfg.get("uncertainty_weighting") or {})
        self.use_uw = bool(uw_cfg.get("enabled", False))
        self.uw_init_log_var = float(uw_cfg.get("init_log_var", 0.0))
        super().__init__(cfg, run_name, ckpt_root)
        if self.use_running_means:
            self.rm = RunningMeans(self.tasks, alpha=self.rm_alpha)

    # ------------ probe ------------
    def build_probe(self):
        mcfg = self.cfg["model"]
        bb_cfg = (mcfg.get("backbone") or {})
        freeze_flag = bool(bb_cfg.get("freeze", True))
        unfreeze_k = int(bb_cfg.get("unfreeze_last_k", 0))

        # Resolve the env fallback and write it back so the head_config.yaml
        # snapshot records the tower actually trained with (see
        # SingleTaskTrainer.build_probe).
        from ...models.base_model import resolve_quantize_vision
        mcfg["quantize_vision"] = resolve_quantize_vision(
            mcfg.get("quantize_vision"))
        vlm = VLMModelFactory.create_model(
            mcfg["name"], model_id=mcfg.get("model_id"),
            quantization=mcfg.get("quantization"), size=mcfg.get("size"),
            mesh=self.cfg.get("mesh"),
            quantize_vision=mcfg["quantize_vision"])
        backbone = vlm.get_vision_backbone()
        self.mesh = backbone.mesh
        del vlm

        tasks_nclasses = {t: get_num_classes_for_task(t) for t in self.tasks}
        self.probe = MultiTaskProbe(
            backbone=backbone,
            tasks=tasks_nclasses,
            freeze_backbone=freeze_flag,
            dropout_p=float(mcfg.get("dropout_p", 0.3)),
            deeper_heads=bool(mcfg.get("deeper_head", False)),
            hidden_dim=int(mcfg.get("hidden_dim", 512)),
            rng=jax.random.key(self.seed))

        if freeze_flag and unfreeze_k > 0:
            self.probe.unfreeze_last_backbone_k_layers(
                k=unfreeze_k,
                parts=str(bb_cfg.get("unfreeze_parts", "all")),
                include_embeddings=bool(bb_cfg.get("include_embeddings",
                                                   True)))

        # LoRA adapters (same surface as SingleTaskTrainer; see lora.py).
        from ..lora import resolve_lora
        self.lora_spec, self.lora_params = resolve_lora(
            mcfg, backbone, self.seed)

    # ------------ data ------------
    def build_data(self):
        dcfg = self.cfg["data"]
        base_path = dcfg.get("base_path", None)
        batch_size = int(dcfg.get("batch_size", 64))
        use_augmentation = bool(dcfg.get("use_augmentation", True))
        self.use_sampler = bool(dcfg.get("use_sampler", True))
        tasks_nclasses = {t: get_num_classes_for_task(t) for t in self.tasks}

        transform = train_augmentation(self.seed) if use_augmentation else None

        desired = {"emotion": 0.33}
        train_ds, agg_counts = \
            DatasetFactory.create_balanced_multi_task_dataset(
                tasks=self.tasks, split="train", base_path=base_path,
                transform=transform, num_classes=tasks_nclasses,
                desired_fractions=desired, random_seed=self.seed)
        val_ds, _ = DatasetFactory.create_multi_task_dataset(
            tasks=self.tasks, split="val", base_path=base_path,
            transform=None, num_classes=tasks_nclasses)

        self.class_weights = {}
        for t in self.tasks:
            counts = agg_counts.get(t) if isinstance(agg_counts, dict) \
                else None
            if counts is None:
                w = np.ones(get_num_classes_for_task(t), dtype=np.float64)
            else:
                w = counts_to_weights(np.asarray(counts, dtype=np.float64))
            self.class_weights[t] = jnp.asarray(w, jnp.float32)
        print(f"Class weights: "
              f"{ {t: np.asarray(w) for t, w in self.class_weights.items()} }")

        sampler = None
        if self.use_sampler:
            # Balancing lives in the sampler; CE goes unweighted.
            self.ce_weights = {t: None for t in self.tasks}
            sampler, _ = build_weighted_sampler(
                train_ds,
                {t: np.asarray(self.class_weights[t]) for t in self.tasks},
                combine="mean", min_weight=1e-4, normalize=True,
                replacement=True, seed=self.seed)
        else:
            self.ce_weights = dict(self.class_weights)

        self.train_loader = ImageBatchLoader(
            train_ds, batch_size, shuffle=(sampler is None),
            sampler=sampler, seed=self.seed)
        self.val_loader = ImageBatchLoader(val_ds, batch_size)

    # ------------ optimizer ------------
    def build_optimizer(self):
        tcfg = self.cfg["train"]
        self.head_lr = float(tcfg.get("lr", 1e-4))
        self.backbone_lr = float(tcfg.get("backbone_lr", self.head_lr))
        self.weight_decay = float(tcfg.get("weight_decay", 1e-4))
        self._build_tx_and_steps()

    def _head_params(self):
        return {t: s["params"] for t, s in self.probe.head_state.items()}

    def _head_stats(self):
        return {t: s["batch_stats"] for t, s in self.probe.head_state.items()}

    def _params(self):
        p = {"heads": self._head_params(),
             "backbone": self.probe.backbone.params}
        if self.use_uw:
            p["log_vars"] = self._log_vars
        if self.lora_spec:
            p["lora"] = self.lora_params
        return p

    def _build_tx_and_steps(self):
        if self.use_uw and not hasattr(self, "_log_vars"):
            from .losses import UncertaintyWeighter
            self._log_vars = UncertaintyWeighter(
                self.tasks, self.uw_init_log_var).init_params()
        labels = {
            "heads": jax.tree.map(lambda _: "head", self._head_params()),
            "backbone": jax.tree.map(
                lambda m: "backbone" if m else "frozen",
                self.probe.backbone.trainable_mask),
        }
        if self.use_uw:
            labels["log_vars"] = {t: "head" for t in self.tasks}
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
        self._opt_state = self.tx.init(self._params())
        self._make_steps()

    def on_lr_change(self):
        opt_state = self._opt_state
        self._build_tx_and_steps()
        self._opt_state = opt_state

    def _make_steps(self):
        probe = self.probe
        tasks = self.tasks
        tx = self.tx
        ce_weights = self.ce_weights
        from ..lora import features_with_lora
        backbone_feats = features_with_lora(
            probe.backbone, probe.backbone.cfg.backbone_pooling,
            self.lora_spec)

        def losses_fn(params, stats, pixels, ys, rng):
            feats = backbone_feats(params, pixels)
            losses = {}
            new_stats = {}
            for i, t in enumerate(tasks):
                mod = probe.classifiers[t]
                logits, mut = mod.apply(
                    {"params": params["heads"][t], "batch_stats": stats[t]},
                    feats, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(rng, i)})
                losses[t] = masked_cross_entropy(logits, ys[t],
                                                 ce_weights[t])
                new_stats[t] = mut["batch_stats"]
            return losses, new_stats

        use_uw = self.use_uw

        def total_fn(params, stats, pixels, ys, rng, task_w):
            losses, new_stats = losses_fn(params, stats, pixels, ys, rng)
            if use_uw:
                from .losses import UncertaintyWeighter
                total = UncertaintyWeighter.combine(params["log_vars"],
                                                    losses)
            else:
                total = 0.0
                for i, t in enumerate(tasks):
                    total = total + task_w[i] * losses[t]
            return total, (losses, new_stats)

        @jax.jit
        def train_step(params, stats, opt_state, pixels, ys, rng, task_w):
            (_, (losses, new_stats)), grads = jax.value_and_grad(
                total_fn, has_aux=True)(params, stats, pixels, ys, rng,
                                        task_w)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, losses

        @jax.jit
        def eval_step(params, stats, pixels, ys):
            feats = backbone_feats(params, pixels)
            losses = {}
            for t in tasks:
                logits = probe.classifiers[t].apply(
                    {"params": params["heads"][t], "batch_stats": stats[t]},
                    feats, train=False)
                losses[t] = masked_cross_entropy(logits, ys[t],
                                                 ce_weights[t])
            return losses

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------ dynamic task weights ------------
    def _compute_task_weights(self) -> Dict[str, float]:
        """Inverse EMA, normalized to mean 1; static fallback while the EMA
        is uninitialized (reference: multitask_trainer.py:209-225)."""
        if not self.use_running_means or self.rm is None:
            return dict(self.static_task_weights)
        raw = []
        for idx, t in enumerate(self.tasks):
            m = self.rm.get_by_index(idx)
            if m is None:
                # EMA not initialized for this task yet (epoch 1): fall back
                # to the user's static weight DIRECTLY — inverting it here
                # would down-weight exactly the tasks the user up-weighted.
                raw.append(self.static_task_weights.get(t, 1.0))
            else:
                raw.append(1.0 / max(float(m), 1e-8))
        avg = sum(raw) / max(1, len(raw))
        return {t: raw[i] / avg for i, t in enumerate(self.tasks)}

    def on_train_epoch_start(self, epoch: int, epochs: int):
        self.current_task_weights = self._compute_task_weights()
        print(f"[Weights][Epoch {epoch + 1}] " + " | ".join(
            f"{k}={v:.3f}" for k, v in self.current_task_weights.items()))

    def after_train_batch(self, loss_dict: Dict[str, float], batch):
        """Per-batch EMA update on tasks with valid labels and finite loss
        (reference: multitask_trainer.py:248-263)."""
        if not (self.use_running_means and self.rm is not None):
            return
        from .data import Batch
        counts = batch.valid_counts(self.tasks) if isinstance(batch, Batch) \
            else {}
        for idx, t in enumerate(self.tasks):
            if counts.get(t, 0) > 0 and np.isfinite(loss_dict[t]):
                self.rm.update_by_idx(float(loss_dict[t]), idx)

    # ------------ per-batch ------------
    def _next_rng(self):
        self._rng_counter = getattr(self, "_rng_counter", 0) + 1
        return jax.random.fold_in(jax.random.key(self.seed),
                                  self._rng_counter)

    def train_batch(self, batch) -> Dict[str, float]:
        from ...core.mesh import maybe_mesh
        from ...parallel.sharding import shard_batch_if_divisible
        images, targets = batch
        ys_np = targets_to_arrays(targets, self.tasks)
        ys = {t: jnp.asarray(v) for t, v in ys_np.items()}
        pixels = self.probe.backbone._to_pixels(images)
        pixels, ys = shard_batch_if_divisible((pixels, ys), self.mesh)
        task_w = jnp.asarray([self.current_task_weights[t]
                              for t in self.tasks], jnp.float32)
        with maybe_mesh(self.mesh):
            params, new_stats, self._opt_state, losses = self._train_step(
                self._params(), self._head_stats(), self._opt_state, pixels,
                ys, self._next_rng(), task_w)
        self.probe.head_state = {
            t: {"params": params["heads"][t], "batch_stats": new_stats[t]}
            for t in self.tasks}
        self.probe.backbone.params = params["backbone"]
        if self.use_uw:
            self._log_vars = params["log_vars"]
        if self.lora_spec:
            self.lora_params = params["lora"]
        return {t: float(losses[t]) for t in self.tasks}

    def eval_batch(self, batch) -> Dict[str, float]:
        from ...core.mesh import maybe_mesh
        from ...parallel.sharding import shard_batch_if_divisible
        images, targets = batch
        ys = {t: jnp.asarray(v) for t, v in
              targets_to_arrays(targets, self.tasks).items()}
        pixels = self.probe.backbone._to_pixels(images)
        pixels, ys = shard_batch_if_divisible((pixels, ys), self.mesh)
        with maybe_mesh(self.mesh):
            losses = self._eval_step(self._params(), self._head_stats(),
                                     pixels, ys)
        return {t: float(losses[t]) for t in self.tasks}

    # ------------ state ------------
    def model_state(self) -> dict:
        state = {"heads": jax.tree.map(np.asarray, self.probe.head_state)}
        # Skip the tower when provably frozen (LoRA / frozen runs) — it is
        # byte-identical to init and reconstructible from model_id/seed;
        # the testers tolerate a blob without "backbone".
        if not self.probe.fully_frozen:
            state["backbone"] = jax.tree.map(np.asarray,
                                             self.probe.backbone.params)
        if self.lora_spec:
            state["lora"] = jax.tree.map(np.asarray, self.lora_params)
        return state

    def load_model_state(self, blob: dict):
        from flax import serialization
        model = blob.get("model", blob)
        if "heads" in model:
            self.probe.head_state = serialization.from_state_dict(
                self.probe.head_state, model["heads"])
        if "backbone" in model:
            self.probe.backbone.params = serialization.from_state_dict(
                self.probe.backbone.params, model["backbone"])
        if "lora" in model and self.lora_spec:
            self.lora_params = serialization.from_state_dict(
                self.lora_params, model["lora"])

    def extra_state_dicts(self) -> dict:
        blob = {}
        if getattr(self, "rm", None) is not None:
            blob["running_means"] = {
                "alpha": self.rm.alpha,
                "values": self.rm.values,
                "history": self.rm.history,
                "tasks": self.tasks,
            }
        if self.use_uw:
            blob["uw_log_vars"] = {t: float(v)
                                   for t, v in self._log_vars.items()}
        return blob

    def load_extra_state_dicts(self, blob: dict):
        rm_blob = blob.get("running_means")
        if getattr(self, "rm", None) is not None and rm_blob:
            self.rm.alpha = float(rm_blob.get("alpha", self.rm.alpha))
            self.rm.values = dict(rm_blob.get("values", self.rm.values))
            self.rm.history = dict(rm_blob.get("history", self.rm.history))
        uw_blob = blob.get("uw_log_vars")
        if self.use_uw and uw_blob:
            self._log_vars = {t: jnp.asarray(float(v), jnp.float32)
                              for t, v in uw_blob.items()}

    def opt_state_handle(self):
        return self._opt_state

    def set_opt_state(self, opt_state):
        self._opt_state = opt_state

    def run_meta(self) -> dict:
        meta = super().run_meta()
        mcfg = self.cfg["model"]
        bb_cfg = (mcfg.get("backbone") or {})
        meta.update({
            "trainer": "multi_task",
            "tasks": self.tasks,
            "running_means": bool(self.rm is not None),
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
