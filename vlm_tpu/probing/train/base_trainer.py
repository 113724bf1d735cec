"""Generic probe-training loop: optimizer, plateau LR schedule, best-only
checkpointing, early stopping, resume, history artifacts.

Behavioral mirror of `/root/reference/probing/train/base_trainer.py:16-315`
with JAX-native machinery:

- optax AdamW (param groups via ``multi_transform`` in the subclasses)
  instead of torch AdamW;
- ReduceLROnPlateau semantics re-implemented host-side (mode=min,
  ``patience = early_stop_patience // 2``, relative threshold) — the LR
  scale multiplies the base LRs and survives resume;
- "AMP" on TPU is simply the bf16 compute dtype policy — no GradScaler
  needed (bf16 has fp32's exponent range), so the scaler state the
  reference checkpoints (base_trainer.py:67-69) intentionally has no
  equivalent;
- checkpoints: ``model.msgpack`` (params blob + extras),
  ``training_state.msgpack`` (opt state, epoch, best, lr scale),
  ``head_config.yaml`` snapshot — same logical contents and layout as the
  reference's ``model.pt``/``training_state.pth``/``head_config.yaml``.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Dict

import numpy as np
import yaml

from .utils import (load_state, save_state, save_training_state, set_seed,
                    try_resume_training)


class BaseTrainer:
    """Subclasses implement ``build_probe()``, ``build_data()``,
    ``train_batch(batch) -> {task: float_loss, ...}`` and
    ``eval_batch(batch) -> {task: float_loss}`` plus the optional hooks."""

    def __init__(self, cfg: dict, run_name: str, ckpt_root: Path):
        self.cfg = cfg
        self.run_name = run_name
        self.ckpt_dir = Path(ckpt_root) / run_name
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)

        tcfg = cfg["train"]
        self.seed = int(tcfg.get("seed", 42))
        set_seed(self.seed)

        # LR schedule state (ReduceLROnPlateau semantics, host-side).
        scfg = tcfg.get("scheduler", {}) or {}
        self.sched_factor = float(scfg.get("factor", 0.1))
        self.sched_threshold = float(scfg.get("threshold", 1e-4))
        es_patience = int(tcfg.get("patience", 5))
        self.sched_patience = max(1, es_patience // 2)
        self.lr_scale = 1.0
        self._sched_best = float("inf")
        self._sched_bad_epochs = 0

        self.mesh = None   # build_probe sets it from the cfg's mesh: block
        self.build_probe()
        self.build_data()
        self.build_optimizer()

        self.model_file = self.ckpt_dir / "model.msgpack"
        self.state_file = self.ckpt_dir / "training_state.msgpack"

        # Config snapshot required by the testers
        # (reference: base_trainer.py:76-79).
        (self.ckpt_dir / "head_config.yaml").write_text(
            yaml.safe_dump(self.cfg, sort_keys=False, allow_unicode=True),
            encoding="utf-8")
        self.history = {"train": [], "val": []}
        self.rm = None  # subclasses may attach a RunningMeans

    # ----- subclass API -----
    def build_probe(self):
        raise NotImplementedError

    def build_data(self):
        raise NotImplementedError

    def build_optimizer(self):
        raise NotImplementedError

    def train_batch(self, batch) -> Dict[str, float]:
        raise NotImplementedError

    def eval_batch(self, batch) -> Dict[str, float]:
        raise NotImplementedError

    # ----- optional hooks (reference: base_trainer.py:86-93) -----
    def extra_state_dicts(self) -> dict:
        return {}

    def load_extra_state_dicts(self, blob: dict):
        pass

    def on_train_epoch_start(self, epoch: int, epochs: int):
        pass

    def after_train_batch(self, loss_dict: Dict[str, float], batch):
        pass

    # state serialization handles (subclasses set these)
    def model_state(self) -> dict:
        raise NotImplementedError

    def load_model_state(self, blob: dict):
        raise NotImplementedError

    def opt_state_handle(self):
        raise NotImplementedError

    def set_opt_state(self, opt_state):
        raise NotImplementedError

    def on_lr_change(self):
        """Called after ``lr_scale`` changes so subclasses can refresh their
        compiled update functions."""

    def batch_valid_counts(self, loss_dict, batch) -> Dict[str, int]:
        """Per-task number of valid (label != -1) samples in the batch, used
        to weight the epoch aggregation (reference: base_trainer.py:234-255).

        Batches are typed (:class:`vlm_tpu.probing.train.data.Batch`
        declares its target representation), so no shape sniffing: anything
        else aggregates unweighted."""
        from .data import Batch
        if isinstance(batch, Batch):
            return batch.valid_counts(list(loss_dict))
        return {k: 1 for k in loss_dict}

    # ----- fit loop (reference: base_trainer.py:95-155) -----
    def fit(self):
        tcfg = self.cfg["train"]
        epochs = int(tcfg.get("epochs", 50))
        patience = int(tcfg.get("patience", 5))
        eval_every = int(tcfg.get("eval_every", 2))

        best_val = float("inf")
        blob = load_state(self.model_file)
        if blob is not None:
            self.load_model_state(blob)
            self.load_extra_state_dicts(blob)
            print(f"[RESUME] model weights loaded from {self.model_file}")
        opt_state, start_epoch, best_val, lr_scale, plateau = \
            try_resume_training(self.state_file, self.opt_state_handle())
        self.set_opt_state(opt_state)
        if lr_scale != self.lr_scale:
            self.lr_scale = lr_scale
            self.on_lr_change()
        self._sched_best = plateau.get("best", float("inf"))
        self._sched_bad_epochs = int(plateau.get("bad_epochs", 0))

        patience_left = patience
        for epoch in range(start_epoch, epochs):
            self.on_train_epoch_start(epoch, epochs)
            train_monitor = self._run_epoch(epoch, epochs, train=True)
            self.history["train"].append(train_monitor)

            do_val = ((epoch + 1) % eval_every == 0)
            if do_val:
                val_monitor = self._run_epoch(epoch, epochs, train=False)
                self.history["val"].append(val_monitor)
                self._scheduler_step(val_monitor)
            else:
                self.history["val"].append(
                    self.history["val"][-1] if self.history["val"]
                    else float("nan"))

            if do_val:
                improved = val_monitor < best_val - 1e-8
                if improved:
                    best_val = val_monitor
                    patience_left = patience
                    save_state(self.model_file,
                               {"model": self.model_state()}
                               | self.extra_state_dicts())
                    save_training_state(
                        self.state_file, self.opt_state_handle(),
                        next_epoch=epoch + 1, best_val=best_val,
                        meta=self.run_meta(), cfg_path=self.cfg_path(),
                        lr_scale=self.lr_scale,
                        plateau={"best": self._sched_best,
                                 "bad_epochs": self._sched_bad_epochs})
                    print(f"[SAVE] improvement → {self.model_file} "
                          f"(monitor={val_monitor:.6f})")
                else:
                    patience_left -= 1
                    if patience_left <= 0:
                        print(f"[EARLY STOP] epoch {epoch + 1} "
                              f"(patience = {patience}). "
                              f"Best monitor: {best_val:.6f}")
                        break
        self._save_history_csv()
        self._save_history_plot()

    # ----- epoch loop -----
    def _run_epoch(self, epoch: int, epochs: int, train: bool) -> float:
        split = "train" if train else "val"
        loader = self.train_loader if train else self.val_loader
        running_sum: Dict[str, float] = {}
        running_n: Dict[str, int] = {}
        it = loader
        try:
            from tqdm import tqdm
            it = tqdm(loader, desc=f"{split.capitalize()} "
                      f"{epoch + 1}/{epochs}", unit="batch", leave=False)
        except ImportError:
            pass
        for batch in it:
            if train:
                loss_dict = self.train_batch(batch)
                self.after_train_batch(loss_dict, batch)
            else:
                loss_dict = self.eval_batch(batch)
            counts = self.batch_valid_counts(loss_dict, batch)
            for k, v in loss_dict.items():
                n = counts.get(k, 1)
                if n <= 0 or not math.isfinite(float(v)):
                    continue
                running_sum[k] = running_sum.get(k, 0.0) + float(v) * n
                running_n[k] = running_n.get(k, 0) + n
        return self._epoch_log(split, running_sum, running_n)

    def _epoch_log(self, split, running_sum, running_n) -> float:
        keys = sorted(running_sum.keys())
        if not keys:
            print(f"[{split}] no aggregated losses")
            return float("inf")
        vals = [running_sum[k] / max(1, running_n[k]) for k in keys]
        logs = " | ".join(f"{k}: {v:.4f}" for k, v in zip(keys, vals))
        print(f"[{split.upper()}] {logs} | "
              f"monitor(mean)={float(np.mean(vals)):.6f}")
        return float(np.mean(vals))

    # ----- ReduceLROnPlateau (reference: base_trainer.py:51-64,125-126) -----
    def _scheduler_step(self, val_monitor: float):
        improved = val_monitor < self._sched_best * (1 - self.sched_threshold)
        if improved:
            self._sched_best = val_monitor
            self._sched_bad_epochs = 0
        else:
            self._sched_bad_epochs += 1
            if self._sched_bad_epochs > self.sched_patience:
                self.lr_scale *= self.sched_factor
                self._sched_bad_epochs = 0
                print(f"[SCHED] plateau → lr_scale={self.lr_scale:.2e}")
                self.on_lr_change()

    # ----- artifacts (reference: base_trainer.py:271-305) -----
    def _save_history_csv(self):
        csv_path = self.ckpt_dir / "history.csv"
        with open(csv_path, "w", encoding="utf-8") as f:
            f.write("epoch,train_loss,val_loss\n")
            for i, (tr, va) in enumerate(zip(self.history["train"],
                                             self.history["val"]), start=1):
                tr_str = f"{tr:.6f}" if math.isfinite(tr) else ""
                va_str = f"{va:.6f}" if math.isfinite(va) else ""
                f.write(f"{i},{tr_str},{va_str}\n")
        print(f"[HISTORY] CSV saved: {csv_path}")
        if self.rm is not None:
            self.rm.save_history(self.ckpt_dir / "EMA_history.json")

    def _save_history_plot(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        epochs = np.arange(1, len(self.history["train"]) + 1)
        plt.figure(figsize=(7.5, 4.5))
        plt.plot(epochs, np.array(self.history["train"], dtype=float),
                 label="train")
        plt.plot(epochs, np.array(self.history["val"], dtype=float),
                 label="val")
        plt.xlabel("epoch")
        plt.ylabel("loss")
        plt.title(self.run_name)
        plt.grid(True, alpha=0.3)
        plt.legend()
        plt.tight_layout()
        out = self.ckpt_dir / "loss_curve.png"
        plt.savefig(out)
        plt.close()
        print(f"[HISTORY] plot saved: {out}")

    def run_meta(self) -> dict:
        mcfg = self.cfg["model"]
        return {"model_name": mcfg["name"],
                "quantization": mcfg.get("quantization")}

    def cfg_path(self) -> str:
        return self.cfg.get("_cfg_path", "unknown")
