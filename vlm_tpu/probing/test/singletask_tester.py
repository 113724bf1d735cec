"""Single-task probe tester (behavioral mirror of
`/root/reference/probing/test/singletask_tester.py`).

Reads ``head_config.yaml`` from the checkpoint dir (new nested or old flat
format), rebuilds the backbone through the factory, loads ``classifier.msgpack``
(head-only) or ``model.msgpack`` (full blob), and evaluates on
``dataset_name: auto`` → the test task→dataset map from
``configs/task_datasets.yaml``.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List

import numpy as np
import yaml

from ...data.dataset_factory import DatasetFactory
from ...models.factory import VLMModelFactory
from ..probes import LinearProbe
from ..train.utils import get_num_classes_for_task, load_state
from .base_tester import BaseTester


class SingleTaskTester(BaseTester):
    def __init__(self, cfg: dict):
        super().__init__(cfg)
        self.ckpt_from = Path(cfg["eval"]["ckpt_from"])
        from ...core.config import project_root
        if not self.ckpt_from.is_absolute():
            self.ckpt_from = project_root() / self.ckpt_from
        self.ckpt_from = self.ckpt_from.resolve()
        self.head_cfg = self._load_head_config(self.ckpt_from)

        if "model" in self.head_cfg:
            m = self.head_cfg["model"]
            bb = (m.get("backbone") or {})
            self.model_name = m["name"]
            self.quantization = m.get("quantization", "fp32")
            self.deeper_head = bool(m.get("deeper_head", False))
            self.freeze_bb = bool(bb.get("freeze",
                                         m.get("freeze_backbone", True)))
            self.dropout_p = float(m.get("dropout_p", 0.3))
            self.hidden_dim = int(m.get("hidden_dim", 512))
            self.model_size = m.get("size")
        else:
            # legacy flat format (reference: singletask_tester.py:30-40)
            self.model_name = self.head_cfg.get("model_name")
            self.quantization = self.head_cfg.get("quantization", "fp32")
            self.deeper_head = bool(self.head_cfg.get("deeper_head", False))
            self.freeze_bb = bool(self.head_cfg.get("freeze_backbone", True))
            self.dropout_p = float(self.head_cfg.get("dropout_p", 0.3))
            self.hidden_dim = int(self.head_cfg.get("hidden_dim", 512))
            self.model_size = self.head_cfg.get("size")
        self.task = str(self.head_cfg.get("task")).lower()

    def _load_head_config(self, ckpt_dir: Path) -> dict:
        for fname in ("head_config.yaml", "run_config.yaml"):
            p = ckpt_dir / fname
            if p.exists():
                with open(p, "r", encoding="utf-8") as f:
                    return yaml.safe_load(f)
        raise FileNotFoundError(f"config not found in {ckpt_dir}")

    # --- BaseTester impl ---
    def load_backbone(self):
        vlm = VLMModelFactory.create_model(
            self.model_name, model_id=self.head_cfg.get(
                "model", {}).get("model_id"),
            quantization=self.quantization, size=self.model_size,
            mesh=self.cfg.get("mesh"),
            quantize_vision=self.head_cfg.get(
                "model", {}).get("quantize_vision"))
        bb = vlm.get_vision_backbone()
        del vlm
        return bb

    def load_ckpt_and_build_model(self, backbone):
        from flax import serialization
        probe = LinearProbe(
            backbone=backbone,
            n_out_classes=get_num_classes_for_task(self.task),
            freeze_backbone=self.freeze_bb,
            deeper_head=self.deeper_head,
            dropout_p=self.dropout_p,
            hidden_dim=self.hidden_dim)
        cls_path = self.ckpt_from / "classifier.msgpack"
        model_path = self.ckpt_from / "model.msgpack"
        if cls_path.exists():
            blob = load_state(cls_path)
            probe.head_state = serialization.from_state_dict(
                probe.head_state, blob)
        elif model_path.exists():
            blob = load_state(model_path)
            model = blob.get("model", blob)
            if "head" in model:
                probe.head_state = serialization.from_state_dict(
                    probe.head_state, model["head"])
            if "backbone" in model:
                probe.backbone.params = serialization.from_state_dict(
                    probe.backbone.params, model["backbone"])
            self._apply_lora(probe, model,
                             (self.head_cfg.get("model") or {}).get("lora"))
        else:
            raise FileNotFoundError(
                f"No checkpoint found in {self.ckpt_from} "
                f"(classifier.msgpack|model.msgpack)")
        return probe

    def iter_tasks(self) -> List[str]:
        return [self.task]

    def datasets_for_task(self, task: str) -> List[str]:
        ecfg = self.cfg["eval"]
        name = (ecfg.get("dataset_name", "auto") or "auto").lower()
        if name == "auto":
            DatasetFactory.load_task_map()
            if task not in DatasetFactory.TASK_TO_DATASETS_TEST:
                raise RuntimeError(
                    f"TASK_TO_DATASETS_TEST unavailable for {task}")
            return DatasetFactory.TASK_TO_DATASETS_TEST[task]
        return [ecfg["dataset_name"]]

    def predict_step(self, model, batch, task: str) -> List[int]:
        images_list, _ = batch
        logits = model.forward(images_list)
        return np.asarray(logits.argmax(axis=1)).tolist()

    def build_eval_dir(self, task: str, dataset_name: str) -> str:
        head_type = "deeper" if self.deeper_head else "linear"
        from ...core.config import project_root
        base = Path(project_root(), "probing", "linear_probing", "eval",
                    f"{self.model_name}_{self.quantization}_{head_type}")
        return str(base / task / dataset_name)

    def dataset_obj(self, dataset_name: str):
        return DatasetFactory.create_dataset(
            dataset_name, base_path=self.base_path, split="test",
            transform=None)
