"""Multi-task probe tester (behavioral mirror of
`/root/reference/probing/test/multitask_tester.py`). Tasks are recovered
from the saved checkpoint config; eval artifacts land under
``probing/multitask_probing/eval/<run_name>/<task>/<dataset>``.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List

import numpy as np
import yaml

from ...data.dataset_factory import DatasetFactory
from ...models.factory import VLMModelFactory
from ..probes import MultiTaskProbe
from ..train.utils import get_num_classes_for_task, load_state
from .base_tester import BaseTester


class MultiTaskTester(BaseTester):
    def __init__(self, cfg: dict):
        super().__init__(cfg)
        self.ckpt_from = Path(cfg["eval"]["ckpt_from"])
        from ...core.config import project_root
        if not self.ckpt_from.is_absolute():
            self.ckpt_from = project_root() / self.ckpt_from
        self.ckpt_from = self.ckpt_from.resolve()
        self.head_cfg = self._load_head_config(self.ckpt_from)

        m = self.head_cfg["model"] if "model" in self.head_cfg else {}
        self.model_name = m.get("name", self.head_cfg.get("model_name"))
        self.quantization = m.get("quantization",
                                  self.head_cfg.get("quantization", "fp32"))
        self.deeper_head = bool(m.get("deeper_head",
                                      self.head_cfg.get("deeper_heads",
                                                        False)))
        bb = (m.get("backbone") or {})
        # The trainer writes the freeze flag nested (model.backbone.freeze);
        # honor that first, like SingleTaskTester, with the same default.
        self.freeze_bb = bool(bb.get("freeze",
                                     m.get("freeze_backbone",
                                           self.head_cfg.get(
                                               "freeze_backbone", True))))
        self.dropout_p = float(m.get("dropout_p",
                                     self.head_cfg.get("dropout_p", 0.3)))
        self.hidden_dim = int(m.get("hidden_dim",
                                    self.head_cfg.get("hidden_dim", 512)))
        self.model_size = m.get("size")

        if "tasks" in self.head_cfg:
            self.tasks = [t.lower() for t in self.head_cfg["tasks"]]
        elif "train" in self.head_cfg and "tasks" in self.head_cfg["train"]:
            self.tasks = [t.lower() for t in self.head_cfg["train"]["tasks"]]
        else:
            raise ValueError(
                "Cannot determine tasks from the checkpoint config.")
        self.run_name = self.ckpt_from.name

    def _load_head_config(self, ckpt_dir: Path) -> dict:
        p = ckpt_dir / "head_config.yaml"
        if not p.exists():
            raise FileNotFoundError(f"head_config.yaml not found in {ckpt_dir}")
        with open(p, "r", encoding="utf-8") as f:
            return yaml.safe_load(f)

    # --- BaseTester impl ---
    def load_backbone(self):
        vlm = VLMModelFactory.create_model(
            self.model_name,
            model_id=self.head_cfg.get("model", {}).get("model_id"),
            quantization=self.quantization, size=self.model_size,
            mesh=self.cfg.get("mesh"),
            quantize_vision=self.head_cfg.get(
                "model", {}).get("quantize_vision"))
        bb = vlm.get_vision_backbone()
        del vlm
        return bb

    def load_ckpt_and_build_model(self, backbone):
        from flax import serialization
        tasks_n = {t: get_num_classes_for_task(t) for t in self.tasks}
        probe = MultiTaskProbe(
            backbone=backbone, tasks=tasks_n,
            freeze_backbone=self.freeze_bb, dropout_p=self.dropout_p,
            deeper_heads=self.deeper_head, hidden_dim=self.hidden_dim)
        model_path = self.ckpt_from / "model.msgpack"
        if not model_path.exists():
            raise FileNotFoundError(f"model.msgpack not found in "
                                    f"{self.ckpt_from}")
        blob = load_state(model_path)
        model = blob.get("model", blob.get("probe", blob))
        if "heads" in model:
            probe.head_state = serialization.from_state_dict(
                probe.head_state, model["heads"])
        if "backbone" in model:
            probe.backbone.params = serialization.from_state_dict(
                probe.backbone.params, model["backbone"])
        self._apply_lora(probe, model,
                         (self.head_cfg.get("model") or {}).get("lora"))
        return probe

    def iter_tasks(self) -> List[str]:
        return self.tasks

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
        out = model.forward(images_list)["logits"][task]
        return np.asarray(out.argmax(axis=1)).tolist()

    def build_eval_dir(self, task: str, dataset_name: str) -> str:
        from ...core.config import project_root
        base = Path(project_root(), "probing", "multitask_probing", "eval",
                    self.run_name)
        return str(base / task / dataset_name)

    def dataset_obj(self, dataset_name: str):
        return DatasetFactory.create_dataset(
            dataset_name, base_path=self.base_path, split="test",
            transform=None)
