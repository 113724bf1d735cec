"""Generic probe evaluation: per-(task, dataset) inference loop feeding the
Evaluator.

Behavioral mirror of `/root/reference/probing/test/base_tester.py:9-75`:
iterate tasks × datasets, batched forward + argmax, collect per-sample
``{task: int}`` preds/gts, then ``Evaluator.evaluate(age_mode=
"classification")``. The forward runs as one jitted batched call per batch
(the reference's autocast-fp16 loop becomes the bf16/bf32 policy).
"""

from __future__ import annotations

import os
from typing import List

from ...evaluation import Evaluator
from ..train.data import ImageBatchLoader


class BaseTester:
    """Subclasses implement ``load_backbone``, ``load_ckpt_and_build_model``,
    ``iter_tasks``, ``datasets_for_task``, ``predict_step``,
    ``build_eval_dir``, ``dataset_obj``."""

    def __init__(self, cfg: dict):
        self.cfg = cfg
        dcfg = cfg["data"]
        self.base_path = dcfg.get("base_path", None)
        self.batch_size = int(dcfg.get("batch_size", 128))

    def _apply_lora(self, probe, model_blob: dict, lora_cfg):
        """Merge trained LoRA adapters (if the run used them) into the
        backbone params once — inference then runs at base-model speed.

        The adapter TREE TEMPLATE comes from the same ``resolve_lora``
        the trainers use (single home for spec-parse/enumerate/init, so
        shapes cannot drift); its values are then replaced wholesale by
        the checkpoint blob."""
        from flax import serialization

        from ..lora import merge_lora, resolve_lora
        spec, lora = resolve_lora({"lora": lora_cfg}, probe.backbone,
                                  seed=0)
        if not spec:
            return
        if "lora" not in model_blob:
            raise KeyError("head_config declares LoRA but the checkpoint "
                           "blob has no 'lora' entry")
        lora = serialization.from_state_dict(lora, model_blob["lora"])
        probe.backbone.params = merge_lora(probe.backbone.params, lora,
                                           spec["alpha"])

    # --- subclass API ---
    def load_backbone(self):
        raise NotImplementedError

    def load_ckpt_and_build_model(self, backbone):
        raise NotImplementedError

    def iter_tasks(self) -> List[str]:
        raise NotImplementedError

    def datasets_for_task(self, task: str) -> List[str]:
        raise NotImplementedError

    def predict_step(self, model, batch, task: str) -> List[int]:
        raise NotImplementedError

    def build_eval_dir(self, task: str, dataset_name: str) -> str:
        raise NotImplementedError

    def dataset_obj(self, dataset_name: str):
        raise NotImplementedError

    # --- per-(task, dataset) loop (reference: base_tester.py:39-62) ---
    def run_one(self, model, task: str, dataset_name: str):
        ds = self.dataset_obj(dataset_name)
        loader = ImageBatchLoader(ds, self.batch_size)
        preds, gts = [], []
        for images_list, targets_list in loader:
            pred_idxs = self.predict_step(model, (images_list, targets_list),
                                          task)
            key = task
            for i, tgt in enumerate(targets_list):
                preds.append({key: int(pred_idxs[i])})
                gts.append({key: int(tgt.get(key, -1))})
        out_dir = self.build_eval_dir(task, dataset_name)
        os.makedirs(out_dir, exist_ok=True)
        Evaluator.evaluate(preds, gts, output_dir=out_dir,
                           dataset_name=dataset_name,
                           age_mode="classification")
        print(f"[OK] {task} @ {dataset_name}: results saved in {out_dir}")

    def run(self):
        backbone = self.load_backbone()
        model = self.load_ckpt_and_build_model(backbone)
        for task in self.iter_tasks():
            for ds in self.datasets_for_task(task):
                self.run_one(model, task, ds)
