"""VLM checkpoint round-trip + uncertainty-weighting trainer option."""

import numpy as np
import pytest
import yaml

from tests.conftest import make_face_dataset


class TestVLMCheckpoint:
    def test_save_load_roundtrip_preserves_outputs(self, tmp_path):
        from PIL import Image

        from vlm_tpu.models.factory import VLMModelFactory
        m1 = VLMModelFactory.create_model("paligemma", quantization="fp32",
                                          size="test", seed=3)
        img = Image.fromarray(np.random.default_rng(0).integers(
            0, 255, (40, 40, 3), dtype=np.uint8))
        out1 = m1.generate_batch([img], "x", max_tokens=5)
        ck = tmp_path / "ckpt"
        m1.save_checkpoint(ck)
        assert (ck / "params.msgpack").exists()
        assert (ck / "config.yaml").exists()

        # fresh model with a different seed, loading the checkpoint
        m2 = VLMModelFactory.create_model("paligemma", model_id=str(ck),
                                          quantization="fp32", size="test",
                                          seed=99)
        out2 = m2.generate_batch([img], "x", max_tokens=5)
        assert out1 == out2

    def test_meta_recorded(self, tmp_path):
        from vlm_tpu.models.factory import VLMModelFactory
        from vlm_tpu.utils.checkpoint import checkpoint_meta
        m = VLMModelFactory.create_model("llava", quantization="bf16",
                                         size="test")
        m.save_checkpoint(tmp_path / "c")
        meta = checkpoint_meta(tmp_path / "c")
        assert meta["family"] == "llava"
        assert meta["quantization"] == "bf16"


class TestUncertaintyWeighting:
    def test_multitask_uw_trains_log_vars(self, tmp_path, monkeypatch):
        root = tmp_path / "root"
        (root / "configs").mkdir(parents=True)
        base = root / "datasets"
        rows = [{"gender": i % 2, "age": 5 + 7 * i, "ethnicity": i % 4,
                 "emotion": i % 7} for i in range(16)]
        for split in ("train", "val"):
            make_face_dataset(base, "TestDataset", split, rows)
        (root / "configs" / "task_datasets.yaml").write_text(yaml.safe_dump({
            s: {"gender": ["TestDataset"], "emotion": ["TestDataset"]}
            for s in ("train", "val")}))
        monkeypatch.setenv("VLM_TPU_ROOT", str(root))
        from vlm_tpu.data.dataset_factory import DatasetFactory
        DatasetFactory.load_task_map(force=True)
        try:
            from vlm_tpu.probing.train.multitask_trainer import \
                MultiTaskTrainer
            cfg = {
                "model": {"name": "llava", "quantization": "fp32",
                          "size": "test", "dropout_p": 0.1,
                          "deeper_head": False, "hidden_dim": 32,
                          "backbone": {"freeze": True, "unfreeze_last_k": 0}},
                "data": {"base_path": str(base), "batch_size": 8,
                         "use_augmentation": False, "use_sampler": False},
                "train": {"seed": 0, "epochs": 2, "lr": 1e-2,
                          "weight_decay": 1e-4, "patience": 4,
                          "eval_every": 1,
                          "running_means": {"enabled": False},
                          "uncertainty_weighting": {"enabled": True},
                          "scheduler": {"factor": 0.1, "threshold": 1e-4}},
                "tasks": ["gender", "emotion"], "_cfg_path": "t.yaml",
            }
            tr = MultiTaskTrainer(cfg, "uw_run", root / "ck")
            assert tr.use_uw
            lv0 = {t: float(v) for t, v in tr._log_vars.items()}
            tr.fit()
            lv1 = {t: float(v) for t, v in tr._log_vars.items()}
            assert any(abs(lv1[t] - lv0[t]) > 1e-6 for t in lv0), \
                "log-vars should receive gradient updates"
            # persisted in the checkpoint blob
            from vlm_tpu.probing.train.utils import load_state
            blob = load_state(root / "ck" / "uw_run" / "model.msgpack")
            assert "uw_log_vars" in blob
        finally:
            monkeypatch.undo()
            DatasetFactory.load_task_map(force=True)
