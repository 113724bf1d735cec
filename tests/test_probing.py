"""End-to-end probing subsystem tests on synthetic data with tiny models:
train (feature cache + e2e), resume, checkpoints/artifacts, testers.
"""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest
import yaml

from tests.conftest import make_face_dataset


@pytest.fixture(scope="module")
def probing_env(tmp_path_factory):
    """Project root with configs + a 24-sample TestDataset in all splits."""
    root = tmp_path_factory.mktemp("probing_root")
    (root / "configs").mkdir()
    base = root / "datasets"
    rows = [{"gender": i % 2, "age": 5 + 7 * i, "ethnicity": i % 4,
             "emotion": i % 7} for i in range(24)]
    for split in ("train", "val", "test"):
        make_face_dataset(base, "TestDataset", split, rows)
    (root / "configs" / "task_datasets.yaml").write_text(yaml.safe_dump({
        s: {"gender": ["TestDataset"], "age": ["TestDataset"],
            "emotion": ["TestDataset"]}
        for s in ("train", "val", "test")}))
    return root, base


@pytest.fixture
def in_env(probing_env, monkeypatch):
    root, base = probing_env
    monkeypatch.setenv("VLM_TPU_ROOT", str(root))
    from vlm_tpu.data.dataset_factory import DatasetFactory
    DatasetFactory.load_task_map(force=True)
    yield root, base
    monkeypatch.undo()
    DatasetFactory.load_task_map(force=True)


def _single_cfg(base, **over):
    cfg = {
        "model": {"name": "llava", "quantization": "fp32", "size": "test",
                  "dropout_p": 0.3, "deeper_head": False, "hidden_dim": 64,
                  "backbone": {"freeze": True, "unfreeze_last_k": 0}},
        "data": {"base_path": str(base), "batch_size": 8,
                 "use_augmentation": False, "use_sampler": False},
        "train": {"seed": 42, "epochs": 2, "lr": 1e-2, "weight_decay": 1e-4,
                  "patience": 4, "eval_every": 1,
                  "scheduler": {"factor": 0.1, "threshold": 1e-4}},
        "task": "gender", "_cfg_path": "test.yaml",
    }
    from vlm_tpu.core.config import deep_merge
    return deep_merge(cfg, over)


class TestSingleTaskTrainer:
    def test_train_with_feature_cache(self, in_env):
        root, base = in_env
        from vlm_tpu.core.config import make_run_name
        from vlm_tpu.probing.train.singletask_trainer import SingleTaskTrainer
        cfg = _single_cfg(base)
        run = make_run_name(cfg, "single")
        ckroot = root / "probing" / "linear_probing" / "checkpoints"
        shutil.rmtree(ckroot / run, ignore_errors=True)
        tr = SingleTaskTrainer(cfg, run, ckroot)
        assert tr.use_feature_cache
        tr.fit()
        ck = ckroot / run
        for f in ("model.msgpack", "training_state.msgpack",
                  "head_config.yaml", "history.csv", "loss_curve.png"):
            assert (ck / f).exists(), f
        feats = root / "probing" / "linear_probing" / "features" / \
            "llava_fp32_gender_test"
        assert (feats / "train_features.npz").exists()
        blob = np.load(feats / "train_features.npz")
        assert blob["x"].shape[0] == 24 and blob["y"].shape == (24,)
        # history has both epochs
        lines = (ck / "history.csv").read_text().strip().splitlines()
        assert lines[0] == "epoch,train_loss,val_loss"
        assert len(lines) == 3

    def test_resume_skips_done_epochs(self, in_env, capsys):
        root, base = in_env
        from vlm_tpu.core.config import make_run_name
        from vlm_tpu.probing.train.singletask_trainer import SingleTaskTrainer
        cfg = _single_cfg(base)
        run = make_run_name(cfg, "single")
        ckroot = root / "probing" / "linear_probing" / "checkpoints"
        tr = SingleTaskTrainer(cfg, run, ckroot)   # ckpt exists from prev test
        tr.fit()
        out = capsys.readouterr().out
        assert "[RESUME] model weights loaded" in out
        assert "start_epoch=2" in out

    def test_e2e_mode_when_unfrozen(self, in_env):
        root, base = in_env
        from vlm_tpu.probing.train.singletask_trainer import SingleTaskTrainer
        cfg = _single_cfg(base, model={"backbone": {"freeze": True,
                                                    "unfreeze_last_k": 1}},
                          train={"epochs": 1})
        tr = SingleTaskTrainer(cfg, "e2e_run",
                               root / "probing" / "lp_e2e")
        assert not tr.use_feature_cache
        before = np.asarray(
            next(iter(jax_leaves(tr.probe.backbone.params))))
        tr.fit()

    def test_feature_cache_tolerant_keys(self, in_env):
        root, base = in_env
        from vlm_tpu.probing.train.singletask_trainer import SingleTaskTrainer
        feats_dir = root / "probing" / "linear_probing" / "features" / \
            "llava_fp32_gender_test"
        blob = np.load(feats_dir / "train_features.npz")
        np.savez(feats_dir / "train_features.npz",
                 features=blob["x"], labels=blob["y"])
        cfg = _single_cfg(base, train={"epochs": 1})
        tr = SingleTaskTrainer(cfg, "tolerant_run",
                               root / "probing" / "lp_tol")
        # loaded without error through the features/labels key alias
        assert tr.train_loader.x.shape[0] == 24


def jax_leaves(tree):
    import jax
    return jax.tree.leaves(tree)


class TestSingleTaskTester:
    def test_full_cycle(self, in_env):
        root, base = in_env
        from vlm_tpu.probing.test.singletask_tester import SingleTaskTester
        ck = root / "probing" / "linear_probing" / "checkpoints" / \
            "llava_fp32_gender_linear"
        cfg = {"data": {"base_path": str(base), "batch_size": 8},
               "eval": {"ckpt_from": str(ck), "dataset_name": "auto"}}
        SingleTaskTester(cfg).run()
        mfile = root / "probing" / "linear_probing" / "eval" / \
            "llava_fp32_linear" / "gender" / "TestDataset" / "metrics.json"
        metrics = json.loads(mfile.read_text())
        assert "gender" in metrics and 0.0 <= metrics["gender"]["accuracy"] <= 1.0

    def test_missing_ckpt_raises(self, in_env, tmp_path):
        from vlm_tpu.probing.test.singletask_tester import SingleTaskTester
        (tmp_path / "head_config.yaml").write_text(yaml.safe_dump(
            {"model": {"name": "llava", "quantization": "fp32",
                       "size": "test"}, "task": "gender"}))
        cfg = {"data": {"base_path": "x", "batch_size": 8},
               "eval": {"ckpt_from": str(tmp_path),
                        "dataset_name": "TestDataset"}}
        with pytest.raises(FileNotFoundError):
            SingleTaskTester(cfg).run()


class TestMultiTask:
    def test_static_weights_survive_uninitialized_ema(self, in_env):
        """Epoch-1 fallback (EMA not yet initialized) must use the user's
        static task weights DIRECTLY — a regression here previously fed
        their inverses, training up-weighted tasks with LESS weight."""
        root, base = in_env
        from vlm_tpu.probing.train.multitask_trainer import MultiTaskTrainer
        cfg = {
            "model": {"name": "llava", "quantization": "fp32",
                      "size": "test", "dropout_p": 0.3,
                      "deeper_head": False, "hidden_dim": 64,
                      "backbone": {"freeze": True, "unfreeze_last_k": 0,
                                   "unfreeze_parts": "all",
                                   "include_embeddings": True}},
            "data": {"base_path": str(base), "batch_size": 8,
                     "use_augmentation": False, "use_sampler": False},
            "train": {"seed": 0, "epochs": 1, "lr": 1e-3,
                      "backbone_lr": 1e-4, "weight_decay": 0.0,
                      "patience": 2, "eval_every": 1,
                      "running_means": {"enabled": True, "alpha": 0.9},
                      "task_weights": {"gender": 2.0, "age": 0.5,
                                       "emotion": 1.0},
                      "scheduler": {"factor": 0.1, "threshold": 1e-4}},
            "tasks": ["gender", "age", "emotion"], "_cfg_path": "t.yaml",
        }
        ckroot = root / "probing" / "multitask_probing" / "checkpoints"
        tr = MultiTaskTrainer(cfg, "w_fallback", ckroot)
        w = tr._compute_task_weights()
        raw = [2.0, 0.5, 1.0]
        avg = sum(raw) / 3
        # normalized-to-mean-1 statics, same ORDER as configured
        assert abs(w["gender"] - 2.0 / avg) < 1e-6
        assert abs(w["age"] - 0.5 / avg) < 1e-6
        assert w["gender"] > w["emotion"] > w["age"]

    def test_train_and_test(self, in_env):
        root, base = in_env
        from vlm_tpu.core.config import make_run_name
        from vlm_tpu.probing.test.multitask_tester import MultiTaskTester
        from vlm_tpu.probing.train.multitask_trainer import MultiTaskTrainer
        cfg = {
            "model": {"name": "llava", "quantization": "fp32",
                      "size": "test", "dropout_p": 0.3,
                      "deeper_head": False, "hidden_dim": 64,
                      "backbone": {"freeze": True, "unfreeze_last_k": 1,
                                   "unfreeze_parts": "all",
                                   "include_embeddings": True}},
            "data": {"base_path": str(base), "batch_size": 8,
                     "use_augmentation": True, "use_sampler": True},
            "train": {"seed": 42, "epochs": 2, "lr": 1e-3,
                      "backbone_lr": 1e-4, "weight_decay": 1e-4,
                      "patience": 4, "eval_every": 1,
                      "running_means": {"enabled": True, "alpha": 0.9},
                      "task_weights": {"gender": 1.0, "age": 1.0,
                                       "emotion": 1.0},
                      "scheduler": {"factor": 0.1, "threshold": 1e-4}},
            "tasks": ["gender", "age", "emotion"], "_cfg_path": "t.yaml",
        }
        run = make_run_name(cfg, "multi")
        ckroot = root / "probing" / "multitask_probing" / "checkpoints"
        shutil.rmtree(ckroot / run, ignore_errors=True)
        tr = MultiTaskTrainer(cfg, run, ckroot)
        # dynamic weights start at the static fallback
        assert tr._compute_task_weights() == {"gender": 1.0, "age": 1.0,
                                              "emotion": 1.0}
        tr.fit()
        # EMA got updated → weights deviate from 1
        w = tr._compute_task_weights()
        assert any(abs(v - 1.0) > 1e-6 for v in w.values())
        assert (ckroot / run / "EMA_history.json").exists()
        # RunningMeans persisted in the model blob
        from vlm_tpu.probing.train.utils import load_state
        blob = load_state(ckroot / run / "model.msgpack")
        assert "running_means" in blob

        tcfg = {"data": {"base_path": str(base), "batch_size": 8},
                "eval": {"ckpt_from": str(ckroot / run),
                         "dataset_name": "TestDataset"}}
        MultiTaskTester(tcfg).run()
        for task in ("gender", "age", "emotion"):
            mfile = root / "probing" / "multitask_probing" / "eval" / run / \
                task / "TestDataset" / "metrics.json"
            assert mfile.exists()


class TestQuantizedTowerProbing:
    def test_vq_cache_dir_and_snapshot(self, in_env):
        """A quantized-tower probing run must (a) use its own feature-cache
        directory (never share fp-tower features) and (b) record the
        resolved quantize_vision in head_config.yaml so the tester rebuilds
        the same tower — including when it arrives via the
        VLM_TPU_QUANT_VISION env fallback."""
        import os
        root, base = in_env
        from vlm_tpu.probing.train.singletask_trainer import \
            SingleTaskTrainer
        ckroot = root / "probing" / "lp_vq"
        shutil.rmtree(ckroot, ignore_errors=True)
        os.environ["VLM_TPU_QUANT_VISION"] = "1"
        try:
            cfg = _single_cfg(base, model={"quantization": "8bit"})
            assert "quantize_vision" not in cfg["model"]
            tr = SingleTaskTrainer(cfg, "vq_run", ckroot)
        finally:
            os.environ.pop("VLM_TPU_QUANT_VISION", None)
        assert tr.use_feature_cache
        assert tr.features_dir.name.endswith("_vq")
        saved = yaml.safe_load(
            (ckroot / "vq_run" / "head_config.yaml").read_text())
        assert saved["model"]["quantize_vision"] is True
        # fp run on the same config keys gets a different cache dir
        tr_fp = SingleTaskTrainer(
            _single_cfg(base, model={"quantization": "8bit"}),
            "fp_run", root / "probing" / "lp_fp")
        assert tr_fp.features_dir != tr.features_dir
