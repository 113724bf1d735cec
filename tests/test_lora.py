"""LoRA adapter tests: merge math, trainer wiring, checkpoint round-trip
through the tester (see vlm_tpu/probing/lora.py — the training mode the
reference's get_lora_target_names surface implies, llava.py:189-230)."""

import json
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from tests.test_probing import _single_cfg, in_env, probing_env  # noqa: F401


def _tiny_backbone():
    from vlm_tpu.models.factory import VLMModelFactory
    m = VLMModelFactory.create_model("llava", quantization="bf16",
                                     size="test")
    return m.get_vision_backbone()


class TestMergeMath:
    def test_zero_init_is_identity(self):
        from vlm_tpu.probing.lora import init_lora, merge_lora
        bb = _tiny_backbone()
        targets = bb.get_lora_target_names({"last_k": 2, "attn_only": True})
        assert targets, "tiny llava tower must expose attn targets"
        lora = init_lora(bb.params, targets, rank=4, rng=jax.random.key(0))
        merged = merge_lora(bb.params, lora, alpha=8.0)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)))),
            bb.params, merged)
        assert max(jax.tree.leaves(diffs)) == 0.0
        # B is zeros, A is not
        assert all(float(jnp.max(jnp.abs(ab["B"]))) == 0.0
                   for ab in lora.values())
        assert all(float(jnp.max(jnp.abs(ab["A"]))) > 0.0
                   for ab in lora.values())

    def test_merge_touches_only_targets(self):
        from vlm_tpu.probing.lora import init_lora, merge_lora
        bb = _tiny_backbone()
        targets = bb.get_lora_target_names({"last_k": 1, "attn_only": True})
        lora = init_lora(bb.params, targets, rank=2, rng=jax.random.key(0))
        lora = jax.tree.map(lambda x: x + 0.05, lora)
        merged = merge_lora(bb.params, lora, alpha=4.0)
        changed = set()
        flat_a = jax.tree_util.tree_flatten_with_path(bb.params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(merged)[0]
        for (path, a), (_, b) in zip(flat_a, flat_b):
            keys = [k.key for k in path
                    if isinstance(k, jax.tree_util.DictKey)]
            if float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                     b.astype(jnp.float32)))) > 0:
                name = "/".join(k for k in keys if k != "params")
                changed.add(name.rsplit("/kernel", 1)[0])
        assert changed == set(targets)

    def test_merge_matches_manual_matmul(self):
        from vlm_tpu.probing.lora import merge_lora
        params = {"params": {"lin": {"kernel": jnp.eye(4),
                                     "bias": jnp.zeros(4)}}}
        lora = {"lin": {"A": jnp.ones((4, 2)), "B": jnp.ones((2, 4))}}
        merged = merge_lora(params, lora, alpha=4.0)
        # delta = (4/2) * ones(4,2)@ones(2,4) = 2*2 = 4 everywhere
        expect = jnp.eye(4) + 4.0
        np.testing.assert_allclose(merged["params"]["lin"]["kernel"], expect)
        np.testing.assert_allclose(merged["params"]["lin"]["bias"],
                                   jnp.zeros(4))

    def test_missing_target_raises(self):
        from vlm_tpu.probing.lora import init_lora, merge_lora
        params = {"params": {"lin": {"kernel": jnp.eye(4)}}}
        with pytest.raises(KeyError):
            init_lora(params, ["nope"], rank=2, rng=jax.random.key(0))
        with pytest.raises(KeyError):
            merge_lora(params, {"nope": {"A": jnp.ones((4, 2)),
                                         "B": jnp.ones((2, 4))}}, 2.0)

    def test_bad_rank_raises(self):
        from vlm_tpu.probing.lora import init_lora
        with pytest.raises(ValueError):
            init_lora({}, [], rank=0, rng=jax.random.key(0))


class TestLoraTraining:
    def _lora_cfg(self, base, **over):
        cfg = _single_cfg(
            base,
            model={"lora": {"enabled": True, "rank": 4, "alpha": 8,
                            "last_k": 1, "attn_only": True}},
            train={"epochs": 2})
        from vlm_tpu.core.config import deep_merge
        return deep_merge(cfg, over)

    def test_trains_adapters_base_frozen(self, in_env):  # noqa: F811
        root, base = in_env
        from vlm_tpu.probing.train.singletask_trainer import \
            SingleTaskTrainer
        ckroot = root / "probing" / "lp_lora"
        shutil.rmtree(ckroot, ignore_errors=True)
        tr = SingleTaskTrainer(self._lora_cfg(base), "lora_run", ckroot)
        # LoRA disables the feature cache even though base is frozen
        assert not tr.use_feature_cache
        assert tr.probe.fully_frozen
        base_before = jax.tree.map(np.asarray, tr.probe.backbone.params)
        lora_before = jax.tree.map(np.asarray, tr.lora_params)
        tr.fit()
        # base weights untouched
        same = jax.tree.map(lambda a, b: np.array_equal(a, np.asarray(b)),
                            base_before, tr.probe.backbone.params)
        assert all(jax.tree.leaves(same))
        # adapters moved (B leaves leave zero)
        moved = jax.tree.map(
            lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
            lora_before, tr.lora_params)
        assert max(jax.tree.leaves(moved)) > 0
        # checkpoint blob carries the adapters but NOT the provably-frozen
        # 300M-param base tower (reconstructible from model_id/seed)
        from vlm_tpu.probing.train.utils import load_state
        blob = load_state(ckroot / "lora_run" / "model.msgpack")
        model = blob.get("model", blob)
        assert "lora" in model
        assert "backbone" not in model

    def test_tester_merges_and_evaluates(self, in_env):  # noqa: F811
        root, base = in_env
        from vlm_tpu.probing.test.singletask_tester import SingleTaskTester
        ck = root / "probing" / "lp_lora" / "lora_run"
        assert (ck / "head_config.yaml").exists()
        # head_config snapshot must carry the lora block for the rebuild
        saved = yaml.safe_load((ck / "head_config.yaml").read_text())
        assert saved["model"]["lora"]["enabled"]
        cfg = {"data": {"base_path": str(base), "batch_size": 8},
               "eval": {"ckpt_from": str(ck), "dataset_name": "auto"}}
        SingleTaskTester(cfg).run()
        mfile = root / "probing" / "linear_probing" / "eval" / \
            "llava_fp32_linear" / "gender" / "TestDataset" / "metrics.json"
        metrics = json.loads(mfile.read_text())
        assert 0.0 <= metrics["gender"]["accuracy"] <= 1.0

    def test_tester_predictions_match_trainer_merge(self, in_env):  # noqa: F811
        """The tester's merged-once backbone must equal the trainer's
        functional merge: same features on the same inputs."""
        root, base = in_env
        from vlm_tpu.probing.lora import merge_lora
        from vlm_tpu.probing.test.singletask_tester import SingleTaskTester
        from vlm_tpu.probing.train.singletask_trainer import \
            SingleTaskTrainer
        ckroot = root / "probing" / "lp_lora"
        tr = SingleTaskTrainer(self._lora_cfg(base), "lora_run", ckroot)
        tr.fit()   # resumes from the earlier run
        merged_train = merge_lora(tr.probe.backbone.params, tr.lora_params,
                                  tr.lora_spec["alpha"])
        ck = ckroot / "lora_run"
        cfg = {"data": {"base_path": str(base), "batch_size": 8},
               "eval": {"ckpt_from": str(ck), "dataset_name": "auto"}}
        tester = SingleTaskTester(cfg)
        probe = tester.load_ckpt_and_build_model(tester.load_backbone())
        close = jax.tree.map(
            lambda a, b: np.allclose(np.asarray(a, np.float32),
                                     np.asarray(b, np.float32), atol=1e-5),
            merged_train, probe.backbone.params)
        assert all(jax.tree.leaves(close))

    def test_multitask_lora_smoke(self, in_env):  # noqa: F811
        root, base = in_env
        from vlm_tpu.probing.train.multitask_trainer import MultiTaskTrainer
        cfg = _single_cfg(
            base,
            model={"lora": {"enabled": True, "rank": 2, "alpha": 4,
                            "last_k": 1, "attn_only": True}},
            train={"epochs": 1})
        cfg.pop("task")
        cfg["tasks"] = ["gender", "emotion"]
        cfg["multi_task"] = {"running_means": {"beta": 0.9}}
        tr = MultiTaskTrainer(cfg, "mt_lora",
                              root / "probing" / "mt_lora")
        assert not tr.use_feature_cache if hasattr(
            tr, "use_feature_cache") else True
        lora_before = jax.tree.map(np.asarray, tr.lora_params)
        tr.fit()
        moved = jax.tree.map(
            lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
            lora_before, tr.lora_params)
        assert max(jax.tree.leaves(moved)) > 0


class TestLoraWiring:
    """Shared trainer-wiring helpers (vlm_tpu/probing/lora.py)."""

    def test_lr_zero_honored(self):
        """An explicit lora.lr: 0.0 must freeze the adapters, not fall
        back to the head LR (falsy-or regression)."""
        from vlm_tpu.probing.lora import init_lora, lora_transform
        params = {"layer": {"kernel": jnp.zeros((8, 4), jnp.float32)}}
        lora = init_lora(params, ["layer"], rank=2, rng=jax.random.key(0))
        _, tx = lora_transform({"lr": 0.0, "rank": 2}, lora,
                               head_lr=1e-2, lr_scale=1.0, weight_decay=0.0)
        state = tx.init(lora)
        grads = jax.tree.map(jnp.ones_like, lora)
        updates, _ = tx.update(grads, state, lora)
        assert max(float(jnp.abs(u).max())
                   for u in jax.tree.leaves(updates)) == 0.0
        # and a missing lr falls back to the head LR (non-zero updates)
        _, tx2 = lora_transform({"lr": None, "rank": 2}, lora,
                                head_lr=1e-2, lr_scale=1.0, weight_decay=0.0)
        updates2, _ = tx2.update(grads, tx2.init(lora), lora)
        assert max(float(jnp.abs(u).max())
                   for u in jax.tree.leaves(updates2)) > 0.0

    def test_empty_target_selection_message(self):
        """last_k: 0 on an fp tower must blame the selection strategy, not
        quantization."""
        from vlm_tpu.models.factory import VLMModelFactory
        from vlm_tpu.probing.lora import resolve_lora
        bb = VLMModelFactory.create_model(
            "paligemma", size="test").get_vision_backbone()
        with pytest.raises(ValueError, match="matched no layers"):
            resolve_lora({"lora": {"enabled": True, "last_k": 0}}, bb, 0)
