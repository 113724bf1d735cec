"""Probing train-utils tests, including masked-CE parity with torch's
``CrossEntropyLoss(weight, ignore_index=-1)`` — the exact loss the reference
uses (`/root/reference/probing/train/singletask_trainer.py:104-108`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vlm_tpu.probing.train import utils as tu
from vlm_tpu.probing.train.losses import RunningMeans, UncertaintyWeighter


class TestCountsToWeights:
    def test_mean_one_and_inverse(self):
        w = tu.counts_to_weights(np.array([10, 90]))
        assert w.mean() == pytest.approx(1.0)
        assert w[0] > w[1]
        # exact formula: inv*(C/sum(inv))
        inv = np.array([1 / 10, 1 / 90])
        np.testing.assert_allclose(w, inv * (2 / inv.sum()))

    def test_zero_counts_clamped(self):
        w = tu.counts_to_weights(np.array([0, 5]))
        assert np.isfinite(w).all()


class TestMaskedCE:
    def test_matches_torch_ignore_index(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(16, 5)).astype(np.float32)
        y = rng.integers(-1, 5, size=16).astype(np.int64)
        w = rng.uniform(0.5, 2.0, size=5).astype(np.float32)

        ours = float(tu.masked_cross_entropy(jnp.asarray(logits),
                                             jnp.asarray(y), jnp.asarray(w)))
        crit = torch.nn.CrossEntropyLoss(weight=torch.tensor(w),
                                         ignore_index=-1)
        theirs = float(crit(torch.tensor(logits), torch.tensor(y)))
        assert ours == pytest.approx(theirs, rel=1e-5)

    def test_unweighted_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(8, 3)).astype(np.float32)
        y = np.array([0, 1, 2, -1, -1, 0, 1, 2], dtype=np.int64)
        ours = float(tu.masked_cross_entropy(jnp.asarray(logits),
                                             jnp.asarray(y)))
        crit = torch.nn.CrossEntropyLoss(ignore_index=-1)
        theirs = float(crit(torch.tensor(logits), torch.tensor(y)))
        assert ours == pytest.approx(theirs, rel=1e-5)

    def test_all_missing_returns_zero(self):
        logits = jnp.zeros((4, 3))
        y = jnp.full((4,), -1)
        assert float(tu.masked_cross_entropy(logits, y)) == 0.0


class TestWeightedSampler:
    def _fake_ds(self, labels):
        class DS:
            def __init__(self, labs):
                self._labs = labs

            def __len__(self):
                return len(self._labs)

            def get_all_labels(self, task):
                return np.asarray(self._labs)
        return DS(labels)

    def test_weights_follow_class_weights(self):
        ds = self._fake_ds([0, 0, 0, 1, -1])
        sampler, w = tu.build_weighted_sampler(
            ds, {"gender": np.array([0.5, 2.0])}, normalize=False, seed=0)
        assert w[0] == pytest.approx(0.5)
        assert w[3] == pytest.approx(2.0)
        assert w[4] == pytest.approx(1e-4)   # no valid task → min_weight
        assert len(sampler) == 5

    def test_sampler_biases_towards_heavy(self):
        ds = self._fake_ds([0] * 50 + [1] * 50)
        sampler, _ = tu.build_weighted_sampler(
            ds, {"t": np.array([0.01, 10.0])}, seed=0)
        idx = list(sampler)
        frac_heavy = np.mean([i >= 50 for i in idx])
        assert frac_heavy > 0.9

    def test_combine_modes(self):
        ds = self._fake_ds([0])

        class DS2:
            def __len__(self):
                return 1

            def get_all_labels(self, task):
                return np.array([0])
        _, w_mean = tu.build_weighted_sampler(
            DS2(), {"a": np.array([1.0]), "b": np.array([3.0])},
            combine="mean", normalize=False)
        _, w_sum = tu.build_weighted_sampler(
            DS2(), {"a": np.array([1.0]), "b": np.array([3.0])},
            combine="sum", normalize=False)
        _, w_max = tu.build_weighted_sampler(
            DS2(), {"a": np.array([1.0]), "b": np.array([3.0])},
            combine="max", normalize=False)
        assert w_mean[0] == pytest.approx(2.0)
        assert w_sum[0] == pytest.approx(4.0)
        assert w_max[0] == pytest.approx(3.0)


class TestPerSampleWeights:
    def test_formula(self):
        class DS:
            def __len__(self):
                return 3

            def get_all_labels(self, task):
                return {"a": np.array([0, -1, 1]),
                        "b": np.array([1, 1, -1])}[task]
        w = tu.build_per_sample_weights(DS(), ["a", "b"],
                                        {"a": [2, 2], "b": [8]}, beta=1.0)
        # raw: [1/4+1/8, 1/8, 1/4] → normalized mean ~1
        raw = np.array([0.375, 0.125, 0.25])
        np.testing.assert_allclose(w, raw / raw.mean(), rtol=1e-5)


class TestRunningMeans:
    def test_ema_update(self):
        rm = RunningMeans(["a", "b"], alpha=0.5)
        rm.update_by_idx(1.0, 0)
        assert rm.get("a") == 1.0           # first value initializes
        rm.update_by_idx(3.0, 0)
        assert rm.get("a") == pytest.approx(2.0)
        assert rm.get("b") is None

    def test_save_load_roundtrip(self, tmp_path):
        rm = RunningMeans(["a"], alpha=0.9)
        rm.update_by_idx(2.0, 0)
        rm.update_by_idx(4.0, 0)
        p = tmp_path / "ema.json"
        rm.save_history(p)
        rm2 = RunningMeans(["a"], alpha=0.9)
        rm2.load_history(p)
        assert rm2.get("a") == rm.get("a")


class TestUncertaintyWeighter:
    def test_combine_formula(self):
        uw = UncertaintyWeighter(["a", "b"], init_log_var=0.0)
        lv = uw.init_params()
        losses = {"a": jnp.asarray(2.0), "b": jnp.asarray(4.0)}
        total = float(UncertaintyWeighter.combine(lv, losses))
        assert total == pytest.approx(6.0)      # exp(0)=1, +0.5*0
        lv = {"a": jnp.asarray(float(np.log(4.0))), "b": jnp.asarray(0.0)}
        total = float(UncertaintyWeighter.combine(lv, losses))
        assert total == pytest.approx(0.25 * 2 + 0.5 * np.log(4.0) + 4.0)


class TestCheckpointHelpers:
    def test_state_roundtrip(self, tmp_path):
        blob = {"model": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                "note": "hello"}
        p = tmp_path / "model.msgpack"
        tu.save_state(p, blob)
        out = tu.load_state(p)
        np.testing.assert_array_equal(out["model"]["w"], blob["model"]["w"])
        assert out["note"] == "hello"

    def test_load_missing_returns_none(self, tmp_path):
        assert tu.load_state(tmp_path / "nope.msgpack") is None


class TestTypedBatch:
    def test_dict_batch_counts(self):
        from vlm_tpu.probing.train.data import Batch
        b = Batch(["i1", "i2", "i3"],
                  [{"gender": 1, "age": -1}, {"gender": -1},
                   {"gender": 0, "age": 3}], kind="dicts")
        assert b.valid_counts(["gender", "age"]) == {"gender": 2, "age": 1}
        # tuple-style unpacking still works
        inputs, targets = b
        assert inputs == ["i1", "i2", "i3"] and len(targets) == 3

    def test_array_batch_counts(self):
        import numpy as np

        from vlm_tpu.probing.train.data import Batch
        b = Batch(np.zeros((4, 8)), np.asarray([0, -1, 2, 1]), kind="array")
        assert b.valid_counts(["gender"]) == {"gender": 3}

    def test_loaders_yield_typed_batches(self):
        import numpy as np

        from vlm_tpu.probing.train.data import ArrayBatchLoader, Batch
        loader = ArrayBatchLoader(np.zeros((5, 3)), np.asarray(
            [0, 1, -1, 2, 0]), batch_size=3)
        batches = list(loader)
        assert all(isinstance(b, Batch) and b.kind == "array"
                   for b in batches)
