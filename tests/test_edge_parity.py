"""Edge-case parity tests for reference quirks not covered elsewhere."""

import json

import pytest

from vlm_tpu.data import DatasetFactory, FaceDataset
from vlm_tpu.data.dataset_factory import aggregate_counts_from_datasets


class TestClassCountsEdges:
    def test_corrupt_counts_json_returns_none(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        counts_file = face_base / "TestDataset" / "train" / \
            "class_counts.json"
        counts_file.write_text("{ not json")
        assert ds.get_train_class_counts("gender") is None

    def test_non_dict_task_entry_returns_none(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        counts_file = face_base / "TestDataset" / "train" / \
            "class_counts.json"
        counts_file.write_text(json.dumps({"gender": [1, 2]}))
        assert ds.get_train_class_counts("gender") is None

    def test_negative_keys_ignored(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        counts_file = face_base / "TestDataset" / "train" / \
            "class_counts.json"
        counts_file.write_text(json.dumps({"gender": {"-1": 99, "1": 5}}))
        assert ds.get_train_class_counts("gender") == [0, 5]

    def test_aggregate_all_zero_returns_none(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        counts_file = face_base / "TestDataset" / "train" / \
            "class_counts.json"
        counts_file.write_text(json.dumps({"gender": {"0": 0, "1": 0}}))
        assert aggregate_counts_from_datasets(ds, "gender") is None


class TestRegistryGuards:
    def test_duplicate_registration_raises(self):
        class Dup:
            @staticmethod
            def get_available_datasets():
                return ["MiviaPar"]        # already registered
        with pytest.raises(ValueError, match="already registered"):
            DatasetFactory.register_dataset_class(Dup)

    def test_registration_requires_listing(self):
        class NoList:
            pass
        with pytest.raises(ValueError,
                           match="get_available_datasets"):
            DatasetFactory.register_dataset_class(NoList)


class TestSplitValidation:
    def test_invalid_split_rejected(self, face_base):
        with pytest.raises(ValueError, match="invalid split"):
            FaceDataset("TestDataset", split="dev", base_path=face_base)

    def test_split_case_insensitive(self, face_base):
        ds = FaceDataset("TestDataset", split="TRAIN", base_path=face_base)
        assert ds.split == "train"


class TestEvaluatorEdges:
    def test_invalid_forced_age_mode_falls_to_regression(self, tmp_path):
        from vlm_tpu.evaluation import Evaluator
        preds = [{"age": 3}]
        gts = [{"age": 4}]
        Evaluator.evaluate(preds, gts, tmp_path / "o",
                           dataset_name="FairFace", age_mode="bogus")
        m = json.loads((tmp_path / "o" / "metrics.json").read_text())
        assert m["age"]["mode"] == "regression"

    def test_mixed_int_float_age_is_regression(self, tmp_path):
        from vlm_tpu.evaluation import Evaluator
        preds = [{"age": 3}, {"age": 4.5}]
        gts = [{"age": 3}, {"age": 4}]
        Evaluator.evaluate(preds, gts, tmp_path / "o2",
                           dataset_name="FairFace")
        m = json.loads((tmp_path / "o2" / "metrics.json").read_text())
        assert m["age"]["mode"] == "regression"
