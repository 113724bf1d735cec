"""Dataset layer tests: disk layout, label loading, composition, factory."""

import json

import numpy as np
import pytest

from vlm_tpu.data import (BalancedMultiTaskDataset, DatasetFactory,
                          FaceDataset, MiviaParDataset, MultiTaskDataset)


class TestFaceDataset:
    def test_load_and_getitem(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        assert len(ds) == 6
        img, labels = ds[0]
        assert img.mode == "RGB"
        assert labels == {"gender": 0, "age": 3, "ethnicity": 0,
                          "emotion": 3, "identity": "a"}

    def test_missing_fields_become_minus_one(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        _, labels = ds[3]
        assert labels["gender"] == -1 and labels["age"] == -1
        assert labels["ethnicity"] == -1 and labels["emotion"] == -1
        assert labels["identity"] == "-1"

    def test_age_bins(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        ages = [s["labels"]["age"] for s in ds.samples]
        assert ages == [3, 1, 8, -1, 4, 2]

    def test_age_regression(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base,
                         age_is_regression=True)
        assert ds.samples[0]["labels"]["age"] == 25.0

    def test_extensionless_paths_probed(self, tmp_path):
        from tests.conftest import make_face_dataset
        base = tmp_path / "d2"
        make_face_dataset(base, "TestDataset", "test",
                          [{"gender": 1, "age": 30.0, "ethnicity": 0,
                            "emotion": 6}], extensionless=True)
        ds = FaceDataset("TestDataset", split="test", base_path=base)
        assert len(ds) == 1

    def test_unsupported_name_raises(self, face_base):
        with pytest.raises(ValueError):
            FaceDataset("NopeDataset", base_path=face_base)

    def test_missing_split_raises(self, face_base):
        import shutil
        shutil.rmtree(face_base / "TestDataset" / "val")
        with pytest.raises(FileNotFoundError):
            FaceDataset("TestDataset", split="val", base_path=face_base)

    def test_class_counts(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        # "-1" key ignored; dense list padded to max idx + 1.
        assert ds.get_train_class_counts("age") == [0, 1, 1, 1, 1, 0, 0, 0, 1]
        assert ds.get_train_class_counts("gender") == [2, 3]
        assert ds.get_train_class_counts("nope") is None

    def test_bulk_accessors(self, face_base):
        ds = FaceDataset("TestDataset", split="train", base_path=face_base)
        paths = ds.image_paths()
        assert len(paths) == 6 and all(p.exists() for p in paths)
        assert len(ds.labels_list()) == 6


class TestMiviaParDataset:
    def test_load(self, mivia_base):
        ds = MiviaParDataset("MiviaPar", split="test", base_path=mivia_base)
        assert len(ds) == 4
        labels = [s["labels"] for s in ds.samples]
        assert labels[0] == {"upper": 1, "lower": 2, "gender": 0,
                             "bag": 1, "hat": 0}
        assert labels[2] == {"upper": 3, "lower": 4, "gender": 0,
                             "bag": 1, "hat": 0}
        assert labels[3]["lower"] == -1  # unknown color


class TestMultiTaskDataset:
    def _two_ds(self, face_base, mivia_base):
        f = FaceDataset("TestDataset", split="train", base_path=face_base)
        m = MiviaParDataset("MiviaPar", split="train", base_path=mivia_base)
        return f, m

    def test_concat_and_labels(self, face_base, mivia_base):
        f, m = self._two_ds(face_base, mivia_base)
        mtd = MultiTaskDataset([f, m], tasks=["gender", "age"])
        assert len(mtd) == len(f) + len(m)
        g = mtd.get_all_labels("gender")
        assert g.shape == (len(mtd),)
        assert list(g[:6]) == [0, 1, 1, -1, 0, 1]
        # float ages truncate to int; negatives → -1
        a = mtd.get_all_labels("age")
        assert list(a[:6]) == [3, 1, 8, -1, 4, 2]
        # MiviaPar has no "age" → all -1
        assert all(v == -1 for v in a[6:])

    def test_getitem_crosses_boundary(self, face_base, mivia_base):
        f, m = self._two_ds(face_base, mivia_base)
        mtd = MultiTaskDataset([f, m], tasks=["gender"])
        img, labels = mtd[len(f)]          # first MiviaPar sample
        assert "upper" in labels

    def test_counts_aggregation(self, face_base, mivia_base):
        f, m = self._two_ds(face_base, mivia_base)
        mtd = MultiTaskDataset([f, m], tasks=["gender"])
        counts = mtd.get_train_class_counts("gender")
        assert list(counts) == [2, 3]


class TestBalancedMultiTaskDataset:
    def test_duplication_reaches_fraction(self, face_base):
        f = FaceDataset("TestDataset", split="train", base_path=face_base)
        mtd = MultiTaskDataset([f], tasks=["emotion"])
        # 5/6 valid already ≥ 0.5 → no duplication
        b = BalancedMultiTaskDataset(mtd, tasks=["emotion"],
                                     desired_fractions={"emotion": 0.5},
                                     random_seed=0)
        assert len(b) == 6
        # Request 0.9: to_add = round((0.9*6-5)/0.1) = 4
        b = BalancedMultiTaskDataset(mtd, tasks=["emotion"],
                                     desired_fractions={"emotion": 0.9},
                                     random_seed=0)
        assert len(b) == 10
        # all duplicates must be valid-emotion samples
        lab = b.get_all_labels("emotion")
        dup_flags = [d for _, d in b.extended_index()]
        for v, is_dup in zip(lab, dup_flags):
            if is_dup:
                assert v != -1

    def test_seed_determinism(self, face_base):
        f = FaceDataset("TestDataset", split="train", base_path=face_base)
        mtd = MultiTaskDataset([f], tasks=["emotion"])
        mk = lambda: BalancedMultiTaskDataset(
            mtd, tasks=["emotion"], desired_fractions={"emotion": 0.9},
            random_seed=7).extended_index()
        assert mk() == mk()

    def test_invalid_fraction_raises(self, face_base):
        f = FaceDataset("TestDataset", split="train", base_path=face_base)
        mtd = MultiTaskDataset([f], tasks=["emotion"])
        with pytest.raises(ValueError):
            BalancedMultiTaskDataset(mtd, tasks=["emotion"],
                                     desired_fractions={"emotion": 1.5})

    def test_duplicate_transform_only_on_dups(self, face_base):
        f = FaceDataset("TestDataset", split="train", base_path=face_base)
        mtd = MultiTaskDataset([f], tasks=["emotion"])
        marker = []
        b = BalancedMultiTaskDataset(
            mtd, tasks=["emotion"], desired_fractions={"emotion": 0.9},
            duplicate_transform=lambda x: (marker.append(1), x)[1],
            random_seed=0)
        n_dups = sum(1 for _, d in b.extended_index() if d)
        for i in range(len(b)):
            b[i]
        assert len(marker) == n_dups


class TestDatasetFactory:
    def test_registry(self):
        names = DatasetFactory.get_available_datasets()
        assert "MiviaPar" in names and "TestDataset" in names

    def test_create_dataset(self, face_base):
        ds = DatasetFactory.create_dataset("TestDataset", split="test",
                                           base_path=face_base)
        assert isinstance(ds, FaceDataset)

    def test_unknown_dataset_raises(self):
        with pytest.raises(ValueError):
            DatasetFactory.create_dataset("Unknown")

    def test_task_map_loaded_from_yaml(self):
        DatasetFactory.load_task_map()
        assert DatasetFactory.TASK_TO_DATASETS_TEST["emotion"] == ["RAF-DB"]

    def test_multi_task_dedup(self, face_base, tmp_path, monkeypatch):
        # Custom task map where two tasks share a dataset → instantiated once.
        cfg_dir = tmp_path / "configs"
        cfg_dir.mkdir()
        (cfg_dir / "task_datasets.yaml").write_text(
            "train:\n"
            "  gender: [\"TestDataset\"]\n"
            "  emotion: [\"TestDataset\"]\n")
        monkeypatch.setenv("VLM_TPU_ROOT", str(tmp_path))
        try:
            DatasetFactory.load_task_map(force=True)
            mtd, counts = DatasetFactory.create_multi_task_dataset(
                tasks=["gender", "emotion"], split="train",
                base_path=face_base)
            assert len(mtd.datasets) == 1
            assert list(counts["gender"]) == [2, 3]
        finally:
            monkeypatch.undo()
            DatasetFactory.load_task_map(force=True)

    def test_unknown_task_raises(self, face_base):
        DatasetFactory.load_task_map(force=True)
        with pytest.raises(ValueError):
            DatasetFactory.create_multi_task_dataset(
                tasks=["upper"], split="train", base_path=face_base)
