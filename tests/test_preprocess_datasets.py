"""Offline dataset preprocessing tests (val-split creation + class counts)."""

import json

import numpy as np
import pytest

from tests.conftest import make_face_dataset
from vlm_tpu.data import preprocess_face_datasets as prep
from vlm_tpu.data.face_dataset import FaceDataset


def _mk_train_only(base, name, n=20, identities=None):
    rows = []
    for i in range(n):
        rows.append({"gender": i % 2, "age": 10 + i, "ethnicity": i % 4,
                     "emotion": i % 7,
                     "identity": identities[i] if identities else f"id{i}"})
    make_face_dataset(base, name, "train", rows)
    return base / name


class TestPathHelpers:
    def test_extract_rel_variants(self):
        f = prep.extract_rel_inside_images
        assert f("datasets_with_standard_labels\\X\\train\\images\\a\\b") \
            == prep.Path("a/b")
        assert f("/abs/path/images/sub/img.jpg") == prep.Path("sub/img.jpg")
        assert f("sub/img") == prep.Path("sub/img")

    def test_build_csv_path(self):
        s = prep.build_csv_path_for_split("DS", "val", prep.Path("a/b"))
        assert s == "datasets_with_standard_labels\\DS\\val\\images\\a\\b"


class TestValSplit:
    def test_creates_val_move_only(self, tmp_path):
        # The rewritten CSV paths carry a literal
        # 'datasets_with_standard_labels\\' prefix that only resolves when
        # the base dir has that name — exactly the reference's contract
        # (its BASE_PATH is ~/datasets_with_standard_labels).
        base = tmp_path / "datasets_with_standard_labels"
        ds_dir = _mk_train_only(base, "TestDataset", n=20)
        n_train_imgs = len(list((ds_dir / "train" / "images").iterdir()))
        assert n_train_imgs == 20

        assert prep.create_val_split_if_missing(ds_dir, seed=42)
        val_imgs = list((ds_dir / "val" / "images").rglob("*.jpg"))
        train_imgs = list((ds_dir / "train" / "images").rglob("*.jpg"))
        assert len(val_imgs) == 4           # 20% of 20
        assert len(train_imgs) == 16        # moved, not copied
        # CSVs rewritten extension-less with the logical backslash prefix
        line = (ds_dir / "val" / "labels.csv").read_text().splitlines()[1]
        assert line.startswith("datasets_with_standard_labels\\TestDataset"
                               "\\val\\images\\")
        assert ".jpg" not in line.split(",")[0]
        # the rewritten datasets still load through FaceDataset
        for split in ("train", "val"):
            ds = FaceDataset("TestDataset", split=split, base_path=base)
            assert len(ds) == (16 if split == "train" else 4)

    def test_existing_val_untouched(self, tmp_path):
        base = tmp_path / "ds"
        ds_dir = _mk_train_only(base, "TestDataset", n=10)
        make_face_dataset(base, "TestDataset", "val",
                          [{"gender": 0, "age": 30.0, "ethnicity": 0,
                            "emotion": 0}])
        assert prep.create_val_split_if_missing(ds_dir, seed=0)
        assert len(list((ds_dir / "train" / "images").iterdir())) == 10

    def test_identity_grouped_split_for_vggface2(self, tmp_path):
        base = tmp_path / "ds"
        idents = [f"person{i // 4}" for i in range(20)]   # 5 identities x 4
        ds_dir = _mk_train_only(base, "VggFace2-Train", n=20,
                                identities=idents)
        assert prep.create_val_split_if_missing(ds_dir, seed=1)
        # All rows of an identity land on the same side.
        import csv
        sides = {}
        for split in ("train", "val"):
            with open(ds_dir / split / "labels.csv") as f:
                for row in csv.DictReader(f):
                    ident = row["Identity"]
                    assert sides.setdefault(ident, split) == split

    def test_split_deterministic(self, tmp_path):
        paths = []
        for sub in ("a", "b"):
            base = tmp_path / sub
            ds_dir = _mk_train_only(base, "TestDataset", n=20)
            prep.create_val_split_if_missing(ds_dir, seed=7)
            paths.append(sorted(
                p.name for p in (ds_dir / "val" / "images").rglob("*.jpg")))
        assert paths[0] == paths[1]


class TestClassCounts:
    def test_counts_and_age_binning(self, tmp_path):
        base = tmp_path / "ds"
        ds_dir = _mk_train_only(base, "TestDataset", n=20)
        counts = prep.count_classes_for_train(ds_dir)
        assert counts["gender"] == {"0": 10, "1": 10}
        # ages 10..29 → bins 2 (10-19) and 3 (20-29)
        assert counts["age"] == {"2": 10, "3": 10}
        saved = json.loads(
            (ds_dir / "train" / "class_counts.json").read_text())
        assert saved == counts
        # the dense reader consumes it
        ds = FaceDataset("TestDataset", split="train", base_path=base)
        assert ds.get_train_class_counts("age") == [0, 0, 10, 10]

    def test_age_string_bins_and_numeric_years(self):
        assert prep.age_to_class("3-9") == 1
        assert prep.age_to_class("70+") == 8
        assert prep.age_to_class("7") == 1      # 7 *years* → bin 1, not class 7
        assert prep.age_to_class(25.0) == 3
        assert prep.age_to_class("garbage") == -1

    def test_main_cli(self, tmp_path, capsys):
        base = tmp_path / "ds"
        _mk_train_only(base, "TestDataset", n=10)
        prep.main(["--base", str(base), "--seed", "0"])
        out = capsys.readouterr().out
        assert "Splits created/verified: 1" in out
        assert (base / "TestDataset" / "val").exists()
