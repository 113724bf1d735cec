"""Age-regression flow: dataset regression labels → evaluator MAE path."""

import json

import pytest

from tests.conftest import make_face_dataset
from vlm_tpu.data.face_dataset import FaceDataset
from vlm_tpu.evaluation import Evaluator


def test_regression_end_to_end(tmp_path):
    base = tmp_path / "ds"
    rows = [{"gender": 0, "age": 25.5, "ethnicity": 0, "emotion": 3},
            {"gender": 1, "age": 60.0, "ethnicity": 1, "emotion": 6}]
    make_face_dataset(base, "TestDataset", "test", rows)
    ds = FaceDataset("TestDataset", split="test", base_path=base,
                     age_is_regression=True)
    gts = ds.labels_list()
    assert gts[0]["age"] == 25.5

    # simulated VLM answers parsed in regression mode
    preds = [ds.get_labels_from_text_output("male, 20.5, caucasian, happiness"),
             ds.get_labels_from_text_output("female, 70, african american, neutral")]
    assert preds[0]["age"] == 20.5

    out = tmp_path / "eval"
    Evaluator.evaluate(preds, gts, out, dataset_name="TestDataset")
    m = json.loads((out / "metrics.json").read_text())
    assert m["age"]["mode"] == "regression"
    assert m["age"]["mae"] == pytest.approx((5.0 + 10.0) / 2)
    # classification tasks still scored alongside
    assert m["gender"]["accuracy"] == 1.0
