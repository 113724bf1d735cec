"""Evaluator tests: metric math, artifact schema, and golden regression
against the reference's committed metrics.json artifacts.

The golden preds/gts/metrics dumps are vendored (gzipped, byte-verbatim)
under ``tests/goldens/eval`` so the regression suite runs in a bare clone;
when the reference repo is mounted at ``/root/reference`` an extra test
cross-checks the vendored bytes against the originals
(`/root/reference/datasets_vlm/evaluate_dataset.py:31-32` is what dumps
them)."""

import gzip
import json
from pathlib import Path

import pytest

from vlm_tpu.evaluation import Evaluator

REF_EVAL = Path("/root/reference/probing/linear_probing/eval")
GOLDENS = Path(__file__).parent / "goldens" / "eval"


def _read(p):
    return json.loads(Path(p).read_text())


def _read_golden(case_dir: Path, name: str):
    return json.loads(gzip.decompress((case_dir / (name + ".gz"))
                                      .read_bytes()))


class TestFaceEvaluation:
    def test_classification_metrics(self, tmp_path):
        preds = [{"gender": 0}, {"gender": 1}, {"gender": 1}, {"gender": 0}]
        gts = [{"gender": 0}, {"gender": 1}, {"gender": 0}, {"gender": -1}]
        out = tmp_path / "out"
        Evaluator.evaluate(preds, gts, out, dataset_name="LFW")
        m = _read(out / "metrics.json")
        # gt=-1 skipped → 3 kept, 2 correct
        assert m["gender"]["accuracy"] == pytest.approx(2 / 3)
        assert m["gender"]["labels"] == [0, 1]
        assert m["average_accuracy"] == pytest.approx(2 / 3)
        assert (out / "preds.json").exists()
        assert (out / "gts.json").exists()
        assert (out / "confusion_matrix_gender.png").exists()

    def test_age_auto_classification(self, tmp_path):
        preds = [{"age": 3}, {"age": 5}]
        gts = [{"age": 3}, {"age": 4}]
        out = tmp_path / "o2"
        Evaluator.evaluate(preds, gts, out, dataset_name="FairFace")
        m = _read(out / "metrics.json")
        assert m["age"]["mode"] == "classification"
        assert m["age"]["accuracy"] == pytest.approx(0.5)
        assert m["age"]["labels"][0] == "0-2"
        assert (out / "confusion_matrix_age.png").exists()

    def test_age_auto_regression(self, tmp_path):
        preds = [{"age": 25.5}, {"age": 60.0}]
        gts = [{"age": 20.5}, {"age": 70.0}]
        out = tmp_path / "o3"
        Evaluator.evaluate(preds, gts, out, dataset_name="FairFace")
        m = _read(out / "metrics.json")
        assert m["age"]["mode"] == "regression"
        assert m["age"]["mae"] == pytest.approx(7.5)
        assert m["average_accuracy"] is None

    def test_age_forced_mode(self, tmp_path):
        preds = [{"age": 3}, {"age": 5}]
        gts = [{"age": 3}, {"age": 4}]
        out = tmp_path / "o4"
        Evaluator.evaluate(preds, gts, out, dataset_name="FairFace",
                           age_mode="regression")
        m = _read(out / "metrics.json")
        assert m["age"]["mode"] == "regression"
        assert m["age"]["mae"] == pytest.approx(0.5)

    def test_unknown_dataset_raises(self, tmp_path):
        with pytest.raises(ValueError):
            Evaluator.evaluate([], [], tmp_path / "x", dataset_name="Wat")


class TestMiviaEvaluation:
    def test_multi_task_metrics(self, tmp_path):
        preds = [
            {"upper": 1, "lower": 2, "gender": 0, "bag": 1, "hat": 0},
            {"upper": 9, "lower": 2, "gender": 1, "bag": 0, "hat": 0},
        ]
        gts = [
            {"upper": 1, "lower": 2, "gender": 0, "bag": 1, "hat": 1},
            {"upper": 1, "lower": 2, "gender": 1, "bag": -1, "hat": 0},
        ]
        out = tmp_path / "mp"
        Evaluator.evaluate(preds, gts, out, dataset_name="MiviaPar")
        m = _read(out / "metrics.json")
        assert m["upper"]["accuracy"] == pytest.approx(0.5)
        assert m["gender"]["accuracy"] == 1.0
        assert m["bag"]["accuracy"] == 1.0     # second sample skipped (gt=-1)
        assert m["hat"]["accuracy"] == pytest.approx(0.5)
        tasks = ["upper", "lower", "gender", "bag", "hat"]
        expect = (0.5 + 1.0 + 1.0 + 1.0 + 0.5) / 5
        assert m["average_accuracy"] == pytest.approx(expect)
        for t in tasks:
            assert (out / f"confusion_matrix_{t}.png").exists()


class TestGoldenRegression:
    """Recompute metrics from the reference's committed preds/gts dumps
    (vendored under tests/goldens/eval) and check our Evaluator reproduces
    its committed metrics.json exactly. Self-contained: runs in a bare
    clone, no reference mount needed."""

    # Every vendored golden case.
    CASES = sorted(
        (run.name, task.name, ds.name)
        for run in GOLDENS.iterdir() if run.is_dir()
        for task in run.iterdir() if task.is_dir()
        for ds in task.iterdir()
        if (ds / "preds.json.gz").exists() and (ds / "gts.json.gz").exists()
    ) if GOLDENS.exists() else []

    def test_goldens_vendored(self):
        assert len(self.CASES) >= 16, \
            "vendored golden set missing or truncated"

    @pytest.mark.skipif(not REF_EVAL.exists(),
                        reason="reference artifacts not mounted")
    def test_vendored_bytes_match_reference(self):
        """Optional cross-check: the vendored gzips decompress to the
        reference's committed artifact bytes, verbatim."""
        for run, task, ds in self.CASES:
            src = REF_EVAL / run / task / ds
            dst = GOLDENS / run / task / ds
            for name in ("preds.json", "gts.json", "metrics.json"):
                assert gzip.decompress((dst / (name + ".gz")).read_bytes()) \
                    == (src / name).read_bytes(), f"{run}/{task}/{ds}/{name}"

    @pytest.mark.parametrize("run,task,ds", CASES)
    def test_metrics_match_reference(self, tmp_path, run, task, ds):
        src = GOLDENS / run / task / ds
        preds = _read_golden(src, "preds.json")
        gts = _read_golden(src, "gts.json")
        ref_metrics = _read_golden(src, "metrics.json")
        out = tmp_path / run / task / ds
        Evaluator.evaluate(preds, gts, out, dataset_name=ds,
                           age_mode="classification")
        got = _read(out / "metrics.json")
        if task == "age":
            assert got["age"]["accuracy"] == pytest.approx(
                ref_metrics["age"]["accuracy"], abs=1e-12)
        else:
            assert got[task]["accuracy"] == pytest.approx(
                ref_metrics[task]["accuracy"], abs=1e-12)
            assert got[task]["labels"] == ref_metrics[task]["labels"]
        assert got["average_accuracy"] == pytest.approx(
            ref_metrics["average_accuracy"], abs=1e-12)
