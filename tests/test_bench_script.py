"""Guard the driver-facing bench artifact: bench.py must emit exactly one
valid JSON line on stdout (tiny model, CPU backend) — in every exit path,
including budget exhaustion and a driver SIGTERM (VERDICT r4 item 1)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from tests.conftest import REPO_ROOT

pytestmark = pytest.mark.slow

TINY_ENV = {
    "VLM_TPU_PLATFORM": "cpu",
    "VLM_TPU_PALLAS_INTERPRET": "1",
    "VLM_TPU_BENCH_SIZE": "test",
    "VLM_TPU_BENCH_N": "4",
    "VLM_TPU_BENCH_BATCH": "2",
    "VLM_TPU_BENCH_TOKENS": "3",
    "VLM_TPU_BENCH_SEQ_N": "0",
}


def _one_json_line(stdout):
    lines = [l for l in stdout.splitlines() if l.strip()]
    assert len(lines) == 1, stdout
    return json.loads(lines[0])


@pytest.mark.parametrize("prompt_ids", ["0", "12"])
def test_bench_emits_one_json_line(prompt_ids):
    # prompt_ids="12" exercises the realistic-tokenization variant
    # (VLM_TPU_BENCH_PROMPT_IDS replaces the text halves with n ids).
    env = dict(os.environ)
    env.update({
        "VLM_TPU_PLATFORM": "cpu",
        "VLM_TPU_PALLAS_INTERPRET": "1",
        "VLM_TPU_BENCH_SIZE": "test",
        "VLM_TPU_BENCH_N": "4",
        "VLM_TPU_BENCH_BATCH": "2",
        "VLM_TPU_BENCH_TOKENS": "3",
        # the override variant also exercises the sequential baseline so
        # the batch-1 engine runs on the SAME overridden prompt rows
        "VLM_TPU_BENCH_SEQ_N": "0" if prompt_ids == "0" else "1",
        "VLM_TPU_BENCH_PROMPT_IDS": prompt_ids,
    })
    res = subprocess.run([sys.executable, str(REPO_ROOT / "bench.py")],
                         capture_output=True, text=True, timeout=420,
                         env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    # Strict contract: stdout carries EXACTLY one line, and it is JSON —
    # library status prints must ride stderr (bench.py redirects them).
    lines = [l for l in res.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, res.stdout
    payload = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline",
            "p50_latency_ms", "p99_latency_ms",
            "reps_img_s", "median_img_s", "headline_policy"} <= set(payload)
    assert payload["value"] > 0
    assert payload["p50_latency_ms"] > 0
    assert payload["unit"] == "images/sec"
    # reporting hygiene: every rep recorded, median consistent with reps
    assert len(payload["reps_img_s"]) >= 1
    assert min(payload["reps_img_s"]) <= payload["median_img_s"] \
        <= max(payload["reps_img_s"])


def test_bench_multi_regime_rows():
    """VLM_TPU_BENCH_REGIMES measures several prompt regimes in one
    process: first regime is the top-level headline, extras ride a
    "regimes" array with their own full measurement rows."""
    env = dict(os.environ)
    env.update(TINY_ENV)
    env["VLM_TPU_BENCH_REGIMES"] = "0,12"
    res = subprocess.run([sys.executable, str(REPO_ROOT / "bench.py")],
                         capture_output=True, text=True, timeout=420,
                         env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    payload = _one_json_line(res.stdout)
    assert payload["prompt_ids"] == 0
    assert payload["value"] > 0
    (extra,) = payload["regimes"]
    assert extra["prompt_ids"] == 12
    assert extra["value"] > 0
    assert extra["p50_latency_ms"] > 0


def test_bench_budget_skips_regimes_explicitly():
    """An exhausted budget records skipped regimes instead of running past
    the deadline — truncation is explicit, never silent."""
    env = dict(os.environ)
    env.update(TINY_ENV)
    env["VLM_TPU_BENCH_REGIMES"] = "0,12"
    env["VLM_TPU_BENCH_BUDGET_S"] = "10"  # enough for regime 0 only
    res = subprocess.run([sys.executable, str(REPO_ROOT / "bench.py")],
                         capture_output=True, text=True, timeout=420,
                         env=env)
    assert res.returncode == 0, res.stderr[-3000:]
    payload = _one_json_line(res.stdout)
    assert payload["value"] > 0  # headline always completes
    (extra,) = payload["regimes"]
    assert extra == {"prompt_ids": 12, "skipped": "budget"}


def test_bench_sigterm_still_emits_json():
    """A driver SIGTERM (timeout's first strike) yields a parseable JSON
    line via the signal handler instead of an empty stdout."""
    env = dict(os.environ)
    env.update(TINY_ENV)
    # Long-running config so SIGTERM lands mid-measurement.
    env.update({"VLM_TPU_BENCH_N": "400", "VLM_TPU_BENCH_TOKENS": "40",
                "VLM_TPU_BENCH_REPS": "50"})
    proc = subprocess.Popen([sys.executable, str(REPO_ROOT / "bench.py")],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, env=env)
    time.sleep(20)  # past jax init; mid compile/measure either way
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    payload = _one_json_line(out)
    assert "terminated" in payload
    assert payload["terminated"].startswith("signal 15")


def _tiny_variant(label, extra_env=None):
    env = dict(TINY_ENV)
    env["VLM_TPU_PLATFORM"] = "cpu"
    env.update(extra_env or {})
    return {"label": label, "recipe": "tiny test recipe", "env": env}


def test_run_variants_child_row_parses(monkeypatch):
    """run_variants: a child that fits the budget yields a parsed row with
    the measurement fields and its observed wall time."""
    import bench

    monkeypatch.setattr(bench, "VARIANTS", [_tiny_variant("v_ok")])
    monkeypatch.setattr(bench, "MIN_VARIANT_S", 30.0)
    monkeypatch.setattr(bench, "BUDGET_S", bench.elapsed() + 300.0)
    rows = bench.run_variants()
    (ok,) = rows
    assert ok["label"] == "v_ok"
    assert ok.get("value", 0) > 0, ok
    assert "wall_s" in ok


def test_run_variants_budget_skip_is_explicit(monkeypatch):
    """A variant whose cost estimate exceeds the remaining budget is
    recorded as a skipped row — never launched, never silent."""
    import bench

    monkeypatch.setattr(bench, "VARIANTS", [_tiny_variant("v_skipped")])
    monkeypatch.setattr(bench, "MIN_VARIANT_S", 200.0)
    monkeypatch.setattr(bench, "BUDGET_S", bench.elapsed() + 100.0)
    t0 = time.monotonic()
    rows = bench.run_variants()
    (skipped,) = rows
    assert skipped["label"] == "v_skipped"
    assert skipped["skipped"].startswith("budget")
    assert time.monotonic() - t0 < 5  # skipped, not run


def test_run_variants_deadline_sigterm_preserves_child_row(monkeypatch):
    """The parent's absolute deadline SIGTERMs an over-running child and
    still collects its partial-but-parseable row — the round-5 fix for the
    parent leaking past BUDGET_S behind a slack child backstop."""
    import bench

    # The child's internal budget can truncate BETWEEN reps (and then it
    # finishes inside the deadline on its own — the well-behaved path the
    # other tests cover), so force a single rep far longer than the
    # deadline: only the parent's SIGTERM can end it.
    slow = _tiny_variant("v_deadline", {
        "VLM_TPU_BENCH_N": "20000", "VLM_TPU_BENCH_TOKENS": "40",
        "VLM_TPU_BENCH_REPS": "2"})
    monkeypatch.setattr(bench, "VARIANTS", [slow])
    monkeypatch.setattr(bench, "MIN_VARIANT_S", 1.0)
    monkeypatch.setattr(bench, "EXIT_SLACK_S", 5.0)
    monkeypatch.setattr(bench, "BUDGET_S", bench.elapsed() + 25.0)
    t0 = time.monotonic()
    rows = bench.run_variants()
    wall = time.monotonic() - t0
    (row,) = rows
    assert row["label"] == "v_deadline"
    # Either the child's handler emitted its partial JSON (parsed →
    # deadline_hit marker) or the child died pre-handler (error record).
    assert "deadline_hit" in row or "error" in row, row
    if "deadline_hit" in row:
        assert "terminated" in row, row  # child signal-handler marker
    # Parent honored the absolute deadline: ~30 s deadline floor +
    # 15 s SIGTERM grace + margin.
    assert wall < 75, wall
