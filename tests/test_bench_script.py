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
