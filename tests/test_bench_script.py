"""Guard the driver-facing bench artifact: bench.py must emit exactly one
valid JSON line on stdout (tiny model, CPU backend)."""

import json
import os
import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT

pytestmark = pytest.mark.slow


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
