"""Multi-process distributed test: 2 local processes over the CPU backend.

Validates the real ``jax.distributed.initialize`` path
(`vlm_tpu/parallel/distributed.py`) end-to-end: cluster formation, global
mesh over per-process devices, ``process_local_slice`` feeding, and a
data-parallel train step whose loss is reduced by cross-process collectives
(Gloo). Both processes must compute the identical global loss, which must
also equal a single-process numpy reference.

SURVEY.md §5 "Distributed communication backend" — the reference has none;
this is the TPU-native equivalent, tested without TPU hardware.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO_ROOT = Path(__file__).resolve().parent.parent
WORKER = REPO_ROOT / "tests" / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_loss() -> float:
    """Single-process recomputation of the worker's first global loss."""
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (8, 16)).astype(np.float32)
    y = rng.integers(0, 4, (8,)).astype(np.int32)
    w = np.random.default_rng(1).normal(0, 0.1, (16, 4)).astype(np.float32)
    logits = x @ w
    logits -= logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return float(-np.mean(logp[np.arange(8), y]))


def test_two_process_dp_train_step():
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, str(WORKER), str(i), "2",
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, cwd=str(REPO_ROOT))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    def grab(out, key):
        for line in out.splitlines():
            if line.startswith(key + "="):
                return line.split("=", 1)[1]
        raise AssertionError(f"{key} missing in:\n{out}")

    # both processes computed the same GLOBAL losses (collectives worked)
    l0 = [float(grab(o, "LOSS0")) for o in outs]
    l1 = [float(grab(o, "LOSS1")) for o in outs]
    assert l0[0] == pytest.approx(l0[1], abs=1e-7)
    assert l1[0] == pytest.approx(l1[1], abs=1e-7)
    # the second step actually trained (loss moved)
    assert l1[0] != pytest.approx(l0[0], abs=1e-6)
    # and the distributed loss equals the single-process reference
    assert l0[0] == pytest.approx(_reference_loss(), abs=1e-5)
    # each process fed a distinct slice
    slices = sorted(grab(o, "SLICE") for o in outs)
    assert slices == ["0:4", "4:8"]
    assert all("DONE" in o for o in outs)
