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


def test_two_process_tp_generation():
    """2 processes × 2 local devices, mesh (data=2, model=2) with the TP
    axis SPANNING processes: wave generation + continuous batcher must emit
    tokens identical across processes and to a single-process run — the
    deploy path for decoders too big for one host's chips (round-2 verdict
    item 6)."""
    port = _free_port()
    worker = REPO_ROOT / "tests" / "distributed_gen_worker.py"
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), "2",
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, cwd=str(REPO_ROOT))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"gen worker failed:\n{err[-4000:]}"
        outs.append(out)

    def grab(out, key):
        for line in out.splitlines():
            if line.startswith(key + "="):
                return line.split("=", 1)[1]
        raise AssertionError(f"{key} missing in:\n{out}")

    wave = [grab(o, "WAVE_TOKENS") for o in outs]
    batch = [grab(o, "BATCH_TOKENS") for o in outs]
    assert wave[0] == wave[1]
    assert batch[0] == batch[1]

    # single-process reference in a fresh interpreter (this process may
    # already hold an 8-device CPU backend; the reference wants 1 device)
    ref = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '.');\n"
         "import os; os.environ['XLA_FLAGS'] = "
         "'--xla_force_host_platform_device_count=1';\n"
         "os.environ.setdefault('VLM_TPU_PALLAS_INTERPRET', '1');\n"
         "import jax; jax.config.update('jax_platforms', 'cpu');\n"
         "import numpy as np;\n"
         "from tests.gen_reference import single_process_tokens;\n"
         "wave, lists = single_process_tokens();\n"
         "print('WAVE_TOKENS=' + ';'.join(','.join(str(int(t)) for t in r)"
         " for r in wave));\n"
         "print('BATCH_TOKENS=' + ';'.join(','.join(str(t) for t in r)"
         " for r in lists))"],
        capture_output=True, text=True, timeout=420, cwd=str(REPO_ROOT))
    assert ref.returncode == 0, ref.stderr[-3000:]
    assert grab(ref.stdout, "WAVE_TOKENS") == wave[0]
    assert grab(ref.stdout, "BATCH_TOKENS") == batch[0]


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
