"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding code paths
(mesh creation, pjit partitioning, collectives) execute without TPU hardware —
the JAX-native substitute for a multi-chip fixture (SURVEY.md §4).

These env vars must be set before jax initializes its backends, hence the
module-level assignment here (conftest imports before any test module).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Pallas kernels run in interpreter mode on the CPU backend.
os.environ.setdefault("VLM_TPU_PALLAS_INTERPRET", "1")

# Persistent XLA compile cache, shared by the suite's many subprocess tests
# (CLI scripts, bench, multiproc): the same tiny-model prefill/decode
# programs otherwise recompile in every process. Set via env so child
# processes inherit it; keyed by backend+flags, so the 8-virtual-device CPU
# config caches separately from any TPU use of the same dir.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.environ.get("TMPDIR", "/tmp"), "vlm_tpu_test_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# Force the CPU backend via jax.config (NOT the JAX_PLATFORMS env var: this
# environment's TPU plugin re-registers itself at interpreter startup and
# overrides the env var, leaving a broken mixed state that hangs on first
# dispatch — config.update after import wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# The dataset factory and evaluator resolve relative paths against this root.
os.environ.setdefault("VLM_TPU_ROOT", str(REPO_ROOT))


# --------------------------------------------------------------------------
# Synthetic dataset fixtures in the standard disk layout
# (<base>/<name>/<split>/{images/, labels.csv}) — the "TestDataset" idea the
# reference implies but never ships (SURVEY.md §4).
# --------------------------------------------------------------------------

# The builders live in the package so the driver's dryrun can reuse them;
# re-exported here for the test modules' existing imports.
from vlm_tpu.testing.synthetic import (make_face_dataset,  # noqa: E402,F401
                                       make_mivia_dataset,
                                       write_image as _write_image)


@pytest.fixture
def face_base(tmp_path):
    """A tiny TestDataset with train/val/test splits and class_counts.json."""
    base = tmp_path / "datasets"
    rows = [
        {"gender": 0, "age": 25.0, "ethnicity": 0, "emotion": 3, "identity": "a"},
        {"gender": 1, "age": 4.0, "ethnicity": 1, "emotion": 6, "identity": "b"},
        {"gender": 1, "age": 71.0, "ethnicity": 2, "emotion": 0},
        {"gender": "", "age": "", "ethnicity": "", "emotion": ""},
        {"gender": 0, "age": 33.0, "ethnicity": 3, "emotion": 5, "identity": "c"},
        {"gender": 1, "age": 15.0, "ethnicity": 0, "emotion": 1, "identity": "d"},
    ]
    for split in ("train", "val", "test"):
        make_face_dataset(base, "TestDataset", split, rows)
    import json
    counts = {
        "gender": {"0": 2, "1": 3},
        "age": {"3": 1, "1": 1, "8": 1, "4": 1, "2": 1, "-1": 7},
        "ethnicity": {"0": 2, "1": 1, "2": 1, "3": 1},
        "emotion": {"3": 1, "6": 1, "0": 1, "5": 1, "1": 1},
    }
    (base / "TestDataset" / "train" / "class_counts.json").write_text(
        json.dumps(counts))
    return base


@pytest.fixture
def mivia_base(tmp_path):
    base = tmp_path / "datasets"
    rows = [
        ("black", "blue", 0, 1, 0),
        ("red", "white", 1, 0, 1),
        (3, 4, 0, "yes", "no"),
        ("green", "unknowncolor", 1, 1, 1),
    ]
    for split in ("train", "val", "test"):
        make_mivia_dataset(base, split, rows)
    return base
