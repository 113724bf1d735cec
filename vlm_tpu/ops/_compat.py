"""Shared Pallas helpers."""

import os


def pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode (CPU backends). Read at call
    time so ``apply_platform_env()`` can be invoked after imports."""
    return os.environ.get("VLM_TPU_PALLAS_INTERPRET", "0") == "1"
