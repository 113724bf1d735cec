"""Backend selection helper.

``VLM_TPU_PLATFORM=cpu`` forces the CPU backend via ``jax.config`` — needed
because this environment's TPU plugin re-registers itself at interpreter
startup and overrides the ``JAX_PLATFORMS`` env var (see tests/conftest.py).
``VLM_TPU_HOST_DEVICES=N`` requests N virtual CPU devices (must be set
before jax initializes its backends).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    n = os.environ.get("VLM_TPU_HOST_DEVICES")
    if n:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={n}").strip()
    platform = os.environ.get("VLM_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            os.environ.setdefault("VLM_TPU_PALLAS_INTERPRET", "1")
