"""HBM fit check: weights-don't-fit builds are rejected with alternatives.

The reference escapes oversized models via host offload
(`/root/reference/models/base_model.py:88,95`); this framework rejects the
build and names the TPU-native alternatives (8bit / `mesh: {model: N}`)
instead — docs/MIGRATION.md "CPU offload".
"""

import jax
import jax.numpy as jnp
import pytest

from vlm_tpu.models import vlm as vlm_mod
from vlm_tpu.models.configs import VLM_CONFIGS
from vlm_tpu.models.vlm import (VLMModule, check_hbm_fit, init_vlm,
                                param_bytes)


@pytest.fixture(scope="module")
def tiny():
    cfg = VLM_CONFIGS["paligemma"]("test")
    module = VLMModule(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    return module, cfg


def test_param_bytes_matches_materialized(tiny):
    module, cfg = tiny
    est = param_bytes(module, cfg)
    _, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.bfloat16,
                         param_dtype=jnp.bfloat16)
    actual = sum(leaf.size * leaf.dtype.itemsize
                 for leaf in jax.tree_util.tree_leaves(params))
    assert est == actual


def test_fit_check_rejects_and_names_alternatives(tiny, monkeypatch):
    module, cfg = tiny
    total = param_bytes(module, cfg)
    limit = total // 3
    monkeypatch.setattr(vlm_mod, "_device_hbm_limit", lambda: limit)
    with pytest.raises(ValueError) as ei:
        check_hbm_fit(module, cfg)
    msg = str(ei.value)
    assert "8bit" in msg
    need = max(-(-total // limit), 2)
    assert f"mesh: {{model: {need}}}" in msg


def test_fit_check_counts_tensor_parallel_ways(tiny, monkeypatch):
    module, cfg = tiny
    total = param_bytes(module, cfg)
    monkeypatch.setattr(vlm_mod, "_device_hbm_limit", lambda: total // 3)
    check_hbm_fit(module, cfg, model_ways=4)  # fits per-chip: no raise


def test_fit_check_env_override(tiny, monkeypatch):
    module, cfg = tiny
    monkeypatch.setattr(vlm_mod, "_device_hbm_limit", lambda: 1)
    monkeypatch.setenv("VLM_TPU_SKIP_FIT_CHECK", "1")
    check_hbm_fit(module, cfg)  # no raise


def test_fit_check_skipped_without_limit(tiny, monkeypatch):
    module, cfg = tiny
    monkeypatch.setattr(vlm_mod, "_device_hbm_limit", lambda: None)
    check_hbm_fit(module, cfg)  # no raise on CPU/virtual backends
