"""Production-checkpoint conversion validation (no weights, no egress).

The reference's job is running the real hub checkpoints
(`/root/reference/models/llava.py:24`, `paligemma.py:37`, `blip2.py:24`).
`tests/goldens/manifests/*.json` vendors those checkpoints' exact key
manifests (tensor name -> shape/dtype) in both the hub-legacy and the
transformers>=4.52 re-rooted layouts (see `scripts/gen_hf_manifests.py`).
These tests prove `hf_weights`' key mapping consumes every manifest key and
fills every leaf of the *production-size* param tree — fused EVA qkv names,
new-vs-legacy roots, tied-weight drops, grouped-int4/int8 quantized shapes —
without downloading a byte.
"""

import json
from pathlib import Path

import pytest

from vlm_tpu.models.configs import (blip2_config, llava_config,
                                    paligemma_config)
from vlm_tpu.models.hf_weights import validate_vlm_conversion

MANIFEST_DIR = Path(__file__).parent / "goldens" / "manifests"

CASES = {
    "llava": (llava_config("7b"), "llava-1.5-7b-hf.json"),
    "paligemma": (paligemma_config("3b"), "paligemma-3b-mix-224.json"),
    "blip2": (blip2_config("6.7b"), "blip2-opt-6.7b.json"),
}


def _manifest(fname):
    return json.loads((MANIFEST_DIR / fname).read_text())


@pytest.mark.parametrize("family", sorted(CASES))
@pytest.mark.parametrize("layout", ["hub", "new_style"])
def test_production_conversion_complete(family, layout):
    """Every checkpoint key consumed, every param leaf filled, at 7b/3b/6.7b
    shapes. `hub` is the layout of the actual safetensors shards on the hub
    (legacy roots, tied lm_head dropped); `new_style` is what a re-save with
    current transformers produces (`model.*` roots + top-level lm_head)."""
    cfg, fname = CASES[family]
    doc = _manifest(fname)
    report = validate_vlm_conversion(family, cfg, doc[layout])
    assert report["unconsumed"] == [], report["unconsumed"][:10]
    assert report["unfilled"] == [], report["unfilled"][:10]


def test_manifest_checkpoints_are_the_reference_defaults():
    ids = {_manifest(f)["checkpoint"] for _, f in CASES.values()}
    assert ids == {"llava-hf/llava-1.5-7b-hf",
                   "google/paligemma-3b-mix-224",
                   "Salesforce/blip2-opt-6.7b"}


def test_production_conversion_quantized_8bit():
    """The big-model recipe (8bit weights) shape-checks at production
    layout: fp checkpoint kernels land in (q_kernel, scale) leaves."""
    cfg, fname = CASES["paligemma"]
    report = validate_vlm_conversion(
        "paligemma", cfg, _manifest(fname)["hub"], quant_bits=8)
    assert report["unconsumed"] == []
    assert report["unfilled"] == []


def test_validation_catches_missing_key():
    cfg, fname = CASES["paligemma"]
    man = dict(_manifest(fname)["hub"])
    victim = next(k for k in man if k.endswith("q_proj.weight"))
    del man[victim]
    with pytest.raises(KeyError):
        validate_vlm_conversion("paligemma", cfg, man)


def test_validation_catches_extra_key():
    cfg, fname = CASES["paligemma"]
    man = dict(_manifest(fname)["hub"])
    man["language_model.model.layers.99.bogus.weight"] = {
        "shape": [4, 4], "dtype": "float32"}
    report = validate_vlm_conversion("paligemma", cfg, man)
    assert report["unconsumed"] == [
        "language_model.model.layers.99.bogus.weight"]


def test_validation_catches_shape_mismatch():
    cfg, fname = CASES["llava"]
    man = dict(_manifest(fname)["hub"])
    key = "multi_modal_projector.linear_1.weight"
    man[key] = {"shape": [8, 8], "dtype": "float16"}
    with pytest.raises(ValueError, match="shape mismatch"):
        validate_vlm_conversion("llava", cfg, man)


def test_benign_buffer_keys_are_ignorable():
    """`.bin`-era checkpoints carried non-persistent buffers (position_ids,
    rope inv_freq) and tied lm_head duplicates; they must not fail
    validation."""
    cfg, fname = CASES["paligemma"]
    man = dict(_manifest(fname)["hub"])
    man["vision_tower.vision_model.embeddings.position_ids"] = {
        "shape": [1, 256], "dtype": "int64"}
    man["language_model.model.layers.0.self_attn.rotary_emb.inv_freq"] = {
        "shape": [128], "dtype": "float32"}
    man["language_model.lm_head.weight"] = {
        "shape": [257216, 2048], "dtype": "float32"}
    report = validate_vlm_conversion("paligemma", cfg, man)
    assert report["unconsumed"] == []
    assert report["unfilled"] == []
