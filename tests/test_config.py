"""Config system tests (deep merge, profiles, run names)."""

import pytest

from vlm_tpu.core.config import (build_cfg_from_profile, deep_merge,
                                 make_run_name)


def test_deep_merge_nested():
    base = {"a": 1, "b": {"x": 1, "y": 2}, "c": [1, 2]}
    over = {"b": {"y": 3, "z": 4}, "c": [9]}
    out = deep_merge(base, over)
    assert out == {"a": 1, "b": {"x": 1, "y": 3, "z": 4}, "c": [9]}
    assert base["b"]["y"] == 2  # no mutation


def test_profile_single_requires_task():
    with pytest.raises(ValueError):
        build_cfg_from_profile({"common": {}, "single": {}}, "single", "p.yaml")
    cfg = build_cfg_from_profile(
        {"common": {"data": {}}, "single": {"task": "age"}},
        "single", "p.yaml")
    assert cfg["task"] == "age"
    assert cfg["_cfg_path"] == "p.yaml"


def test_profile_multi_lowercases_tasks():
    cfg = build_cfg_from_profile(
        {"common": {}, "multi": {"tasks": ["Age", "GENDER"]}},
        "multi", "p.yaml")
    assert cfg["tasks"] == ["age", "gender"]


def test_profile_eval_required_for_test():
    with pytest.raises(ValueError):
        build_cfg_from_profile({"common": {}, "single": {"task": "age"}},
                               "single", "p.yaml", require_eval=True)


def test_run_names():
    cfg = {"model": {"name": "llava", "quantization": "fp32",
                     "deeper_head": False},
           "task": "age", "train": {}}
    assert make_run_name(cfg, "single") == "llava_fp32_age_linear"
    cfg["model"]["deeper_head"] = True
    assert make_run_name(cfg, "single") == "llava_fp32_age_deeper"
    mcfg = {"model": {"name": "blip2", "quantization": "8bit",
                      "deeper_head": False},
            "tasks": ["age", "gender"],
            "train": {"uncertainty_weighting": {"enabled": True}}}
    assert make_run_name(mcfg, "multi") == "blip2_8bit_age-gender_linear_uw"
