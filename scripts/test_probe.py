#!/usr/bin/env python
"""Unified probe-testing entry point (CLI parity with
`/root/reference/scripts/test_probe.py`)."""

import argparse
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("VLM_TPU_ROOT", str(REPO_ROOT))

from vlm_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    ap = argparse.ArgumentParser(
        description="Unified testing entrypoint (single/multi profile)")
    ap.add_argument("--config", type=str, default="configs/test_probe.yaml")
    ap.add_argument("--profile", type=str, choices=["single", "multi"],
                    help="Override the YAML 'profile' (single|multi)")
    args = ap.parse_args()

    from vlm_tpu.core.config import (build_cfg_from_profile, load_config,
                                     project_root)
    from vlm_tpu.probing.test.multitask_tester import MultiTaskTester
    from vlm_tpu.probing.test.singletask_tester import SingleTaskTester

    cfg_path = Path(args.config)
    if not cfg_path.is_absolute():
        cfg_path = project_root() / cfg_path
    raw = load_config(cfg_path)

    profile = (args.profile or str(raw.get("profile", ""))).lower()
    if profile not in ("single", "multi"):
        raise ValueError("Specify the profile: --profile single|multi or "
                         "profile: single|multi in the YAML")

    cfg = build_cfg_from_profile(raw, profile, cfg_path, require_eval=True)
    tester = MultiTaskTester(cfg) if profile == "multi" \
        else SingleTaskTester(cfg)
    tester.run()


if __name__ == "__main__":
    main()
