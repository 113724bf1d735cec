#!/usr/bin/env python
"""Unified probe-training entry point (CLI parity with
`/root/reference/scripts/train_probe.py`): ``--config`` + ``--profile
single|multi`` with the common/profile deep-merge, run naming and checkpoint
roots of the reference."""

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
        description="Unified training entrypoint (single/multi profile)")
    ap.add_argument("--config", type=str, default="configs/train_probe.yaml")
    ap.add_argument("--profile", type=str, choices=["single", "multi"],
                    help="Override the YAML 'profile' (single|multi)")
    args = ap.parse_args()

    from vlm_tpu.core.config import (build_cfg_from_profile, load_config,
                                     make_run_name, project_root)
    from vlm_tpu.probing.train.multitask_trainer import MultiTaskTrainer
    from vlm_tpu.probing.train.singletask_trainer import SingleTaskTrainer

    cfg_path = Path(args.config)
    if not cfg_path.is_absolute():
        cfg_path = project_root() / cfg_path
    raw = load_config(cfg_path)

    profile = (args.profile or str(raw.get("profile", ""))).lower()
    if profile not in ("single", "multi"):
        raise ValueError("Specify the profile: --profile single|multi or "
                         "profile: single|multi in the YAML")

    cfg = build_cfg_from_profile(raw, profile, cfg_path)
    run_name = make_run_name(cfg, profile)

    if profile == "multi":
        ckpt_root = project_root() / "probing" / "multitask_probing" / \
            "checkpoints"
        trainer = MultiTaskTrainer(cfg, run_name, ckpt_root)
    else:
        ckpt_root = project_root() / "probing" / "linear_probing" / \
            "checkpoints"
        trainer = SingleTaskTrainer(cfg, run_name, ckpt_root)

    trainer.fit()


if __name__ == "__main__":
    main()
