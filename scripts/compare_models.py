#!/usr/bin/env python
"""Multi-model comparison sweep: models × quantizations × datasets.

Covers the reference's headline usage "Multi-model comparison sweep:
blip2/llava/paligemma × all datasets, bf16/int8 quantization"
(BASELINE.json configs) — the reference itself has no sweep driver; users
re-ran prompt_inference per combination. This script runs zero-shot
inference for every (model, quantization, dataset) combination and
aggregates the per-run ``metrics.json`` artifacts plus throughput into one
``eval/comparison/summary.json`` + CSV.

Config (YAML):

    models: [llava, paligemma, blip2]
    quantizations: [bf16, 8bit]
    datasets: [MiviaPar, RAF-DB]
    max_tokens: 100
    batch_size: 32
    model_size: null          # e.g. "test" for CI
    dataset: {base_path: null}
    prompts: {...}            # same prompt section as prompt_inference
"""

import argparse
import csv
import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("VLM_TPU_ROOT", str(REPO_ROOT))

from vlm_tpu.utils.platform import apply_platform_env

apply_platform_env()

import yaml


def main():
    ap = argparse.ArgumentParser(description="Model comparison sweep")
    ap.add_argument("--config", type=str,
                    default="configs/compare_models.yaml")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    from vlm_tpu.core.config import project_root
    from vlm_tpu.data.dataset_factory import DatasetFactory
    from vlm_tpu.evaluation import Evaluator
    from vlm_tpu.models.factory import VLMModelFactory

    cfg_path = Path(args.config)
    if not cfg_path.is_absolute():
        cfg_path = project_root() / cfg_path
    cfg = yaml.safe_load(cfg_path.read_text())

    models = cfg.get("models", ["llava", "paligemma", "blip2"])
    quants = cfg.get("quantizations", ["bf16"])
    datasets = cfg["datasets"]
    max_tokens = int(cfg.get("max_tokens", 100))
    batch_size = int(cfg.get("batch_size", 32))
    prompts = cfg.get("prompts", {}) or {}
    base_path = (cfg.get("dataset", {}) or {}).get("base_path")

    out_root = project_root() / "eval" / "comparison"
    out_root.mkdir(parents=True, exist_ok=True)
    rows = []

    for model_name in models:
        for quant in quants:
            # One model instance per (model, quant); datasets share it.
            model = VLMModelFactory.create_model(
                model_name, model_id=cfg.get("model_id"),
                quantization=quant, size=cfg.get("model_size"))
            for ds_name in datasets:
                dataset = DatasetFactory.create_dataset(
                    ds_name, base_path=base_path, split="test",
                    transform=None)
                prompt = prompts.get(
                    ds_name, prompts.get("face_dataset", ""))
                if not prompt:
                    raise ValueError(f"no prompt for dataset {ds_name}")
                n = len(dataset) if args.limit is None else \
                    min(args.limit, len(dataset))
                paths = dataset.image_paths()[:n]
                labels = dataset.labels_list()[:n]
                print(f"[sweep] {model_name}/{quant}/{ds_name}: {n} images")
                t0 = time.perf_counter()
                outputs = model.generate_dataset(
                    paths, prompt, max_tokens=max_tokens,
                    batch_size=batch_size)
                elapsed = time.perf_counter() - t0
                preds = [dataset.get_labels_from_text_output(o)
                         for o in outputs if o is not None]
                gts = [l for o, l in zip(outputs, labels) if o is not None]
                out_dir = out_root / f"{model_name}_{quant}" / ds_name
                Evaluator.evaluate(preds, gts, out_dir,
                                   dataset_name=ds_name)
                metrics = json.loads(
                    (out_dir / "metrics.json").read_text())
                rows.append({
                    "model": model_name,
                    "quantization": quant,
                    "dataset": ds_name,
                    "images": n,
                    "images_per_sec": round(n / elapsed, 3),
                    "average_accuracy": metrics.get("average_accuracy"),
                    **{f"acc_{k}": v.get("accuracy")
                       for k, v in metrics.items()
                       if isinstance(v, dict) and "accuracy" in v},
                })
            del model

    (out_root / "summary.json").write_text(json.dumps(rows, indent=2))
    fieldnames = sorted({k for r in rows for k in r})
    with open(out_root / "summary.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        writer.writerows(rows)
    print(f"[sweep] summary written to {out_root}/summary.{{json,csv}}")


if __name__ == "__main__":
    main()
