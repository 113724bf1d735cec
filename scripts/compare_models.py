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
    model_id: null            # shared checkpoint dir (all models), or
    model_ids:                # per-model checkpoint dirs (wins over model_id)
      llava: /ckpts/llava-1.5-7b
      paligemma: /ckpts/paligemma-3b-mix-224
    dataset: {base_path: null}
    prompts: {...}            # same prompt section as prompt_inference
"""

import argparse
import csv
import json
import os
import sys
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
    from vlm_tpu.models.factory import VLMModelFactory

    cfg_path = Path(args.config)
    if not cfg_path.is_absolute():
        cfg_path = project_root() / cfg_path
    cfg = yaml.safe_load(cfg_path.read_text())

    if str(cfg.get("kv_cache") or "").lower() == "int8":
        os.environ["VLM_TPU_KV_CACHE"] = "int8"
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

    def flush():
        # Incremental writes: a mid-sweep failure or interrupt must not
        # discard hours of completed combinations.
        (out_root / "summary.json").write_text(json.dumps(rows, indent=2))
        fieldnames = sorted({k for r in rows for k in r})
        with open(out_root / "summary.csv", "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fieldnames)
            writer.writeheader()
            writer.writerows(rows)

    from vlm_tpu.evaluation import run_zero_shot

    interrupted = False
    for model_name in models:
        if interrupted:
            break
        for quant in quants:
            if interrupted:
                break
            # One model instance per (model, quant); datasets share it.
            model_id = (cfg.get("model_ids") or {}).get(
                model_name, cfg.get("model_id"))
            try:
                model = VLMModelFactory.create_model(
                    model_name, model_id=model_id,
                    quantization=quant, size=cfg.get("model_size"),
                    mesh=cfg.get("mesh"),
                    quantize_vision=cfg.get("quantize_vision"))
            except Exception as e:    # noqa: BLE001 — recorded per combo
                # One bad checkpoint must not abort the whole sweep
                # (incremental flush() exists for exactly this reason).
                print(f"[sweep][ERR] {model_name}/{quant}: {e}")
                rows.append({"model": model_name, "quantization": quant,
                             "error": f"create_model: {e}"})
                flush()
                continue
            for ds_name in datasets:
                row = {"model": model_name, "quantization": quant,
                       "dataset": ds_name}
                try:
                    dataset = DatasetFactory.create_dataset(
                        ds_name, base_path=base_path, split="test",
                        transform=None)
                    prompt = prompts.get(
                        ds_name, prompts.get("face_dataset", ""))
                    if not prompt:
                        raise ValueError(f"no prompt for dataset {ds_name}")
                    print(f"[sweep] {model_name}/{quant}/{ds_name}")
                    summary = run_zero_shot(
                        model, dataset, prompt,
                        out_root / f"{model_name}_{quant}" / ds_name,
                        max_tokens=max_tokens, batch_size=batch_size,
                        limit=args.limit)
                    metrics = summary["metrics"]
                    row.update({
                        "images": summary["images_completed"],
                        "images_per_sec": summary["images_per_sec"],
                        "partial": summary["partial"],
                        "average_accuracy": metrics.get("average_accuracy"),
                        **{f"acc_{k}": v.get("accuracy")
                           for k, v in metrics.items()
                           if isinstance(v, dict) and "accuracy" in v},
                    })
                    if summary["partial"]:
                        # generate_dataset swallows KeyboardInterrupt to
                        # return partial results — stop the sweep too.
                        interrupted = True
                except Exception as e:     # noqa: BLE001 — recorded per combo
                    print(f"[sweep][ERR] {model_name}/{quant}/{ds_name}: {e}")
                    row["error"] = str(e)
                rows.append(row)
                flush()
                if interrupted:
                    break
            del model

    print(f"[sweep] summary written to {out_root}/summary.{{json,csv}}"
          + (" (interrupted)" if interrupted else ""))


if __name__ == "__main__":
    main()
