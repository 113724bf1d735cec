#!/usr/bin/env python
"""Zero-shot VLM prompt inference over a dataset (CLI parity with
`/root/reference/scripts/prompt_inference.py`).

The hot path is TPU-native: instead of one ``model.generate`` per image
(reference: prompt_inference.py:75-79), images stream through host decode →
fused device preprocessing → batched prefill + ``lax.while_loop`` decode,
``batch_size`` sequences at a time. Parsed labels, evaluator artifacts and
the output layout (``eval/prompt_inference/<model>_<quant>/<dataset>``)
match the reference. KeyboardInterrupt evaluates partial results
(reference: prompt_inference.py:80-86).
"""

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

import yaml


def load_config(config_path: str) -> dict:
    with open(config_path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f)


def main():
    parser = argparse.ArgumentParser(
        description="Zero-shot inference (YAML config)")
    parser.add_argument("--config", type=str,
                        default="configs/prompt_inference.yaml")
    parser.add_argument("--limit", type=int, default=None,
                        help="optional cap on the number of images")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="write a jax.profiler trace of the inference "
                             "run to DIR (view with TensorBoard/Perfetto)")
    args = parser.parse_args()

    from vlm_tpu.data.dataset_factory import DatasetFactory
    from vlm_tpu.evaluation import Evaluator
    from vlm_tpu.models.factory import VLMModelFactory
    from vlm_tpu.utils.profiling import ThroughputMeter

    root = os.environ["VLM_TPU_ROOT"]
    cfg_path = os.path.join(root, args.config) \
        if not os.path.isabs(args.config) else args.config
    cfg = load_config(cfg_path)

    model_name = cfg["model_name"]
    quantization = cfg["quantization"]
    dataset_name = cfg["dataset_name"]
    max_tokens = int(cfg.get("max_tokens", 100))
    batch_size = int(cfg.get("batch_size", 32))

    output_dir = os.path.join(
        root, f"eval/prompt_inference/{model_name}_{quantization}/"
        f"{dataset_name}")
    os.makedirs(output_dir, exist_ok=True)
    print("Output directory:", output_dir)

    if str(cfg.get("kv_cache") or "").lower() == "int8":
        # config-surface alias for the engine-level opt-in (the model
        # object reads the env when building its engines)
        os.environ["VLM_TPU_KV_CACHE"] = "int8"
    if cfg.get("int8_prefill"):
        # config-surface alias for the int8 prefill point on the
        # accuracy/speed curve (dequant | dynamic | dynamic_noout);
        # validated at trace time by models.layers._int8_prefill_mode
        os.environ["VLM_TPU_INT8_PREFILL"] = str(cfg["int8_prefill"]).lower()
    model = VLMModelFactory.create_model(
        model_name, model_id=cfg.get("model_id"), quantization=quantization,
        size=cfg.get("model_size"), mesh=cfg.get("mesh"),
        quantize_vision=cfg.get("quantize_vision"))
    if model.mesh is not None:
        # Guard against a silently-dead mesh knob: params must actually be
        # placed (and TP-split when model>1) on the configured mesh.
        from vlm_tpu.parallel.sharding import assert_params_sharded
        assert_params_sharded(model.params, model.mesh)
        print(f"Mesh active: {dict(model.mesh.shape)} over "
              f"{model.mesh.size} devices")

    ds_cfg = cfg.get("dataset", {}) or {}
    dataset = DatasetFactory.create_dataset(
        dataset_name, base_path=ds_cfg.get("base_path", None), split="test",
        transform=None)

    prompts = cfg.get("prompts", {}) or {}
    if dataset_name in prompts:
        prompt = prompts[dataset_name]
    else:
        prompt = prompts.get("face_dataset", "")
    if not prompt:
        raise ValueError("No prompt found in config (section 'prompts').")

    with open(os.path.join(output_dir, "used_config.yaml"), "w",
              encoding="utf-8") as f:
        yaml.safe_dump(cfg, f, sort_keys=False, allow_unicode=True)

    n = len(dataset) if args.limit is None else min(args.limit, len(dataset))
    meter = ThroughputMeter()
    continuous = bool(cfg.get("continuous_batching", True))
    print(f"Running inference on dataset: {dataset_name} ({n} images, "
          f"batch={batch_size}, continuous={continuous})")
    if args.profile:
        # traced region covers the whole inference run; the finally below
        # finalizes the trace even if the run raises (an unflushed trace of
        # a partially-completed long run would otherwise be lost)
        import jax
        jax.profiler.start_trace(args.profile)
    try:
        _run_inference(args, cfg, model, dataset, dataset_name, prompt,
                       output_dir, n, meter, batch_size, max_tokens,
                       continuous)
    finally:
        if args.profile:
            import jax
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {args.profile}")


def _run_inference(args, cfg, model, dataset, dataset_name, prompt,
                   output_dir, n, meter, batch_size, max_tokens,
                   continuous):
    # Decoding knobs from the config (reference capability surface:
    # model.generate kwargs, /root/reference/models/base_model.py:68-69).
    gen = {k: cfg[k] for k in
           ("num_beams", "temperature", "top_k", "top_p", "seed")
           if cfg.get(k) is not None}
    if continuous:
        from vlm_tpu.evaluation import run_zero_shot
        summary = run_zero_shot(model, dataset, prompt, output_dir,
                                max_tokens=max_tokens,
                                batch_size=batch_size, limit=args.limit,
                                progress=meter.update, generation=gen)
        meter.report("prompt_inference")
        if summary["partial"]:
            print(f"Interrupted: evaluated "
                  f"{summary['images_completed']}/{n} images.")
        elif summary["images_completed"] == 0:
            print("Nothing to evaluate.")
    else:
        labels = dataset.labels_list()[:n]
        paths = dataset.image_paths()[:n]
        preds, gts = [], []
        try:
            from PIL import Image
            for start in range(0, n, batch_size):
                chunk_paths = paths[start:start + batch_size]
                images = [Image.open(p).convert("RGB") for p in chunk_paths]
                k = len(images)
                if k < batch_size:
                    images = images + [images[-1]] * (batch_size - k)
                outputs = model.generate_batch(images, prompt,
                                               max_tokens=max_tokens,
                                               **gen)[:k]
                for out, label in zip(outputs, labels[start:start + k]):
                    preds.append(dataset.get_labels_from_text_output(out))
                    gts.append(label)
                meter.update(k)
        except KeyboardInterrupt:
            print("\nInterrupted. Evaluating partial results...")
        meter.report("prompt_inference")
        if preds and gts:
            Evaluator.evaluate(preds, gts, output_dir,
                               dataset_name=dataset_name)
        else:
            print("Nothing to evaluate.")


if __name__ == "__main__":
    main()
