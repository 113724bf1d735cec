"""Generate production-checkpoint key manifests (vendored test goldens).

The reference's entire job is running the real hub checkpoints
(`/root/reference/models/llava.py:24`, `paligemma.py:37`, `blip2.py:24`).
Zero-egress forbids downloading their weights, but the *key manifests*
(tensor name -> shape/dtype) are fully determined by the published configs:
we build the exact production `transformers` configs in code and instantiate
each model on the meta device (no memory, no weights), then dump its
state_dict layout to JSON.

Two layouts per checkpoint:

- ``hub``: what the actual hub safetensors files contain — the *legacy*
  composite-VLM key roots (``vision_tower.…``, ``language_model.model.…``,
  top-level ``multi_modal_projector``) that the checkpoints were saved with,
  minus tied-weight duplicates (safetensors refuses to serialize shared
  tensors, so ``save_pretrained`` drops them; e.g. PaliGemma's ``lm_head``).
- ``new_style``: what transformers >= 4.52 emits (``model.vision_tower.…``,
  top-level ``lm_head``) — a user re-saving the checkpoint today produces
  this; `hf_weights._normalize_hf_keys` must fold it back.

BLIP-2 never moved to the re-rooted layout, so both coincide there.

Run: ``python scripts/gen_hf_manifests.py`` (rewrites
``tests/goldens/manifests/*.json``). The test suite asserts the converter
consumes every manifest key and fills every param leaf at production shapes
(`tests/test_weight_manifests.py`).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import torch

OUT_DIR = Path(__file__).resolve().parent.parent / "tests" / "goldens" / "manifests"

# hf_weights._NEW_STYLE_RENAMES, applied here in the same direction to
# *derive* the hub-legacy layout from the installed transformers' state_dict.
_NEW_TO_LEGACY = (
    ("model.vision_tower.", "vision_tower."),
    ("model.multi_modal_projector.", "multi_modal_projector."),
    ("model.language_model.", "language_model.model."),
)


def _state_manifest(model, checkpoint_dtype: str) -> dict:
    out = {}
    for k, v in model.state_dict().items():
        dt = checkpoint_dtype if v.is_floating_point() else str(v.dtype).replace("torch.", "")
        out[k] = {"shape": list(v.shape), "dtype": dt}
    return out


def _to_legacy(keys: dict, tied: list) -> dict:
    out = {}
    for k, v in keys.items():
        if k in tied:
            continue                      # safetensors drops shared tensors
        if k == "lm_head.weight":
            k = "language_model.lm_head.weight"
        else:
            for new, old in _NEW_TO_LEGACY:
                if k.startswith(new):
                    k = old + k[len(new):]
                    break
        out[k] = v
    return out


def llava_7b():
    """llava-hf/llava-1.5-7b-hf: CLIP ViT-L/14-336 + MLP + Vicuna-7B.

    Hyperparameters are the checkpoint's published config.json values
    (mirrored by vlm_tpu.models.configs.CLIP_L_336 / VICUNA_7B).
    """
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    vc = CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=336, patch_size=14,
        projection_dim=768, hidden_act="quick_gelu")
    tc = LlamaConfig(
        vocab_size=32064, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=4096, rms_norm_eps=1e-5,
        tie_word_embeddings=False)
    cfg = LlavaConfig(vision_config=vc, text_config=tc,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default",
                      image_token_index=32000)
    with torch.device("meta"):
        m = LlavaForConditionalGeneration(cfg)
    # The hub repo is serialized in float16 (three safetensors shards).
    return m, "float16", "llava-hf/llava-1.5-7b-hf"


def paligemma_3b():
    """google/paligemma-3b-mix-224: SigLIP So400m/14 + linear + Gemma-2B.

    ``vision_use_head=False``: the checkpoint carries no SigLIP pooling head
    (PaliGemma taps the encoder output directly).
    """
    from transformers import (GemmaConfig, PaliGemmaConfig,
                              PaliGemmaForConditionalGeneration,
                              SiglipVisionConfig)
    vc = SiglipVisionConfig(
        hidden_size=1152, intermediate_size=4304, num_hidden_layers=27,
        num_attention_heads=16, image_size=224, patch_size=14,
        vision_use_head=False)
    tc = GemmaConfig(
        vocab_size=257216, hidden_size=2048, intermediate_size=16384,
        num_hidden_layers=18, num_attention_heads=8, num_key_value_heads=1,
        head_dim=256, max_position_embeddings=8192, rms_norm_eps=1e-6)
    cfg = PaliGemmaConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                          projection_dim=2048, image_token_index=257152)
    with torch.device("meta"):
        m = PaliGemmaForConditionalGeneration(cfg)
    return m, "float32", "google/paligemma-3b-mix-224"


def blip2_67b():
    """Salesforce/blip2-opt-6.7b: EVA ViT-g (fused qkv) + Q-Former + OPT-6.7B."""
    from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                              Blip2QFormerConfig, Blip2VisionConfig, OPTConfig)
    vc = Blip2VisionConfig(
        hidden_size=1408, intermediate_size=6144, num_hidden_layers=39,
        num_attention_heads=16, image_size=224, patch_size=14)
    qc = Blip2QFormerConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, cross_attention_frequency=2,
        encoder_hidden_size=1408)
    tc = OPTConfig(
        vocab_size=50272, hidden_size=4096, ffn_dim=16384,
        num_hidden_layers=32, num_attention_heads=32,
        max_position_embeddings=2048, do_layer_norm_before=True)
    cfg = Blip2Config.from_vision_qformer_text_configs(
        vc, qc, tc, num_query_tokens=32)
    with torch.device("meta"):
        m = Blip2ForConditionalGeneration(cfg)
    return m, "float32", "Salesforce/blip2-opt-6.7b"


def main() -> int:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for family, build in (("llava", llava_7b), ("paligemma", paligemma_3b),
                          ("blip2", blip2_67b)):
        model, ckpt_dtype, hub_id = build()
        # _tied_weights_keys is the *candidate* list; keys are only actually
        # shared (and thus dropped by safetensors) when the text config ties
        # word embeddings. Vicuna does not — the real llava-1.5-7b-hf shards
        # do contain language_model.lm_head.weight.
        text_cfg = model.config.get_text_config()
        tied = list(getattr(model, "_tied_weights_keys", None) or []) \
            if getattr(text_cfg, "tie_word_embeddings", False) else []
        new_style = _state_manifest(model, ckpt_dtype)
        hub = _to_legacy(new_style, tied)
        doc = {
            "checkpoint": hub_id,
            "family": family,
            "transformers_version_generated_with": __import__(
                "transformers").__version__,
            "tied_keys_dropped_from_hub": tied,
            "hub": hub,              # legacy roots, as on the hub
            "new_style": new_style,  # transformers >= 4.52 re-rooted layout
        }
        path = OUT_DIR / f"{hub_id.split('/')[-1]}.json"
        path.write_text(json.dumps(doc, indent=1, sort_keys=True))
        n_params = sum(
            int(torch.tensor(v["shape"]).prod()) if v["shape"] else 1
            for v in hub.values())
        print(f"{path.name}: {len(hub)} hub keys / {len(new_style)} new-style, "
              f"{n_params / 1e9:.2f}B params")
    return 0


if __name__ == "__main__":
    sys.exit(main())
