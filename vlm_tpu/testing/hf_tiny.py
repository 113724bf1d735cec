"""Tiny random-weight HF models mirroring the vlm_tpu ``"test"`` configs.

The cross-implementation parity harness (tests/test_hf_parity.py) and the
measured-baseline script (scripts/measure_reference_baseline.py) both need a
*real* HF VLM to compare against. No pretrained checkpoints are reachable in
this environment (zero egress), but torch + transformers are installed — so we
construct each family's HF model *from config* with seeded random weights,
save it to safetensors, and convert it through ``vlm_tpu.models.hf_weights``.
Token-for-token greedy parity against these models validates every numeric
convention the converter and model stack must honor (RoPE layout, OPT's +2
position offset, Gemma's (1+w) RMSNorm and sqrt(hidden) embed scaling,
prefix-LM masking, projector wiring, CLIP's non-post-normed
``last_hidden_state``, EVA's fused qkv with zero K-bias).

Dims match ``vlm_tpu.models.configs`` ``"test"`` variants exactly:
vision hidden 64 / 2 layers / 2 heads / mlp 128 / image 56 / patch 14;
decoder vocab 512 / hidden 64 / 2 layers / 2 heads / head_dim 32 / mlp 128.
"""

from __future__ import annotations

import numpy as np

#: image placeholder id used in HF input_ids (outside the byte-tokenizer
#: range 0..258, inside the test vocab 512)
IMAGE_TOKEN = 500


def _randomize(model, seed: int):
    """Replace every parameter with seeded N(0, 0.05) noise.

    HF ``_init_weights`` zeroes most biases, which would leave the
    converter's bias paths untested; full randomization exercises them all.
    Tied tensors are visited once (named_parameters deduplicates).
    """
    import torch
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in sorted(model.named_parameters()):
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)


def _zero_eva_k_bias(model, hidden: int):
    """EVA ViT-g has no K bias; HF stores the fused qkv bias with the K slice
    zero in every real checkpoint. Restore that invariant after randomizing."""
    import torch
    with torch.no_grad():
        for layer in model.vision_model.encoder.layers:
            layer.self_attn.qkv.bias[hidden:2 * hidden].zero_()


def build_hf_llava(save_dir, seed: int = 0):
    """Tiny LlavaForConditionalGeneration matching llava_config('test')."""
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)
    vis = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
        projection_dim=32, hidden_act="quick_gelu", layer_norm_eps=1e-5)
    txt = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=512, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False, attention_bias=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0)
    cfg = LlavaConfig(
        vision_config=vis, text_config=txt, image_token_index=IMAGE_TOKEN,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        projector_hidden_act="gelu")
    model = LlavaForConditionalGeneration(cfg)
    _randomize(model, seed)
    model.eval()
    model.save_pretrained(str(save_dir), safe_serialization=True)
    return model


def build_hf_paligemma(save_dir, seed: int = 0):
    """Tiny PaliGemmaForConditionalGeneration matching paligemma_config('test')."""
    from transformers import (GemmaConfig, PaliGemmaConfig,
                              PaliGemmaForConditionalGeneration,
                              SiglipVisionConfig)
    vis = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6)
    txt = GemmaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=32, max_position_embeddings=512, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_act="gelu_pytorch_tanh",
        hidden_activation="gelu_pytorch_tanh",
        bos_token_id=2, eos_token_id=1, pad_token_id=0)
    cfg = PaliGemmaConfig(
        vision_config=vis, text_config=txt, image_token_index=IMAGE_TOKEN,
        projection_dim=64)
    model = PaliGemmaForConditionalGeneration(cfg)
    _randomize(model, seed)
    model.eval()
    model.save_pretrained(str(save_dir), safe_serialization=True)
    return model


def build_hf_blip2(save_dir, seed: int = 0):
    """Tiny Blip2ForConditionalGeneration matching blip2_config('test')."""
    from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                              Blip2QFormerConfig, Blip2VisionConfig,
                              OPTConfig)
    vis = Blip2VisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
        hidden_act="gelu", layer_norm_eps=1e-6, qkv_bias=True)
    qf = Blip2QFormerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, encoder_hidden_size=64,
        cross_attention_frequency=2, layer_norm_eps=1e-12)
    opt = OPTConfig(
        vocab_size=512, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=512,
        word_embed_proj_dim=64, activation_function="relu",
        do_layer_norm_before=True, enable_bias=True,
        bos_token_id=2, eos_token_id=2, pad_token_id=1)
    cfg = Blip2Config(vision_config=vis.to_dict(), qformer_config=qf.to_dict(),
                      text_config=opt.to_dict(), num_query_tokens=8,
                      image_token_index=IMAGE_TOKEN)
    model = Blip2ForConditionalGeneration(cfg)
    _randomize(model, seed)
    _zero_eva_k_bias(model, hidden=64)
    model.eval()
    model.save_pretrained(str(save_dir), safe_serialization=True)
    return model


HF_BUILDERS = {
    "llava": build_hf_llava,
    "paligemma": build_hf_paligemma,
    "blip2": build_hf_blip2,
}


def rand_pixels(batch: int, size: int, seed: int = 0) -> np.ndarray:
    """Seeded pseudo-normalized pixel batch, NCHW float32 (the HF layout)."""
    rng = np.random.default_rng(seed)
    return rng.normal(0.0, 1.0, (batch, 3, size, size)).astype(np.float32)


def hf_text_ids(our_model, prompt: str):
    """(pre_ids, post_ids) text halves exactly as the vlm_tpu model builds
    them, for assembling the HF ``input_ids`` around the image block."""
    pre_t, post_t, bos_pre, bos_post = our_model.format_prompt(prompt)
    tok = our_model.tokenizer
    pre = tok.encode(pre_t, add_bos=bos_pre) if (pre_t or bos_pre) else []
    post = tok.encode(post_t, add_bos=bos_post) if (post_t or bos_post) else []
    return pre, post
