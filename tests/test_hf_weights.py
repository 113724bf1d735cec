"""HF weight-converter tests: build a fake HF checkpoint with the public
naming scheme for a tiny LLaVA config, convert, and check the numerics land
in the right places (transposes, qkv splits, conv layout)."""

import numpy as np
import pytest

pytest.importorskip("safetensors")

import jax
import jax.numpy as jnp

from vlm_tpu.models.configs import llava_config
from vlm_tpu.models.hf_weights import load_vlm_weights
from vlm_tpu.models.vlm import init_vlm


def _fake_llava_checkpoint(tmp_path, cfg):
    """Random tensors under the HF LLaVA names matching the tiny config."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(0)
    v = cfg.vision
    d = cfg.decoder
    t = {}

    def add(name, shape):
        t[name] = rng.normal(scale=0.02, size=shape).astype(np.float32)

    p = "vision_tower.vision_model"
    add(f"{p}.embeddings.patch_embedding.weight",
        (v.hidden, 3, v.patch_size, v.patch_size))
    # NB: CLIP's patch conv is bias-free (verified by the vendored
    # llava-1.5-7b-hf manifest) — no patch_embedding.bias here.
    add(f"{p}.embeddings.class_embedding", (v.hidden,))
    add(f"{p}.embeddings.position_embedding.weight", (v.seq_len, v.hidden))
    add(f"{p}.pre_layrnorm.weight", (v.hidden,))
    add(f"{p}.pre_layrnorm.bias", (v.hidden,))
    for i in range(v.layers):
        lp = f"{p}.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            add(f"{lp}.self_attn.{proj}.weight", (v.hidden, v.hidden))
            add(f"{lp}.self_attn.{proj}.bias", (v.hidden,))
        for ln in ("layer_norm1", "layer_norm2"):
            add(f"{lp}.{ln}.weight", (v.hidden,))
            add(f"{lp}.{ln}.bias", (v.hidden,))
        add(f"{lp}.mlp.fc1.weight", (v.mlp_dim, v.hidden))
        add(f"{lp}.mlp.fc1.bias", (v.mlp_dim,))
        add(f"{lp}.mlp.fc2.weight", (v.hidden, v.mlp_dim))
        add(f"{lp}.mlp.fc2.bias", (v.hidden,))
    add(f"{p}.post_layernorm.weight", (v.hidden,))
    add(f"{p}.post_layernorm.bias", (v.hidden,))

    add("multi_modal_projector.linear_1.weight", (d.hidden, v.hidden))
    add("multi_modal_projector.linear_1.bias", (d.hidden,))
    add("multi_modal_projector.linear_2.weight", (d.hidden, d.hidden))
    add("multi_modal_projector.linear_2.bias", (d.hidden,))

    lm = "language_model.model"
    add(f"{lm}.embed_tokens.weight", (d.vocab_size, d.hidden))
    for i in range(d.layers):
        lp = f"{lm}.layers.{i}"
        add(f"{lp}.self_attn.q_proj.weight",
            (d.heads * d.head_dim, d.hidden))
        add(f"{lp}.self_attn.k_proj.weight",
            (d.kv_heads * d.head_dim, d.hidden))
        add(f"{lp}.self_attn.v_proj.weight",
            (d.kv_heads * d.head_dim, d.hidden))
        add(f"{lp}.self_attn.o_proj.weight",
            (d.hidden, d.heads * d.head_dim))
        add(f"{lp}.input_layernorm.weight", (d.hidden,))
        add(f"{lp}.post_attention_layernorm.weight", (d.hidden,))
        add(f"{lp}.mlp.gate_proj.weight", (d.mlp_dim, d.hidden))
        add(f"{lp}.mlp.up_proj.weight", (d.mlp_dim, d.hidden))
        add(f"{lp}.mlp.down_proj.weight", (d.hidden, d.mlp_dim))
    add(f"{lm}.norm.weight", (d.hidden,))
    add("language_model.lm_head.weight", (d.vocab_size, d.hidden))

    save_file(t, str(tmp_path / "model.safetensors"))
    return t


class TestLLaVAConversion:
    def test_converts_and_places(self, tmp_path):
        cfg = llava_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
        hf = _fake_llava_checkpoint(tmp_path, cfg)
        out = load_vlm_weights("llava", cfg, tmp_path, params)

        tree = out["params"]

        def unbox(x):
            return np.asarray(x.unbox() if hasattr(x, "unbox") else x)

        # vision q_proj: torch [out, in] -> flax [in, out]
        got = unbox(tree["vision"]["block_0"]["attn"]["q_proj"]["kernel"])
        want = hf["vision_tower.vision_model.encoder.layers.0"
                  ".self_attn.q_proj.weight"].T
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # conv OIHW -> HWIO
        got = unbox(tree["vision"]["patch_embed"]["kernel"])
        want = np.transpose(
            hf["vision_tower.vision_model.embeddings.patch_embedding.weight"],
            (2, 3, 1, 0))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # decoder embed + lm_head
        got = unbox(tree["decoder"]["embed"]["embedding"])
        np.testing.assert_allclose(
            got, hf["language_model.model.embed_tokens.weight"], rtol=1e-6)
        got = unbox(tree["decoder"]["lm_head"]["kernel"])
        np.testing.assert_allclose(
            got, hf["language_model.lm_head.weight"].T, rtol=1e-6)
        # projector
        got = unbox(tree["projector"]["fc1"]["kernel"])
        np.testing.assert_allclose(
            got, hf["multi_modal_projector.linear_1.weight"].T, rtol=1e-6)

    def test_shape_mismatch_raises(self, tmp_path):
        from safetensors.numpy import save_file
        cfg = llava_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
        _fake_llava_checkpoint(tmp_path, cfg)
        # corrupt one tensor's shape
        bad = {"vision_tower.vision_model.post_layernorm.weight":
               np.zeros((7,), np.float32)}
        from vlm_tpu.models.hf_weights import _load_safetensors
        full = _load_safetensors(tmp_path)
        full.update(bad)
        save_file(full, str(tmp_path / "model.safetensors"))
        with pytest.raises(ValueError, match="shape mismatch"):
            load_vlm_weights("llava", cfg, tmp_path, params)

    def test_forward_runs_with_converted_weights(self, tmp_path):
        cfg = llava_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
        _fake_llava_checkpoint(tmp_path, cfg)
        out = load_vlm_weights("llava", cfg, tmp_path, params)
        s = cfg.vision.image_size
        logits = module.apply(out, jnp.zeros((1, s, s, 3), jnp.float32),
                              jnp.ones((1, 2), jnp.int32),
                              jnp.ones((1, 2), jnp.int32))
        assert np.isfinite(np.asarray(logits)).all()


def _fake_blip2_checkpoint(tmp_path, cfg):
    """Random tensors under the HF BLIP-2 names matching the tiny config."""
    from safetensors.numpy import save_file
    rng = np.random.default_rng(1)
    v = cfg.vision
    d = cfg.decoder
    qf = cfg.qformer
    t = {}

    def add(name, shape):
        t[name] = rng.normal(scale=0.02, size=shape).astype(np.float32)

    p = "vision_model"
    add(f"{p}.embeddings.patch_embedding.weight",
        (v.hidden, 3, v.patch_size, v.patch_size))
    add(f"{p}.embeddings.patch_embedding.bias", (v.hidden,))
    add(f"{p}.embeddings.class_embedding", (v.hidden,))
    add(f"{p}.embeddings.position_embedding", (1, v.seq_len, v.hidden))
    for i in range(v.layers):
        lp = f"{p}.encoder.layers.{i}"
        add(f"{lp}.self_attn.qkv.weight", (3 * v.hidden, v.hidden))
        add(f"{lp}.self_attn.qkv.bias", (3 * v.hidden,))
        add(f"{lp}.self_attn.projection.weight", (v.hidden, v.hidden))
        add(f"{lp}.self_attn.projection.bias", (v.hidden,))
        for ln in ("layer_norm1", "layer_norm2"):
            add(f"{lp}.{ln}.weight", (v.hidden,))
            add(f"{lp}.{ln}.bias", (v.hidden,))
        add(f"{lp}.mlp.fc1.weight", (v.mlp_dim, v.hidden))
        add(f"{lp}.mlp.fc1.bias", (v.mlp_dim,))
        add(f"{lp}.mlp.fc2.weight", (v.hidden, v.mlp_dim))
        add(f"{lp}.mlp.fc2.bias", (v.hidden,))
    add(f"{p}.post_layernorm.weight", (v.hidden,))
    add(f"{p}.post_layernorm.bias", (v.hidden,))

    add("query_tokens", (1, qf.num_query_tokens, qf.hidden))
    add("qformer.layernorm.weight", (qf.hidden,))
    add("qformer.layernorm.bias", (qf.hidden,))
    for i in range(qf.layers):
        lp = f"qformer.encoder.layer.{i}"
        blocks = [(f"{lp}.attention", qf.hidden)]
        if i % qf.cross_attention_frequency == 0:
            blocks.append((f"{lp}.crossattention", v.hidden))
        for bp, kv_in in blocks:
            for proj in ("query", "key", "value"):
                in_dim = qf.hidden if proj == "query" else kv_in
                add(f"{bp}.attention.{proj}.weight", (qf.hidden, in_dim))
                add(f"{bp}.attention.{proj}.bias", (qf.hidden,))
            add(f"{bp}.output.dense.weight", (qf.hidden, qf.hidden))
            add(f"{bp}.output.dense.bias", (qf.hidden,))
            add(f"{bp}.output.LayerNorm.weight", (qf.hidden,))
            add(f"{bp}.output.LayerNorm.bias", (qf.hidden,))
        add(f"{lp}.intermediate_query.dense.weight", (qf.mlp_dim, qf.hidden))
        add(f"{lp}.intermediate_query.dense.bias", (qf.mlp_dim,))
        add(f"{lp}.output_query.dense.weight", (qf.hidden, qf.mlp_dim))
        add(f"{lp}.output_query.dense.bias", (qf.hidden,))
        add(f"{lp}.output_query.LayerNorm.weight", (qf.hidden,))
        add(f"{lp}.output_query.LayerNorm.bias", (qf.hidden,))
    add("language_projection.weight", (d.hidden, qf.hidden))
    add("language_projection.bias", (d.hidden,))

    lm = "language_model.model.decoder"
    add(f"{lm}.embed_tokens.weight", (d.vocab_size, d.hidden))
    add(f"{lm}.embed_positions.weight", (d.max_position + 2, d.hidden))
    for i in range(d.layers):
        lp = f"{lm}.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            add(f"{lp}.self_attn.{proj}.weight", (d.hidden, d.hidden))
            add(f"{lp}.self_attn.{proj}.bias", (d.hidden,))
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            add(f"{lp}.{ln}.weight", (d.hidden,))
            add(f"{lp}.{ln}.bias", (d.hidden,))
        add(f"{lp}.fc1.weight", (d.mlp_dim, d.hidden))
        add(f"{lp}.fc1.bias", (d.mlp_dim,))
        add(f"{lp}.fc2.weight", (d.hidden, d.mlp_dim))
        add(f"{lp}.fc2.bias", (d.hidden,))
    add(f"{lm}.final_layer_norm.weight", (d.hidden,))
    add(f"{lm}.final_layer_norm.bias", (d.hidden,))

    save_file(t, str(tmp_path / "model.safetensors"))
    return t


class TestBLIP2Conversion:
    def test_converts_and_runs(self, tmp_path):
        from vlm_tpu.models.configs import blip2_config
        cfg = blip2_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
        hf = _fake_blip2_checkpoint(tmp_path, cfg)
        out = load_vlm_weights("blip2", cfg, tmp_path, params)
        tree = out["params"]

        def unbox(x):
            return np.asarray(x.unbox() if hasattr(x, "unbox") else x)

        # fused qkv split: q slice lands in q_proj (transposed)
        qkv = hf["vision_model.encoder.layers.0.self_attn.qkv.weight"]
        h = cfg.vision.hidden
        np.testing.assert_allclose(
            unbox(tree["vision"]["block_0"]["attn"]["q_proj"]["kernel"]),
            qkv[:h].T, rtol=1e-6)
        np.testing.assert_allclose(
            unbox(tree["vision"]["block_0"]["attn"]["k_proj"]["kernel"]),
            qkv[h:2 * h].T, rtol=1e-6)
        # q-former query tokens + cross attention
        np.testing.assert_allclose(unbox(tree["projector"]["query_tokens"]),
                                   hf["query_tokens"], rtol=1e-6)
        np.testing.assert_allclose(
            unbox(tree["projector"]["cross_attn_0"]["k"]["kernel"]),
            hf["qformer.encoder.layer.0.crossattention.attention.key"
               ".weight"].T, rtol=1e-6)
        # OPT positions (+2 rows) and per-layer norms
        np.testing.assert_allclose(
            unbox(tree["decoder"]["pos_embed"]["embedding"]),
            hf["language_model.model.decoder.embed_positions.weight"],
            rtol=1e-6)
        # full forward is finite
        s = cfg.vision.image_size
        logits = module.apply(out, jnp.zeros((1, s, s, 3), jnp.float32),
                              jnp.zeros((1, 0), jnp.int32),
                              jnp.ones((1, 3), jnp.int32))
        assert np.isfinite(np.asarray(logits)).all()


class TestQuantizedLoad:
    @pytest.mark.parametrize("bits", [8, 4])
    def test_loads_into_quantized_dense(self, tmp_path, bits):
        from vlm_tpu.ops.quant import QuantizedWeight, dequantize
        cfg = llava_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32,
                                  quant_bits=bits)
        hf = _fake_llava_checkpoint(tmp_path, cfg)
        out = load_vlm_weights("llava", cfg, tmp_path, params)
        node = out["params"]["decoder"]["block_0"]["attn"]["q_proj"]

        def unbox(x):
            return x.unbox() if hasattr(x, "unbox") else x

        q = unbox(node["q_kernel"])
        scale = unbox(node["scale"])
        assert q.dtype == jnp.int8
        want = hf["language_model.model.layers.0.self_attn.q_proj.weight"].T
        gs = 0 if bits == 8 else (want.shape[0] // scale.shape[0])
        deq = dequantize(QuantizedWeight(q, scale, gs))
        rel = float(jnp.abs(deq - want).max() / jnp.abs(want).max())
        assert rel < (0.01 if bits == 8 else 0.15)
        # vision tower stays fp
        assert "kernel" in out["params"]["vision"]["block_0"]["attn"]["q_proj"]

    def test_loads_into_quantized_vision_tower(self, tmp_path):
        """``quantize_vision``: the loader writes the checkpoint's fp
        vision kernels into (q_kernel, scale) exactly as it does for the
        decoder (reference whole-model load_in_8bit,
        `/root/reference/models/base_model.py:85-91`)."""
        from vlm_tpu.ops.quant import QuantizedWeight, dequantize
        cfg = llava_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32,
                                  quant_bits=8, vision_quant_bits=8)
        hf = _fake_llava_checkpoint(tmp_path, cfg)
        out = load_vlm_weights("llava", cfg, tmp_path, params)
        node = out["params"]["vision"]["block_0"]["attn"]["q_proj"]

        def unbox(x):
            return x.unbox() if hasattr(x, "unbox") else x

        q = unbox(node["q_kernel"])
        assert q.dtype == jnp.int8
        want = hf["vision_tower.vision_model.encoder.layers.0"
                  ".self_attn.q_proj.weight"].T
        deq = dequantize(QuantizedWeight(q, unbox(node["scale"]), 0))
        rel = float(jnp.abs(deq - want).max() / jnp.abs(want).max())
        assert rel < 0.01

    def test_generation_with_quantized_converted_weights(self, tmp_path):
        from vlm_tpu.models.factory import VLMModelFactory
        _fake_llava_checkpoint(tmp_path, llava_config("test"))
        m = VLMModelFactory.create_model("llava", model_id=str(tmp_path),
                                         quantization="8bit", size="test")
        from PIL import Image
        img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
        out = m.generate_batch([img], "x", max_tokens=3)
        assert len(out) == 1

    def test_missing_model_id_path_raises(self):
        from vlm_tpu.models.factory import VLMModelFactory
        with pytest.raises(FileNotFoundError, match="local checkpoint"):
            VLMModelFactory.create_model(
                "llava", model_id="llava-hf/llava-1.5-7b-hf", size="test")


class TestPrefixLM:
    def test_prefix_tokens_attend_bidirectionally(self):
        """For PaliGemma, a prefix token's logits must depend on LATER
        prefix tokens (bidirectional prefix), unlike a causal model."""
        from vlm_tpu.models.configs import paligemma_config
        cfg = paligemma_config("test")
        assert cfg.prefix_lm
        module, params = init_vlm(cfg, jax.random.key(1), dtype=jnp.float32)
        s = cfg.vision.image_size
        px = jnp.zeros((1, s, s, 3), jnp.float32)
        pre = jnp.zeros((1, 0), jnp.int32)
        post_a = jnp.asarray([[5, 6, 7]], jnp.int32)
        post_b = jnp.asarray([[5, 6, 9]], jnp.int32)   # change the LAST token
        la = module.apply(params, px, pre, post_a)
        lb = module.apply(params, px, pre, post_b)
        # logits at the FIRST text position differ because later prefix
        # tokens are visible
        assert float(jnp.abs(la[:, -3] - lb[:, -3]).max()) > 1e-6

    def test_causal_family_is_still_causal(self):
        cfg = llava_config("test")
        module, params = init_vlm(cfg, jax.random.key(1), dtype=jnp.float32)
        s = cfg.vision.image_size
        px = jnp.zeros((1, s, s, 3), jnp.float32)
        pre = jnp.ones((1, 2), jnp.int32)
        post_a = jnp.asarray([[5, 6, 7]], jnp.int32)
        post_b = jnp.asarray([[5, 6, 9]], jnp.int32)
        la = module.apply(params, px, pre, post_a)
        lb = module.apply(params, px, pre, post_b)
        # earlier positions must NOT see the changed future token
        assert float(jnp.abs(la[:, :-1] - lb[:, :-1]).max()) < 1e-6
