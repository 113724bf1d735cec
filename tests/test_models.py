"""Model stack tests: ViT/decoder/VLM forward, KV-cache decode parity,
factory + generation API, backbone freeze semantics.

All on tiny ("test") configs on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vlm_tpu.models.configs import (blip2_config, llava_config,
                                    paligemma_config)
from vlm_tpu.models.factory import VLMModelFactory
from vlm_tpu.models.vlm import init_kv_cache, init_vlm, num_image_tokens

CONFIGS = {
    "llava": llava_config,
    "paligemma": paligemma_config,
    "blip2": blip2_config,
}


def _images(n=2, seed=0):
    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 255, (50, 60, 3), dtype=np.uint8))
            for _ in range(n)]


@pytest.fixture(scope="module", params=list(CONFIGS))
def tiny_vlm(request):
    cfg = CONFIGS[request.param]("test")
    module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
    return request.param, cfg, module, params


class TestVLMForward:
    def test_full_forward_shape(self, tiny_vlm):
        name, cfg, mod, params = tiny_vlm
        s = cfg.vision.image_size
        px = jnp.zeros((2, s, s, 3), jnp.float32)
        pre = jnp.ones((2, 3), jnp.int32)
        post = jnp.ones((2, 4), jnp.int32)
        logits = mod.apply(params, px, pre, post)
        t = num_image_tokens(cfg)
        assert logits.shape == (2, 3 + t + 4, cfg.decoder.vocab_size)

    def test_prefill_and_decode_match_full_forward(self, tiny_vlm):
        name, cfg, mod, params = tiny_vlm
        s = cfg.vision.image_size
        rng = np.random.default_rng(1)
        px = jnp.asarray(rng.normal(size=(2, s, s, 3)), jnp.float32)
        pre = jnp.ones((2, 3), jnp.int32)
        post = jnp.ones((2, 4), jnp.int32)
        t = num_image_tokens(cfg)
        plen = jnp.full((2,), 3 + t + 4, jnp.int32)

        logits = mod.apply(params, px, pre, post)
        cache = init_kv_cache(cfg.decoder, 2, 64, jnp.float32)
        last, cache = mod.apply(params, px, pre, post, cache, plen,
                                method="prefill")
        assert float(jnp.abs(last - logits[:, -1]).max()) < 2e-3

        nxt = jnp.argmax(last, -1)[:, None].astype(jnp.int32)
        step_logits, cache = mod.apply(params, nxt, plen, cache,
                                       method="decode_step")
        # Prefix-LM families need the prefix boundary for the appended
        # (causal) token in the full forward.
        logits2 = mod.apply(params, px, pre,
                            jnp.concatenate([post, nxt], axis=1),
                            prefix_len=plen if cfg.prefix_lm else None)
        assert float(jnp.abs(step_logits - logits2[:, -1]).max()) < 2e-3

    def test_prompt_padding_is_masked(self, tiny_vlm):
        """A padded prompt must produce the same next-token logits as the
        unpadded one (left-aligned + kv_len masking)."""
        name, cfg, mod, params = tiny_vlm
        s = cfg.vision.image_size
        px = jnp.asarray(np.random.default_rng(2).normal(size=(1, s, s, 3)),
                         jnp.float32)
        pre = jnp.asarray([[5, 6]], jnp.int32)
        post = jnp.asarray([[7, 8, 9]], jnp.int32)
        t = num_image_tokens(cfg)
        plen = jnp.asarray([2 + t + 3], jnp.int32)

        cache = init_kv_cache(cfg.decoder, 1, 64, jnp.float32)
        last_a, _ = mod.apply(params, px, pre, post, cache, plen,
                              method="prefill")
        post_pad = jnp.asarray([[7, 8, 9, 0, 0]], jnp.int32)
        cache = init_kv_cache(cfg.decoder, 1, 64, jnp.float32)
        last_b, _ = mod.apply(params, px, pre, post_pad, cache, plen,
                              method="prefill")
        assert float(jnp.abs(last_a - last_b).max()) < 2e-3


class TestFactoryAndGeneration:
    def test_registry(self):
        assert set(VLMModelFactory.get_available_models()) == \
            {"blip2", "llava", "paligemma"}

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError):
            VLMModelFactory.create_model("nope")

    def test_generate_batch_and_single_agree(self):
        m = VLMModelFactory.create_model("paligemma", quantization="fp32",
                                         size="test")
        imgs = _images(2)
        outs = m.generate_batch(imgs, "describe", max_tokens=6)
        assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
        single = m.generate_text(imgs[0], "describe", max_tokens=6)
        assert single == outs[0]

    def test_generation_is_deterministic(self):
        m = VLMModelFactory.create_model("paligemma", quantization="fp32",
                                         size="test")
        imgs = _images(2, seed=3)
        a = m.generate_batch(imgs, "x", max_tokens=5)
        b = m.generate_batch(imgs, "x", max_tokens=5)
        assert a == b


class TestVisionBackbone:
    @pytest.fixture(scope="class")
    def backbone(self):
        m = VLMModelFactory.create_model("llava", quantization="fp32",
                                         size="test")
        return m.get_vision_backbone()

    def test_features_shape_and_dim(self, backbone):
        feats = backbone.forward(_images(3))
        assert feats.shape == (3, backbone.output_dim)

    def test_cleanup_released_model(self):
        m = VLMModelFactory.create_model("llava", quantization="fp32",
                                         size="test")
        m.get_vision_backbone(cleanup=True)
        assert m.params is None and m.module is None

    def test_frozen_by_default(self, backbone):
        assert backbone.fully_frozen

    def test_unfreeze_last_k(self, backbone):
        backbone.set_freeze(True)
        backbone.unfreeze_last_k_layers(k=1, parts="attn",
                                        include_embeddings=False)
        mask = backbone.trainable_mask
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        trainable = {tuple(str(getattr(k, "key", "?")) for k in p)
                     for p, v in flat if v}
        # Only block_1 attn + its norms.
        assert trainable and all("block_1" in p for p in trainable)
        assert not any("fc1" in p for p in trainable)
        assert any("q_proj" in p for p in trainable)
        assert any("ln1" in p or "ln2" in p for p in trainable)

    def test_unfreeze_includes_embeddings(self, backbone):
        backbone.set_freeze(True)
        backbone.unfreeze_last_k_layers(k=1, parts="all",
                                        include_embeddings=True)
        flat = jax.tree_util.tree_flatten_with_path(
            backbone.trainable_mask)[0]
        trainable = {tuple(str(getattr(k, "key", "?")) for k in p)
                     for p, v in flat if v}
        assert any("patch_embed" in p for p in trainable)
        assert any("pos_embed" in p for p in trainable)

    def test_lora_target_names(self, backbone):
        names = backbone.get_lora_target_names({"last_k": 1,
                                                "attn_only": True})
        assert names == ["block_1/attn/k_proj", "block_1/attn/out_proj",
                         "block_1/attn/q_proj", "block_1/attn/v_proj"]
        names = backbone.get_lora_target_names({"last_k": 2,
                                                "attn_only": False})
        assert any("fc1" in n for n in names)
        assert any("block_0" in n for n in names)
