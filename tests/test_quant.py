"""Quantization tests: int8/int4 round-trip accuracy, fused matmul parity,
and quantized model modes running end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_tpu.ops import quant


def _w(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(
        scale=0.05, size=shape), jnp.float32)


class TestQuantizeRoundtrip:
    def test_int8_error_small(self):
        w = _w((256, 128))
        qw = quant.quantize_int8(w)
        assert qw.q.dtype == jnp.int8 and qw.scale.shape == (1, 128)
        deq = quant.dequantize(qw)
        rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
        assert rel < 0.01        # 1/127 half-step

    def test_int4_error_small(self):
        w = _w((256, 128), seed=1)
        qw = quant.quantize_int4(w, group_size=128)
        assert qw.q.shape == (128, 128)      # packed along input dim
        assert qw.scale.shape == (2, 128)
        deq = quant.dequantize(qw)
        rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
        assert rel < 0.15        # 1/7 half-step with per-group scaling

    def test_int4_pack_unpack_exact(self):
        w = _w((16, 8), seed=2)
        qw = quant.quantize_int4(w, group_size=16)
        unpacked = quant._unpack_int4(qw.q)
        assert unpacked.shape == (16, 8)
        assert int(jnp.abs(unpacked).max()) <= 7

    def test_per_channel_scales_differ(self):
        w = jnp.concatenate([_w((64, 1)), 10 * _w((64, 1), 3)], axis=1)
        qw = quant.quantize_int8(w)
        assert float(qw.scale[0, 1]) > 5 * float(qw.scale[0, 0])


class TestQuantMatmul:
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_int8_matmul_matches_dequant(self, use_pallas):
        x = _w((32, 256), seed=4)
        qw = quant.quantize_int8(_w((256, 128), seed=5))
        ref = x @ quant.dequantize(qw)
        out = quant.quant_matmul(x, qw, use_pallas=use_pallas)
        # The pallas kernel feeds the MXU bf16 operands (4x throughput);
        # allow bf16-level rounding vs the fp32 reference.
        tol = 1e-3 if use_pallas else 1e-4
        assert float(jnp.abs(out - ref).max()) < tol

    def test_int4_matmul_matches_dequant(self):
        x = _w((8, 256), seed=6)
        qw = quant.quantize_int4(_w((256, 64), seed=7))
        ref = x @ quant.dequantize(qw)
        out = quant.quant_matmul(x, qw, use_pallas=False)
        assert float(jnp.abs(out - ref).max()) < 1e-4

    def test_pallas_padding_path(self):
        # shapes not multiples of the block sizes
        x = _w((13, 64), seed=8)
        qw = quant.quantize_int8(_w((64, 100), seed=9))
        ref = x @ quant.dequantize(qw)
        out = quant.quant_matmul(x, qw, use_pallas=True)
        assert out.shape == (13, 100)
        assert float(jnp.abs(out - ref).max()) < 1e-3

    def test_pick_block_n_prefers_dividing_tiles(self):
        # 11008 (7B MLP) is not a multiple of 512 but is of 256: a dividing
        # tile avoids materializing a padded copy of the whole weight.
        assert quant._pick_block_n(11008, 512) == 256
        assert quant._pick_block_n(11264, 512) == 512
        assert quant._pick_block_n(2048, 512) == 512
        # 1408 = 128*11: only 128 divides; still lane-aligned.
        assert quant._pick_block_n(1408, 512) == 128
        # no lane-aligned divisor ≤ cap → fall back to cap (padding path)
        assert quant._pick_block_n(100, 512) == 100
        assert quant._pick_block_n(8128 + 64, 512) == 512

    def test_pallas_dividing_tile_shapes_match_reference(self):
        # n divisible by 128 but not by the 512 cap → dividing-tile path
        x = _w((16, 64), seed=18)
        qw = quant.quantize_int8(_w((64, 1408), seed=19))
        ref = x @ quant.dequantize(qw)
        out = quant.quant_matmul(x, qw, use_pallas=True)
        assert out.shape == (16, 1408)
        assert float(jnp.abs(out - ref).max()) < 1e-3


class TestQuantizedModels:
    @pytest.mark.parametrize("mode", ["8bit", "4bit"])
    def test_generation_runs_quantized(self, mode):
        from PIL import Image

        from vlm_tpu.models.factory import VLMModelFactory
        m = VLMModelFactory.create_model("paligemma", quantization=mode,
                                         size="test")
        # quantized params exist in the decoder, fp kernels in the vision tower
        dec = m.params["params"]["decoder"]["block_0"]["attn"]["q_proj"]
        assert "q_kernel" in dec and "scale" in dec
        vis = m.params["params"]["vision"]["block_0"]["attn"]["q_proj"]
        assert "kernel" in vis
        img = Image.fromarray(np.random.default_rng(0).integers(
            0, 255, (40, 40, 3), dtype=np.uint8))
        outs = m.generate_batch([img, img], "hi", max_tokens=4)
        assert len(outs) == 2

    def test_quantized_weight_memory_is_smaller(self):
        from vlm_tpu.models.configs import paligemma_config
        from vlm_tpu.models.vlm import init_vlm
        cfg = paligemma_config("test")
        _, p8 = init_vlm(cfg, jax.random.key(0), quant_bits=8)
        _, pfp = init_vlm(cfg, jax.random.key(0), quant_bits=0)

        def nbytes(tree):
            return sum(x.size * x.dtype.itemsize
                       for x in jax.tree.leaves(tree))
        d8 = nbytes(p8["params"]["decoder"]["block_0"])
        dfp = nbytes(pfp["params"]["decoder"]["block_0"])
        assert d8 < 0.45 * dfp


class TestDynamicInt8:
    def test_activation_quant_roundtrip(self):
        x = _w((16, 128), seed=10) * 3.0
        qx, sx = quant.quantize_activations(x)
        rel = float(jnp.abs(qx * sx - x).max() / jnp.abs(x).max())
        assert rel < 0.01

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_dynamic_matmul_close_to_fp(self, use_pallas):
        x = _w((256, 256), seed=11)
        w = _w((256, 128), seed=12)
        qw = quant.quantize_int8(w)
        ref = x @ w
        out = quant.quant_matmul_dynamic(x, qw, use_pallas=use_pallas)
        # two int8 quantizations → ~1-2% relative error budget
        rel = float(jnp.abs(out - ref).max() /
                    jnp.abs(ref).max())
        assert rel < 0.03

    def test_pallas_matches_fallback(self):
        x = _w((130, 64), seed=13)
        qw = quant.quantize_int8(_w((64, 100), seed=14))
        a = quant.quant_matmul_dynamic(x, qw, use_pallas=False)
        b = quant.quant_matmul_dynamic(x, qw, use_pallas=True)
        assert float(jnp.abs(a - b).max()) < 1e-4

    def test_native_int8_dot_is_exact(self):
        # The default path feeds int8 operands straight to dot_general
        # (int32 accumulator, the MXU's native int8 mode). int8xint8
        # products summed over K=4096 stay far inside int32, so the
        # accumulation must be bit-exact vs an explicit int32 upcast.
        qx = jax.random.randint(jax.random.key(0), (64, 4096), -127, 128,
                                dtype=jnp.int32).astype(jnp.int8)
        qw = jax.random.randint(jax.random.key(1), (4096, 96), -127, 128,
                                dtype=jnp.int32).astype(jnp.int8)
        fast = jax.lax.dot_general(qx, qw, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        ref = jax.lax.dot_general(qx.astype(jnp.int32),
                                  qw.astype(jnp.int32),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        assert bool(jnp.all(fast == ref))

    def test_8bit_model_uses_dynamic_path_in_prefill(self):
        # structural check: a big-batch forward through a quantized Dense
        # routes to the dynamic kernel without error
        import flax.linen as nn
        from vlm_tpu.models.layers import Dense
        d = Dense(64, quant_bits=8, dtype=jnp.float32,
                  param_dtype=jnp.float32)
        params = d.init(jax.random.key(0), jnp.zeros((256, 32)))
        y = d.apply(params, jnp.ones((256, 32)))
        assert y.shape == (256, 64)
        y2 = d.apply(params, jnp.ones((4, 32)))   # decode-like path
        assert y2.shape == (4, 64)

    @pytest.mark.parametrize("mode", ["dequant", "dynamic", "dynamic_noout"])
    def test_8bit_prefill_dispatch_numerics_match(self, monkeypatch, mode):
        # every VLM_TPU_INT8_PREFILL mode must agree with the small-m
        # weight-only path on identical weights (int8 activation quant in
        # the dynamic modes adds ~1/127-scale rounding)
        from vlm_tpu.models.layers import Dense
        monkeypatch.setenv("VLM_TPU_INT8_PREFILL", mode)
        d = Dense(64, quant_bits=8, dtype=jnp.float32,
                  param_dtype=jnp.float32, use_bias=False)
        params = d.init(jax.random.key(0), jnp.zeros((600, 32)))
        x = jax.random.normal(jax.random.key(1), (600, 32))
        y_prefill = d.apply(params, x)            # m >= 512: mode branch
        y_rows = d.apply(params, x[:8])           # m < 512: weight-only
        assert y_prefill.shape == (600, 64)
        np.testing.assert_allclose(np.asarray(y_prefill[:8]),
                                   np.asarray(y_rows), rtol=3e-2, atol=3e-2)

    @pytest.mark.parametrize("mode", ["dequant", "fused"])
    def test_4bit_prefill_dispatch_numerics_match(self, monkeypatch, mode):
        # the int4 large-m hybrid (VLM_TPU_INT4_PREFILL) must agree with
        # the small-m fused path on identical weights
        from vlm_tpu.models.layers import Dense
        monkeypatch.setenv("VLM_TPU_INT4_PREFILL", mode)
        d = Dense(64, quant_bits=4, quant_group=16, dtype=jnp.float32,
                  param_dtype=jnp.float32, use_bias=False)
        params = d.init(jax.random.key(0), jnp.zeros((600, 32)))
        x = jax.random.normal(jax.random.key(1), (600, 32))
        y_prefill = d.apply(params, x)            # m >= 512: hybrid branch
        y_rows = d.apply(params, x[:8])           # m < 512: fused branch
        assert y_prefill.shape == (600, 64)
        np.testing.assert_allclose(np.asarray(y_prefill[:8]),
                                   np.asarray(y_rows), rtol=2e-2, atol=2e-2)


class TestInt4Pallas:
    def test_int4_pallas_matches_dequant(self):
        x = _w((32, 256), seed=10)
        qw = quant.quantize_int4(_w((256, 128), seed=11), group_size=64)
        ref = x @ quant.dequantize(qw)
        out = quant.quant_matmul(x, qw, use_pallas=True)
        assert out.shape == ref.shape
        assert float(jnp.abs(out - ref).max()) < 2e-3

    def test_int4_pallas_padding_path(self):
        x = _w((9, 128), seed=12)
        qw = quant.quantize_int4(_w((128, 100), seed=13), group_size=32)
        ref = x @ quant.dequantize(qw)
        out = quant.quant_matmul(x, qw, use_pallas=True)
        assert out.shape == (9, 100)
        assert float(jnp.abs(out - ref).max()) < 2e-3


class TestOutlierDecomposition:
    def _outlier_x(self, m=16, k=256, seed=20):
        rng = np.random.default_rng(seed)
        x = rng.normal(0, 1, (m, k)).astype(np.float32)
        # emergent outlier features: a few columns with huge magnitudes
        x[:, [3, 77, 200]] *= 40.0
        return jnp.asarray(x)

    def test_outlier_matmul_more_accurate(self):
        x = self._outlier_x()
        w = _w((256, 128), seed=21)
        qw = quant.quantize_int8(w)
        ref = x @ w
        plain = quant.quant_matmul_dynamic(x, qw, out_dtype=jnp.float32,
                                           use_pallas=False)
        decomp = quant.quant_matmul_outlier(x, qw, n_outliers=8,
                                            out_dtype=jnp.float32,
                                            use_pallas=False)
        err_plain = float(jnp.abs(plain - ref).mean())
        err_decomp = float(jnp.abs(decomp - ref).mean())
        # outlier columns no longer blow up the per-row activation scale
        assert err_decomp < err_plain / 3, (err_plain, err_decomp)

    def test_outlier_budget_clamped(self):
        rng = np.random.default_rng(22)
        x = jnp.asarray(rng.normal(0, 1, (4, 32)).astype(np.float32))
        qw = quant.quantize_int8(_w((32, 16), seed=23))
        out = quant.quant_matmul_outlier(x, qw, n_outliers=64,
                                         use_pallas=False)
        assert out.shape == (4, 16)



class TestVisionQuant:
    """``quantize_vision``: tower Dense layers quantized to the decoder's
    bits (reference whole-model ``load_in_8bit`` semantics,
    `/root/reference/models/base_model.py:85-91`)."""

    @pytest.mark.parametrize("quant", ["8bit", "4bit"])
    def test_vision_params_quantized_and_forward(self, quant):
        from PIL import Image

        from vlm_tpu.models.factory import VLMModelFactory
        m = VLMModelFactory.create_model(
            "paligemma", size="test", quantization=quant,
            quantize_vision=True)
        blk = m.params["params"]["vision"]["block_0"]["attn"]["q_proj"]
        assert "q_kernel" in blk and "kernel" not in blk
        # patch embedding stays fp (the bnb skip-list analogue)
        emb = m.params["params"]["vision"]["patch_embed"]
        assert not any("q_kernel" in str(k) for k in emb)
        img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
        out = m.generate_batch([img], "x", max_tokens=3)
        assert len(out) == 1

    def test_default_vision_stays_fp(self):
        from vlm_tpu.models.factory import VLMModelFactory
        m = VLMModelFactory.create_model("paligemma", size="test",
                                         quantization="8bit")
        blk = m.params["params"]["vision"]["block_0"]["attn"]["q_proj"]
        assert "kernel" in blk and "q_kernel" not in blk

    def test_unfreeze_and_lora_guards(self):
        from vlm_tpu.models.factory import VLMModelFactory
        bb = VLMModelFactory.create_model(
            "paligemma", size="test", quantization="8bit",
            quantize_vision=True).get_vision_backbone()
        with pytest.raises(ValueError, match="quantized vision tower"):
            bb.unfreeze_last_k_layers(1)
        with pytest.raises(ValueError, match="quantized vision tower"):
            bb.get_lora_target_names({"last_k": 1})
        with pytest.raises(ValueError, match="quantized vision tower"):
            bb.set_freeze(False)        # model.backbone.freeze: false path
        bb.set_freeze(True)             # re-freezing is always fine
        # frozen feature extraction still works
        feats = bb.forward([__import__("PIL.Image", fromlist=["Image"])
                            .fromarray(np.zeros((40, 40, 3), np.uint8))])
        assert np.isfinite(np.asarray(feats)).all()

    def test_int4_group_fallback_non_dividing_dim(self):
        """SigLIP's mlp_dim (4304 = 16*269) doesn't divide the default
        128 group; Dense must fall back to the largest dividing
        power-of-two group instead of asserting."""
        from vlm_tpu.models.layers import Dense
        d = Dense(8, dtype=jnp.float32, param_dtype=jnp.float32,
                  quant_bits=4)
        x = jnp.zeros((2, 144), jnp.float32)    # 144 = 16*9 -> group 16
        params = d.init(jax.random.key(0), x)
        scale = params["params"]["scale"]
        if hasattr(scale, "unbox"):
            scale = scale.unbox()
        assert scale.shape == (144 // 16, 8)
        y = d.apply(params, x)
        assert y.shape == (2, 8)
