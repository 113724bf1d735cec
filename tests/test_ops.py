"""Ops tests: preprocessing recipes and attention kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vlm_tpu.ops import preprocess as pp
from vlm_tpu.ops.attention import attention


class TestPreprocess:
    def _img(self, seed=0, size=(100, 80)):
        rng = np.random.default_rng(seed)
        return Image.fromarray(
            rng.integers(0, 255, (*size, 3), dtype=np.uint8))

    @pytest.mark.parametrize("name,size", [("llava", 336), ("paligemma", 224),
                                           ("blip2", 224)])
    def test_host_resize_shapes(self, name, size):
        arr = pp.host_resize(self._img(), pp.recipe_for(name))
        assert arr.shape == (size, size, 3) and arr.dtype == np.uint8

    def test_shortest_edge_crop_is_center(self):
        # A 200x100 image resized for CLIP: shortest edge 100 → 336,
        # width 672, crop center 336.
        img = self._img(size=(100, 200))  # PIL size (200, 100) w,h
        arr = pp.host_resize(img, pp.recipe_for("llava"))
        assert arr.shape == (336, 336, 3)

    def test_normalize_matches_manual(self):
        batch = pp.host_batch([self._img(), self._img(1)],
                              pp.recipe_for("paligemma"))
        out = pp.normalize_images(jnp.asarray(batch),
                                  recipe=pp.recipe_for("paligemma"),
                                  compute_dtype=jnp.float32)
        exp = (batch.astype(np.float32) / 255.0 - 0.5) / 0.5
        assert float(jnp.abs(out - exp).max()) < 1e-6

    def test_pallas_normalize_matches_jnp(self):
        recipe = pp.recipe_for("blip2")
        batch = pp.host_batch([self._img(2)], recipe)
        a = pp.normalize_images(jnp.asarray(batch), recipe=recipe,
                                compute_dtype=jnp.float32)
        b = pp.normalize_images(jnp.asarray(batch), recipe=recipe,
                                compute_dtype=jnp.float32, use_pallas=True)
        assert float(jnp.abs(a - b).max()) < 1e-6

    def test_unknown_recipe_raises(self):
        with pytest.raises(ValueError):
            pp.recipe_for("nope")


class TestAttention:
    def _qkv(self, b=2, h=4, s=96, d=64, sk=None, seed=0):
        rng = np.random.default_rng(seed)
        sk = sk or s
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, h, sk, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, h, sk, d)), jnp.float32)
        return q, k, v

    @pytest.mark.parametrize("causal", [False, True])
    def test_flash_matches_xla(self, causal):
        q, k, v = self._qkv()
        a = attention(q, k, v, causal=causal, impl="xla")
        b = attention(q, k, v, causal=causal, impl="flash")
        assert float(jnp.abs(a - b).max()) < 1e-5

    def test_flash_cached_prefix_alignment(self):
        q, k, v = self._qkv()
        q2 = q[:, :, :7]
        a = attention(q2, k, v, causal=True, impl="xla")
        b = attention(q2, k, v, causal=True, impl="flash")
        assert float(jnp.abs(a - b).max()) < 1e-5

    @pytest.mark.parametrize("impl", ["xla", "flash"])
    def test_kv_len_masks_padding(self, impl):
        q, k, v = self._qkv(s=8)
        kv_len = jnp.array([4, 8])
        out = attention(q, k, v, kv_len=kv_len, impl=impl)
        # Sequence 0 must be independent of k/v beyond position 4.
        k2 = k.at[0, :, 4:].set(99.0)
        v2 = v.at[0, :, 4:].set(-99.0)
        out2 = attention(q, k2, v2, kv_len=kv_len, impl=impl)
        assert float(jnp.abs(out - out2).max()) < 1e-6

    def test_flash_kv_len_matches_xla(self):
        q, k, v = self._qkv(s=16)
        kv_len = jnp.array([5, 16])
        a = attention(q, k, v, causal=True, kv_len=kv_len, impl="xla")
        b = attention(q, k, v, causal=True, kv_len=kv_len, impl="flash")
        # Rows beyond kv_len attend to garbage in both impls but are
        # ignored downstream; compare only valid query rows.
        assert float(jnp.abs(a[0, :, :5] - b[0, :, :5]).max()) < 1e-5
        assert float(jnp.abs(a[1] - b[1]).max()) < 1e-5

    def test_flash_rejects_bias(self):
        q, k, v = self._qkv(s=8)
        with pytest.raises(ValueError):
            attention(q, k, v, bias=jnp.zeros((2, 4, 8, 8)), impl="flash")

    @pytest.mark.parametrize("d", [72, 88])
    def test_flash_offwidth_head_dim_matches_xla(self, d):
        # ViT head dims (SigLIP 72, EVA-g 88) are zero-padded to the lane
        # width inside _flash_attention — exact, since zero q/k columns
        # add nothing to the scores and padded v columns are sliced away.
        q, k, v = self._qkv(d=d)
        a = attention(q, k, v, causal=False, impl="xla")
        b = attention(q, k, v, causal=False, impl="flash")
        assert b.shape == a.shape
        assert float(jnp.abs(a - b).max()) < 1e-5

    def test_flash_rejects_wide_head_dim(self):
        q, k, v = self._qkv(d=288)
        with pytest.raises(ValueError):
            attention(q, k, v, impl="flash")

    def test_flash_prefix_lm_matches_xla(self):
        # PaliGemma prefill: bidirectional prefix + causal suffix, with
        # per-row padding lengths (the product call shape in
        # models/decoder.py — prefix_len and kv_len together).
        q, k, v = self._qkv(s=16)
        prefix = jnp.array([6, 11])
        a = attention(q, k, v, causal=True, prefix_len=prefix, impl="xla")
        b = attention(q, k, v, causal=True, prefix_len=prefix, impl="flash")
        assert float(jnp.abs(a - b).max()) < 1e-5
        kv_len = jnp.array([9, 16])
        a = attention(q, k, v, causal=True, prefix_len=prefix, kv_len=kv_len,
                      impl="xla")
        b = attention(q, k, v, causal=True, prefix_len=prefix, kv_len=kv_len,
                      impl="flash")
        # Query rows beyond kv_len see garbage in both impls (discarded
        # downstream); compare the valid rows.
        assert float(jnp.abs(a[0, :, :9] - b[0, :, :9]).max()) < 1e-5
        assert float(jnp.abs(a[1] - b[1]).max()) < 1e-5

    def test_flash_prefix_actually_widens_mask(self):
        # Sanity that prefix positions really are visible: with prefix over
        # the full row, flash(causal+prefix) == flash(non-causal).
        q, k, v = self._qkv(s=12)
        full = jnp.array([12, 12])
        a = attention(q, k, v, causal=False, impl="flash")
        b = attention(q, k, v, causal=True, prefix_len=full, impl="flash")
        assert float(jnp.abs(a - b).max()) < 1e-5

    def test_flash_rejects_noncausal_prefix(self):
        q, k, v = self._qkv(s=8)
        with pytest.raises(ValueError):
            attention(q, k, v, causal=False, prefix_len=jnp.array([2, 3]),
                      impl="flash")


class TestGQAAttention:
    def _gqa(self, b=2, h=8, kvh=2, s=32, d=64, seed=0):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, kvh, s, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, kvh, s, d)), jnp.float32)
        return q, k, v

    @pytest.mark.parametrize("impl", ["xla", "flash"])
    @pytest.mark.parametrize("kvh", [1, 2])
    def test_grouped_matches_repeated(self, impl, kvh):
        q, k, v = self._gqa(kvh=kvh)
        rep = q.shape[1] // kvh
        ref = attention(q, jnp.repeat(k, rep, axis=1),
                        jnp.repeat(v, rep, axis=1), causal=True, impl="xla")
        out = attention(q, k, v, causal=True, impl=impl)
        assert float(jnp.abs(out - ref).max()) < 1e-5

    def test_grouped_with_kv_len(self):
        q, k, v = self._gqa(kvh=2, seed=1)
        kv_len = jnp.array([10, 32])
        rep = q.shape[1] // 2
        ref = attention(q, jnp.repeat(k, rep, axis=1),
                        jnp.repeat(v, rep, axis=1), kv_len=kv_len,
                        impl="xla")
        for impl in ("xla", "flash"):
            out = attention(q, k, v, kv_len=kv_len, impl=impl)
            assert float(jnp.abs(out - ref).max()) < 1e-5, impl


class TestFlashGradients:
    """The fused kernel's custom_vjp: Pallas forward + XLA-derived backward
    (probe training with unfrozen backbone layers stays fused)."""

    def _qkv(self, b=2, h=4, s=64, d=64, seed=3):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
        return mk(), mk(), mk()

    @pytest.mark.parametrize("causal", [False, True])
    def test_flash_grads_match_xla(self, causal):
        q, k, v = self._qkv()
        w = jnp.asarray(np.random.default_rng(9).normal(
            size=q.shape), jnp.float32)

        def loss(impl):
            def f(q, k, v):
                o = attention(q, k, v, causal=causal, impl=impl)
                return jnp.sum(o * w)
            return f

        gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gx, gf):
            assert float(jnp.abs(a - b).max()) < 1e-4

    def test_flash_forward_value_used(self):
        # the primal output must come from the Pallas kernel, not the
        # recompute path: value_and_grad's value == impl="flash" forward
        q, k, v = self._qkv(seed=5)

        def f(q):
            return jnp.sum(attention(q, k, v, impl="flash") ** 2)

        val, _ = jax.value_and_grad(f)(q)
        ref = jnp.sum(attention(q, k, v, impl="flash") ** 2)
        assert float(jnp.abs(val - ref)) < 1e-5


class TestKVScatterWrite:
    """Pallas per-slot cache writes == the masked-select reference."""

    def _mk(self, b=5, max_len=16, h=2, d=128, s=1, seed=0):
        rng = np.random.default_rng(seed)
        ck = jnp.asarray(rng.normal(size=(b, max_len, h, d)), jnp.float32)
        cv = jnp.asarray(rng.normal(size=(b, max_len, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        start = jnp.asarray(rng.integers(0, max_len - s + 1, size=b),
                            jnp.int32)
        return ck, cv, k, v, start

    def test_matches_masked_reference(self):
        from vlm_tpu.ops.kvcache import kv_masked_write, kv_scatter_write
        ck, cv, k, v, start = self._mk()
        ref_k = kv_masked_write(ck, k, start)
        ref_v = kv_masked_write(cv, v, start)
        got_k, got_v = kv_scatter_write(ck, cv, k, v, start)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))

    def test_bf16_and_duplicate_offsets(self):
        from vlm_tpu.ops.kvcache import kv_masked_write, kv_scatter_write
        ck, cv, k, v, _ = self._mk(seed=3)
        ck, cv = ck.astype(jnp.bfloat16), cv.astype(jnp.bfloat16)
        start = jnp.asarray([4, 4, 0, 15, 7], jnp.int32)
        ref_k = kv_masked_write(ck, k, start)
        got_k, got_v = kv_scatter_write(ck, cv, k, v, start)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        assert got_k.dtype == jnp.bfloat16

    def test_under_jit_inside_decode_shape(self):
        # the decoder calls this inside jit with donated caches
        from vlm_tpu.ops.kvcache import kv_scatter_write

        @jax.jit
        def step(ck, cv, k, v, start):
            return kv_scatter_write(ck, cv, k, v, start)

        ck, cv, k, v, start = self._mk(b=3, max_len=8, h=1, d=128)
        got_k, got_v = step(ck, cv, k, v, start)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(got_k[i, int(start[i]), :, :]),
                np.asarray(k[i, 0]), rtol=0, atol=0)


class TestKVUniformWrite:
    """One-program Pallas uniform-column write == dynamic_update_slice
    (the rotating decode window / MHA wave decode write path)."""

    def _mk(self, b=5, max_len=16, h=2, d=128, seed=1):
        rng = np.random.default_rng(seed)
        ck = jnp.asarray(rng.normal(size=(b, max_len, h, d)), jnp.float32)
        cv = jnp.asarray(rng.normal(size=(b, max_len, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
        return ck, cv, k, v

    def test_matches_dus_reference(self):
        from vlm_tpu.ops.kvcache import kv_uniform_write
        ck, cv, k, v = self._mk()
        for col in (0, 7, 15):
            start = jnp.full((ck.shape[0],), col, jnp.int32)
            off = (0, col, 0, 0)
            ref_k = jax.lax.dynamic_update_slice(ck, k, off)
            ref_v = jax.lax.dynamic_update_slice(cv, v, off)
            got_k, got_v = kv_uniform_write(ck, cv, k, v, start)
            np.testing.assert_array_equal(np.asarray(got_k),
                                          np.asarray(ref_k))
            np.testing.assert_array_equal(np.asarray(got_v),
                                          np.asarray(ref_v))

    def test_bf16_under_jit(self):
        from vlm_tpu.ops.kvcache import kv_uniform_write

        @jax.jit
        def step(ck, cv, k, v, start):
            return kv_uniform_write(ck, cv, k, v, start)

        ck, cv, k, v = self._mk(b=3, max_len=8, h=1, d=128, seed=2)
        ck, cv = ck.astype(jnp.bfloat16), cv.astype(jnp.bfloat16)
        start = jnp.full((3,), 5, jnp.int32)
        got_k, _ = step(ck, cv, k, v, start)
        assert got_k.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got_k[:, 5]), np.asarray(k[:, 0], np.float32)
            .astype(jnp.bfloat16))

    def test_multirow_raises(self):
        from vlm_tpu.ops.kvcache import kv_uniform_write
        ck, cv, _, _ = self._mk(b=2, max_len=8)
        k2 = jnp.zeros((2, 2, 2, 128), jnp.float32)
        with pytest.raises(ValueError, match="S == 1"):
            kv_uniform_write(ck, cv, k2, k2, jnp.zeros((2,), jnp.int32))
