"""Parity tests for the fused Pallas decode-step attention kernel.

`ops.decode_attention.flash_decode_attention` must match the XLA bshd
reference (`ops.attention._xla_attention`) bit-for-intent across the cache
variants the decoder produces: bf16 and int8 (scales-on-scores) caches,
MHA/GQA/MQA head groupings, per-slot `kv_len`, the continuous batcher's
non-contiguous `kv_valid` rotating window, and ragged (non-tile-multiple)
cache lengths. Kernels run in interpreter mode on CPU (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_tpu.ops.attention import _xla_attention
from vlm_tpu.ops.decode_attention import flash_decode_attention


def _case(seed, b, h, kvh, d, s, int8, use_valid, use_len):
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(k1, (b, h, 1, d), jnp.float32).astype(jnp.bfloat16)
    if int8:
        kq = jax.random.randint(k2, (b, s, kvh, d), -127, 128, jnp.int8)
        vq = jax.random.randint(k3, (b, s, kvh, d), -127, 128, jnp.int8)
        ks = jax.random.uniform(k4, (b, s, kvh, 1), jnp.float32, 0.005, 0.02)
        vs = jax.random.uniform(k5, (b, s, kvh, 1), jnp.float32, 0.005, 0.02)
        k_x, v_x = kq.astype(jnp.bfloat16), vq.astype(jnp.bfloat16)
        k_p, v_p = kq, vq
    else:
        k_x = jax.random.normal(k2, (b, s, kvh, d)).astype(jnp.bfloat16)
        v_x = jax.random.normal(k3, (b, s, kvh, d)).astype(jnp.bfloat16)
        ks = vs = None
        k_p, v_p = k_x, v_x
    kv_len = None
    if use_len:
        kv_len = jax.random.randint(
            jax.random.PRNGKey(seed + 1), (b,), max(1, s // 3), s + 1,
            jnp.int32)
    kv_valid = None
    if use_valid:
        kv_valid = jax.random.bernoulli(
            jax.random.PRNGKey(seed + 2), 0.8, (b, s)).at[:, 0].set(True)
    return q, k_x, v_x, k_p, v_p, ks, vs, kv_len, kv_valid


def _assert_parity(q, k_x, v_x, k_p, v_p, ks, vs, kv_len, kv_valid, s_tile,
                   d):
    ref = _xla_attention(q, k_x, v_x, causal=False, scale=d ** -0.5,
                         kv_len=kv_len, kv_valid=kv_valid, kv_layout="bshd",
                         k_scale=ks, v_scale=vs)
    got = flash_decode_attention(q, k_p, v_p, kv_len=kv_len,
                                 kv_valid=kv_valid, k_scale=ks, v_scale=vs,
                                 s_tile=s_tile)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    err = np.max(np.abs(r - g)) / (np.max(np.abs(r)) + 1e-9)
    assert err < 2.5e-2, f"relmax={err:.3e}"


class TestFlashDecodeAttention:
    @pytest.mark.parametrize("int8", [False, True])
    def test_mha_kv_len(self, int8):
        # ragged s (288 % 128 != 0) exercises the undefined-padding gates
        q, kx, vx, kp, vp, ks, vs, kl, kv = _case(
            0, 2, 8, 8, 128, 288, int8, False, True)
        _assert_parity(q, kx, vx, kp, vp, ks, vs, kl, kv, 128, 128)

    @pytest.mark.parametrize("int8", [False, True])
    def test_rotating_window_kv_valid(self, int8):
        q, kx, vx, kp, vp, ks, vs, kl, kv = _case(
            3, 2, 4, 4, 128, 256, int8, True, True)
        _assert_parity(q, kx, vx, kp, vp, ks, vs, kl, kv, 128, 128)

    def test_gqa_groups(self):
        q, kx, vx, kp, vp, ks, vs, kl, kv = _case(
            5, 2, 8, 2, 128, 256, False, False, True)
        _assert_parity(q, kx, vx, kp, vp, ks, vs, kl, kv, 128, 128)

    def test_mqa_int8(self):
        q, kx, vx, kp, vp, ks, vs, kl, kv = _case(
            7, 2, 8, 1, 128, 160, True, False, True)
        _assert_parity(q, kx, vx, kp, vp, ks, vs, kl, kv, 128, 128)

    def test_small_head_dim_int8_all_masks(self):
        q, kx, vx, kp, vp, ks, vs, kl, kv = _case(
            9, 2, 8, 4, 64, 96, True, True, True)
        _assert_parity(q, kx, vx, kp, vp, ks, vs, kl, kv, 64, 64)

    @pytest.mark.parametrize("int8,kvh", [(True, 4), (False, 2)])
    def test_kv_window_scalar_parity(self, int8, kvh):
        """kv_window (scalar rotating-window form) must equal both the
        kernel's kv_valid path and the XLA reference masked with the
        equivalent [B, S] mask — built with the continuous batcher's own
        formula (generate/batcher._decode_chunk_impl valid_key)."""
        b, h, d, pcol, w = 2, 4, 128, 96, 64
        s = pcol + w    # batcher geometry: prompt rows + decode window
        q, kx, vx, kp, vp, ks, vs, _, _ = _case(
            11, b, h, kvh, d, s, int8, False, False)
        acol = jnp.asarray([3, 41], jnp.int32)
        gcnt = jnp.asarray([17, 64], jnp.int32)   # incl. a full window
        cols = jnp.arange(s, dtype=jnp.int32)[None, :]
        j = jnp.mod(cols - pcol - acol[:, None], w)
        valid = (cols < pcol) | ((cols < pcol + w) & (j < gcnt[:, None]))
        ref = _xla_attention(q, kx, vx, causal=False, scale=d ** -0.5,
                             kv_valid=valid, kv_layout="bshd",
                             k_scale=ks, v_scale=vs)
        via_valid = flash_decode_attention(
            q, kp, vp, kv_valid=valid, k_scale=ks, v_scale=vs, s_tile=128)
        via_window = flash_decode_attention(
            q, kp, vp, kv_valid=valid, kv_window=(pcol, w, acol, gcnt),
            k_scale=ks, v_scale=vs, s_tile=128)
        for got in (via_valid, via_window):
            r = np.asarray(ref, np.float32)
            g = np.asarray(got, np.float32)
            err = np.max(np.abs(r - g)) / (np.max(np.abs(r)) + 1e-9)
            assert err < 2.5e-2, f"relmax={err:.3e}"
        # the two kernel paths compute the identical mask -> identical bits
        np.testing.assert_array_equal(np.asarray(via_valid, np.float32),
                                      np.asarray(via_window, np.float32))

    def test_rejects_multi_token_query(self):
        q = jnp.zeros((1, 4, 2, 64), jnp.bfloat16)
        k = v = jnp.zeros((1, 32, 4, 64), jnp.bfloat16)
        with pytest.raises(ValueError, match="single-token"):
            flash_decode_attention(q, k, v)

    def test_rejects_lone_scale(self):
        q = jnp.zeros((1, 4, 1, 64), jnp.bfloat16)
        k = v = jnp.zeros((1, 32, 4, 64), jnp.int8)
        with pytest.raises(ValueError, match="together"):
            flash_decode_attention(
                q, k, v, k_scale=jnp.ones((1, 32, 4, 1), jnp.float32))
