"""Generation engine tests: wave engine vs continuous batcher parity,
EOS handling, prompt building."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_tpu.data.tokenizer import ByteTokenizer
from vlm_tpu.generate.batcher import ContinuousBatcher
from vlm_tpu.generate.decode import GenerationEngine, build_prompt_ids
from vlm_tpu.models.configs import paligemma_config
from vlm_tpu.models.vlm import init_vlm, num_image_tokens


@pytest.fixture(scope="module")
def model():
    cfg = paligemma_config("test")
    module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
    return cfg, module, params


def _pixels(cfg, n, seed=0):
    s = cfg.vision.image_size
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, s, s, 3)), jnp.float32)


class TestBuildPromptIds:
    def test_shapes_and_length(self):
        tok = ByteTokenizer()
        pre, post, plen = build_prompt_ids(tok, "ab", "cde", 16, 3,
                                           add_bos_to_post=True)
        assert pre.shape == (3, 2)
        assert post.shape == (3, 4)          # bos + 3 chars
        assert int(plen[0]) == 2 + 16 + 4

    def test_empty_pre(self):
        tok = ByteTokenizer()
        pre, post, plen = build_prompt_ids(tok, "", "xy", 8, 2)
        assert pre.shape == (2, 0)
        assert int(plen[0]) == 8 + 2


class TestGenerationEngine:
    def test_tokens_shape_and_determinism(self, model):
        cfg, module, params = model
        t = num_image_tokens(cfg)
        engine = GenerationEngine(module, cfg, batch_size=3,
                                  max_prompt_len=4 + t,
                                  max_new_tokens=6,
                                  cache_dtype=jnp.float32)
        px = _pixels(cfg, 3)
        pre = jnp.zeros((3, 0), jnp.int32)
        post = jnp.ones((3, 4), jnp.int32)
        plen = jnp.full((3,), 4 + t, jnp.int32)
        r1 = engine.generate(params, px, pre, post, plen)
        r2 = engine.generate(params, px, pre, post, plen)
        assert r1.tokens.shape == (3, 6)
        np.testing.assert_array_equal(np.asarray(r1.tokens),
                                      np.asarray(r2.tokens))
        assert all(1 <= int(n) <= 6 for n in np.asarray(r1.lengths))

    def test_non_uniform_prompt_lengths(self, model):
        """Per-sequence prompt lengths must take the per-row KV write path:
        each row of a mixed-length batch must reproduce the tokens of a
        batch-1 run at that row's own length (the scalar-offset write would
        corrupt the longer row's prompt KV)."""
        cfg, module, params = model
        t = num_image_tokens(cfg)
        max_prompt = 5 + t
        engine = GenerationEngine(module, cfg, batch_size=2,
                                  max_prompt_len=max_prompt,
                                  max_new_tokens=5,
                                  cache_dtype=jnp.float32)
        px = _pixels(cfg, 2, seed=9)
        # row 0: 2 post tokens, row 1: 5 post tokens (left-aligned, padded)
        post = jnp.asarray([[7, 9, 0, 0, 0], [7, 9, 11, 13, 15]], jnp.int32)
        pre = jnp.zeros((2, 0), jnp.int32)
        plen = jnp.asarray([2 + t, 5 + t], jnp.int32)
        res = engine.generate(params, px, pre, post, plen)

        eng1 = GenerationEngine(module, cfg, batch_size=1,
                                max_prompt_len=max_prompt,
                                max_new_tokens=5,
                                cache_dtype=jnp.float32)
        for b in range(2):
            r1 = eng1.generate(params, px[b:b + 1], pre[b:b + 1],
                               post[b:b + 1], plen[b:b + 1])
            np.testing.assert_array_equal(np.asarray(res.tokens)[b],
                                          np.asarray(r1.tokens)[0])

    def test_eos_stops_and_pads(self, model):
        cfg, module, params = model
        t = num_image_tokens(cfg)
        engine = GenerationEngine(module, cfg, batch_size=2,
                                  max_prompt_len=2 + t, max_new_tokens=8,
                                  cache_dtype=jnp.float32)
        px = _pixels(cfg, 2, seed=1)
        pre = jnp.zeros((2, 0), jnp.int32)
        post = jnp.ones((2, 2), jnp.int32)
        plen = jnp.full((2,), 2 + t, jnp.int32)
        res = engine.generate(params, px, pre, post, plen)
        toks = np.asarray(res.tokens)
        lens = np.asarray(res.lengths)
        for b in range(2):
            if lens[b] < 8:
                assert toks[b, lens[b] - 1] == engine.eos_id
                assert (toks[b, lens[b]:] == engine.pad_id).all()


class TestContinuousBatcher:
    def test_matches_wave_engine(self, model):
        """Greedy decoding is deterministic → the continuous batcher must
        produce exactly the wave engine's tokens for every image."""
        cfg, module, params = model
        t = num_image_tokens(cfg)
        n = 7
        max_new = 6
        px_all = _pixels(cfg, n, seed=2)
        pre_row = np.zeros((0,), np.int32)
        post_row = np.ones((3,), np.int32)
        plen = 3 + t

        engine = GenerationEngine(module, cfg, batch_size=n,
                                  max_prompt_len=plen,
                                  max_new_tokens=max_new,
                                  cache_dtype=jnp.float32)
        wave = engine.generate(
            params, px_all, jnp.zeros((n, 0), jnp.int32),
            jnp.ones((n, 3), jnp.int32), jnp.full((n,), plen, jnp.int32))
        wave_tokens = [
            [int(x) for x in np.asarray(wave.tokens)[i][:int(wave.lengths[i])]
             if int(x) != engine.eos_id]
            for i in range(n)]

        batcher = ContinuousBatcher(module, cfg, batch_size=3,
                                    max_prompt_len=plen,
                                    max_new_tokens=max_new,
                                    cache_dtype=jnp.float32,
                                    admit_block=2)
        seen = []
        out = batcher.run(params,
                          pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
                          pre_ids_row=pre_row, post_ids_row=post_row,
                          prompt_len_scalar=plen, n_images=n,
                          progress=lambda k: seen.append(k))
        assert out == wave_tokens
        assert sum(seen) == n

    def test_sync_every_invariance(self, model):
        """Chunked decode (host sync per K steps) must not change greedy
        tokens: sync_every=1 (per-token sync, the round-1 behavior) and a
        chunk larger than any generation produce identical results."""
        cfg, module, params = model
        t = num_image_tokens(cfg)
        n = 5
        px_all = _pixels(cfg, n, seed=4)
        kw = dict(max_prompt_len=2 + t, max_new_tokens=5,
                  cache_dtype=jnp.float32, admit_block=2)
        run_kw = dict(pre_ids_row=np.ones((2,), np.int32),
                      post_ids_row=np.zeros((0,), np.int32),
                      prompt_len_scalar=2 + t, n_images=n,
                      max_new_per_image=[5, 1, 3, 5, 2])
        outs = []
        for sync in (1, 3, 16):
            b = ContinuousBatcher(module, cfg, batch_size=3,
                                  sync_every=sync, **kw)
            outs.append(b.run(params,
                              pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
                              **run_kw))
        assert outs[0] == outs[1] == outs[2]
        assert all(len(o) <= c for o, c in
                   zip(outs[0], run_kw["max_new_per_image"]))

    def test_pipelined_matches_sync_loop(self, model):
        """The pipelined host loop (sync_every=0: device-chosen slots,
        lazy packed pulls) must produce exactly the legacy synchronous
        loop's results, with per-image caps exercising EOS-at-admission
        slot reuse, across pipeline depths."""
        cfg, module, params = model
        t = num_image_tokens(cfg)
        n = 9
        px_all = _pixels(cfg, n, seed=21)
        kw = dict(max_prompt_len=2 + t, max_new_tokens=5,
                  cache_dtype=jnp.float32, admit_block=2)
        run_kw = dict(pre_ids_row=np.ones((2,), np.int32),
                      post_ids_row=np.zeros((0,), np.int32),
                      prompt_len_scalar=2 + t, n_images=n,
                      max_new_per_image=[5, 1, 3, 1, 2, 5, 1, 4, 2])
        ref = ContinuousBatcher(module, cfg, batch_size=3,
                                sync_every=16, **kw).run(
            params, pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
            **run_kw)
        for depth in (1, 3):
            b = ContinuousBatcher(module, cfg, batch_size=3,
                                  pipeline_depth=depth, **kw)
            got = b.run(params,
                        pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
                        **run_kw)
            assert got == ref, f"pipeline_depth={depth}"
            assert all(l is not None and l >= 0
                       for l in b.last_latency_s)

    def test_all_caps_one(self, model):
        """Every request capped at 1 token: each admission deactivates all
        its slots inside the prefill program, so every decode chunk runs
        zero steps and only resolves the host mirror. Exercises the
        adaptive chunk's immediate-exit path end to end."""
        cfg, module, params = model
        t = num_image_tokens(cfg)
        n = 5
        px_all = _pixels(cfg, n, seed=7)
        batcher = ContinuousBatcher(module, cfg, batch_size=2,
                                    max_prompt_len=1 + t, max_new_tokens=4,
                                    cache_dtype=jnp.float32, admit_block=2)
        out = batcher.run(params,
                          pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
                          pre_ids_row=np.zeros((0,), np.int32),
                          post_ids_row=np.ones((1,), np.int32),
                          prompt_len_scalar=1 + t, n_images=n,
                          max_new_per_image=[1] * n)
        assert all(o is not None and len(o) <= 1 for o in out)

    def test_single_slot(self, model):
        cfg, module, params = model
        t = num_image_tokens(cfg)
        px_all = _pixels(cfg, 2, seed=3)
        batcher = ContinuousBatcher(module, cfg, batch_size=1,
                                    max_prompt_len=1 + t, max_new_tokens=3,
                                    cache_dtype=jnp.float32)
        out = batcher.run(params,
                          pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
                          pre_ids_row=np.zeros((0,), np.int32),
                          post_ids_row=np.ones((1,), np.int32),
                          prompt_len_scalar=1 + t, n_images=2)
        assert len(out) == 2 and all(len(o) <= 3 for o in out)


class TestInt8KVCache:
    """Opt-in quantized KV cache (cache_dtype="int8"): int8 rows +
    per-row scales, dequantized inside the attention read. Halves the
    decode-step HBM cache stream for MHA decoders."""

    def test_roundtrip_error_bound(self):
        from vlm_tpu.models.decoder import dequantize_kv, quantize_kv_rows
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 5, 3, 16)), jnp.float32)
        qkv = quantize_kv_rows(x)
        back = dequantize_kv(qkv, jnp.float32)
        amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
        # symmetric int8: error bounded by half a quantization step
        assert (np.abs(np.asarray(back - x)) <= amax / 127.0).all()

    def test_wave_engine_runs_and_matches_fp_mostly(self, model):
        cfg, module, params = model
        t = num_image_tokens(cfg)
        px = _pixels(cfg, 3, seed=11)
        kw = dict(batch_size=3, max_prompt_len=2 + t, max_new_tokens=6)
        pre = jnp.zeros((3, 0), jnp.int32)
        post = jnp.ones((3, 2), jnp.int32)
        plen = jnp.full((3,), 2 + t, jnp.int32)
        fp = GenerationEngine(module, cfg, cache_dtype=jnp.float32, **kw)
        q8 = GenerationEngine(module, cfg, cache_dtype="int8", **kw)
        r_fp = fp.generate(params, px, pre, post, plen)
        r_q8 = q8.generate(params, px, pre, post, plen)
        assert r_q8.tokens.shape == r_fp.tokens.shape
        # tiny random models have near-uniform logits, so exact token
        # parity isn't guaranteed — but the runs must be deterministic
        r_q8b = q8.generate(params, px, pre, post, plen)
        np.testing.assert_array_equal(np.asarray(r_q8.tokens),
                                      np.asarray(r_q8b.tokens))

    def test_beam_runs_with_int8_cache(self, model):
        """Beam expansion and gather are cache-surgery sites that must
        handle QuantizedKV layers (tree-mapped repeat/take)."""
        from vlm_tpu.generate.beam import BeamSearchEngine
        cfg, module, params = model
        t = num_image_tokens(cfg)
        engine = BeamSearchEngine(module, cfg, batch_size=2,
                                  max_prompt_len=2 + t, num_beams=2,
                                  max_new_tokens=4, cache_dtype="int8")
        px = _pixels(cfg, 2, seed=13)
        res = engine.generate(params, px, jnp.zeros((2, 0), jnp.int32),
                              jnp.ones((2, 2), jnp.int32),
                              jnp.full((2,), 2 + t, jnp.int32))
        assert res.tokens.shape[0] == 2
        assert (np.asarray(res.lengths) >= 1).all()

    def test_batcher_matches_wave_engine_int8(self, model):
        """Both engines quantize identically, so greedy tokens must agree
        exactly under the int8 cache too."""
        cfg, module, params = model
        t = num_image_tokens(cfg)
        n = 5
        max_new = 5
        px_all = _pixels(cfg, n, seed=12)
        pre_row = np.zeros((0,), np.int32)
        post_row = np.ones((2,), np.int32)
        plen = 2 + t
        engine = GenerationEngine(module, cfg, batch_size=n,
                                  max_prompt_len=plen,
                                  max_new_tokens=max_new,
                                  cache_dtype="int8")
        wave = engine.generate(
            params, px_all, jnp.zeros((n, 0), jnp.int32),
            jnp.ones((n, 2), jnp.int32), jnp.full((n,), plen, jnp.int32))
        wave_tokens = [
            [int(x) for x in np.asarray(wave.tokens)[i][:int(wave.lengths[i])]
             if int(x) != engine.eos_id]
            for i in range(n)]
        batcher = ContinuousBatcher(module, cfg, batch_size=2,
                                    max_prompt_len=plen,
                                    max_new_tokens=max_new,
                                    cache_dtype="int8", admit_block=2)
        out = batcher.run(params,
                          pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
                          pre_ids_row=pre_row, post_ids_row=post_row,
                          prompt_len_scalar=plen, n_images=n)
        assert out == wave_tokens


class TestFlashDecodeOptIn:
    def test_batcher_tokens_identical_under_flash_decode(self, monkeypatch):
        """VLM_TPU_DECODE_ATTN=flash routes the batcher's int8 decode steps
        through the fused Pallas kernel (kv_window scalar masking). Greedy
        tokens must match the XLA path bit-for-bit — the kernel computes
        the same masked softmax, only the schedule differs. Uses an MHA
        geometry the kernel gate accepts (kv_heads * head_dim = 128)."""
        import dataclasses

        import importlib
        # vlm_tpu.ops re-exports the attention FUNCTION, which shadows the
        # submodule under plain `import ... as`; resolve the module itself.
        attention_mod = importlib.import_module("vlm_tpu.ops.attention")
        from vlm_tpu.models.configs import llava_config

        cfg = llava_config("test")
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(
                cfg.decoder, heads=2, kv_heads=2, head_dim=64))
        module, params = init_vlm(cfg, jax.random.key(2), dtype=jnp.float32)
        t = num_image_tokens(cfg)
        n, max_new = 4, 4
        px_all = _pixels(cfg, n, seed=21)
        pre_row = np.ones((1,), np.int32)
        post_row = np.ones((2,), np.int32)
        plen = 1 + t + 2

        def run():
            batcher = ContinuousBatcher(module, cfg, batch_size=2,
                                        max_prompt_len=plen,
                                        max_new_tokens=max_new,
                                        cache_dtype="int8", admit_block=2)
            return batcher.run(
                params, pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
                pre_ids_row=pre_row, post_ids_row=post_row,
                prompt_len_scalar=plen, n_images=n)

        ref = run()                                   # XLA decode path
        monkeypatch.setattr(attention_mod, "DECODE_ATTN_IMPL", "flash")
        got = run()                                   # fused kernel path
        assert got == ref


class TestSplitAdmission:
    def test_batcher_tokens_identical_under_split_admit(self, monkeypatch):
        """VLM_TPU_SPLIT_ADMIT=1 dispatches the vision tower as its own
        program and feeds pre-projected image embeds to the admission
        program (VERDICT r4 item 5a A/B knob). Same math, different
        program boundaries — tokens must match the fused path exactly."""
        from vlm_tpu.models.configs import paligemma_config

        cfg = paligemma_config("test")
        module, params = init_vlm(cfg, jax.random.key(3), dtype=jnp.float32)
        t = num_image_tokens(cfg)
        n, max_new = 5, 4
        px_all = _pixels(cfg, n, seed=33)
        pre_row = np.zeros((0,), np.int32)
        post_row = np.ones((3,), np.int32)
        plen = t + 3

        def run():
            batcher = ContinuousBatcher(module, cfg, batch_size=2,
                                        max_prompt_len=plen,
                                        max_new_tokens=max_new,
                                        admit_block=2)
            return batcher.run(
                params, pixel_fn=lambda idxs: px_all[jnp.asarray(idxs)],
                pre_ids_row=pre_row, post_ids_row=post_row,
                prompt_len_scalar=plen, n_images=n)

        ref = run()                                   # fused admission
        monkeypatch.setenv("VLM_TPU_SPLIT_ADMIT", "1")
        got = run()                                   # vision split out
        assert got == ref


class TestAdmitDefault:
    def test_default_admit_block_formula(self):
        """Default admission block is clamp(batch//8, 4, 8) — every
        measured-best point of the round-5 v5e sweep (B=128→8, B=64→8,
        B=16→4) — never exceeding batch_size for tiny batches."""
        from vlm_tpu.models.configs import paligemma_config

        cfg = paligemma_config("test")
        module, _ = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
        for batch, want in [(128, 8), (64, 8), (32, 4), (16, 4),
                            (8, 4), (4, 4), (2, 2), (1, 1)]:
            b = ContinuousBatcher(module, cfg, batch_size=batch,
                                  max_prompt_len=8, max_new_tokens=2)
            assert b.admit_block == want, (batch, b.admit_block)


class TestSampling:
    def test_greedy_is_argmax(self):
        import jax
        from vlm_tpu.generate.decode import _sample
        logits = jnp.asarray([[1.0, 5.0, 2.0]])
        tok = _sample(logits, 0.0, jax.random.key(0), jnp.asarray(0))
        assert int(tok[0]) == 1

    def test_top_k_restricts_support(self):
        import jax
        from vlm_tpu.generate.decode import _sample
        logits = jnp.asarray([[0.0, 10.0, 9.0, -5.0]])
        toks = {int(_sample(logits, 1.0, jax.random.key(s), jnp.asarray(s),
                            2, 1.0)[0]) for s in range(50)}
        assert toks <= {1, 2}

    def test_top_p_restricts_support(self):
        import jax
        from vlm_tpu.generate.decode import _sample
        logits = jnp.asarray([[0.0, 10.0, 1.0, 0.5]])
        toks = {int(_sample(logits, 1.0, jax.random.key(s), jnp.asarray(s),
                            0, 0.5)[0]) for s in range(50)}
        assert toks == {1}

    def test_temperature_sampling_engine(self):
        import jax
        from vlm_tpu.generate.decode import GenerationEngine
        from vlm_tpu.models.configs import paligemma_config
        from vlm_tpu.models.vlm import init_vlm, num_image_tokens
        cfg = paligemma_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32)
        t = num_image_tokens(cfg)
        engine = GenerationEngine(module, cfg, batch_size=2,
                                  max_prompt_len=2 + t, max_new_tokens=4,
                                  temperature=1.0, top_k=50,
                                  cache_dtype=jnp.float32)
        px = _pixels(cfg, 2, seed=9)
        res1 = engine.generate(params, px, jnp.zeros((2, 0), jnp.int32),
                               jnp.ones((2, 2), jnp.int32),
                               jnp.full((2,), 2 + t, jnp.int32),
                               rng=jax.random.key(1))
        res1b = engine.generate(params, px, jnp.zeros((2, 0), jnp.int32),
                                jnp.ones((2, 2), jnp.int32),
                                jnp.full((2,), 2 + t, jnp.int32),
                                rng=jax.random.key(1))
        assert res1.tokens.shape == (2, 4)
        # sampling is deterministic under the same rng key
        np.testing.assert_array_equal(np.asarray(res1.tokens),
                                      np.asarray(res1b.tokens))


class TestBatcherSampling:
    """Sampling parity in the continuous batcher (VERDICT r1 gap: the
    batcher was argmax-only while the wave engine sampled)."""

    def _setup(self, **kw):
        import numpy as np

        from vlm_tpu.generate.batcher import ContinuousBatcher
        from vlm_tpu.models.configs import paligemma_config
        from vlm_tpu.models.vlm import init_vlm, num_image_tokens

        cfg = paligemma_config("test")
        module, params = init_vlm(cfg, jax.random.key(0), dtype=jnp.float32,
                                  param_dtype=jnp.float32)
        n_img = num_image_tokens(cfg)
        prompt_len = n_img + 4
        batcher = ContinuousBatcher(
            module, cfg, batch_size=2, max_prompt_len=prompt_len,
            max_new_tokens=5, cache_dtype=jnp.float32, **kw)
        s = cfg.vision.image_size
        px = np.random.default_rng(0).normal(size=(4, s, s, 3)).astype(
            np.float32)

        def pixel_fn(idxs):
            return jnp.asarray(px[[i % 4 for i in idxs]])

        run = lambda: batcher.run(
            params, pixel_fn, pre_ids_row=np.zeros((0,), np.int32),
            post_ids_row=np.asarray([5, 6, 7, 8], np.int32),
            prompt_len_scalar=prompt_len, n_images=4)
        return run

    def test_temperature_sampling_runs_and_differs_by_seed(self):
        toks_a = self._setup(temperature=1.0, top_k=8,
                             rng=jax.random.key(1))()
        toks_b = self._setup(temperature=1.0, top_k=8,
                             rng=jax.random.key(2))()
        assert all(t is not None for t in toks_a + toks_b)
        # different seeds should not produce identical streams
        assert toks_a != toks_b

    def test_same_seed_is_deterministic(self):
        toks_a = self._setup(temperature=0.7, top_p=0.9,
                             rng=jax.random.key(3))()
        toks_b = self._setup(temperature=0.7, top_p=0.9,
                             rng=jax.random.key(3))()
        assert toks_a == toks_b
