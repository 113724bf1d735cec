"""Cross-implementation parity: vlm_tpu vs real HF models (torch CPU).

For each family a tiny random-weight HF model is built *from config* (no hub
access), saved to safetensors, and converted through
``vlm_tpu.models.hf_weights.load_vlm_weights``. We then assert:

(a) vision probing features match (cosine > 0.999 and allclose) — validates
    the tower numerics and each family's pooling
    (reference: llava.py:101-119, blip2.py:83-95, paligemma.py:100-112);
(b) full-forward logits match — validates projector wiring, token merge,
    positions (RoPE / OPT +2 offset), norms (Gemma (1+w)), embed scaling,
    and prefix-LM masking (PaliGemma attends bidirectionally over the whole
    prefix in eval mode — transformers' _update_causal_mask);
(c) greedy tokens are identical for 16 steps through the real KV-cached
    decode loop — the reference's generate semantics
    (`/root/reference/models/base_model.py:54-74`).

Everything runs fp32 on CPU on both sides.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vlm_tpu.testing import (HF_BUILDERS, IMAGE_TOKEN, hf_text_ids,  # noqa: E402
                             rand_pixels)
from vlm_tpu.generate.decode import GenerationEngine, build_prompt_ids  # noqa: E402
from vlm_tpu.models.factory import VLMModelFactory  # noqa: E402
from vlm_tpu.models.vlm import num_image_tokens  # noqa: E402

BATCH = 2
MAX_NEW = 16
PROMPT = "Describe the clothing of the person"

FAMILIES = ("llava", "paligemma", "blip2")


@pytest.fixture(scope="module", params=FAMILIES)
def pair(request, tmp_path_factory):
    """(family, hf_model, our_model) with converted weights."""
    family = request.param
    ckpt = tmp_path_factory.mktemp(f"hf_{family}")
    hf = HF_BUILDERS[family](ckpt, seed=7)
    ours = VLMModelFactory.create_model(
        family, model_id=str(ckpt), quantization="fp32", size="test",
        batch_size=BATCH, attn_impl="xla")
    return family, hf, ours


def _hf_vision_tower(family, hf):
    if family == "blip2":
        return hf.vision_model
    # transformers ≥4.52 nests the tower under .model
    return getattr(getattr(hf, "model", hf), "vision_tower")


def _hf_inputs(family, hf, ours, prompt, batch):
    """HF (input_ids, attention_mask) mirroring our merged prompt layout."""
    pre, post = hf_text_ids(ours, prompt)
    n_img = num_image_tokens(ours.cfg)
    # all three families take image placeholder tokens in input_ids
    # (transformers ≥4.47 unified BLIP-2 onto the same scheme; the Q-Former's
    # 8 query outputs scatter into the 8 placeholder positions)
    ids = list(pre) + [IMAGE_TOKEN] * n_img + list(post)
    input_ids = torch.tensor([ids] * batch, dtype=torch.long)
    return input_ids, torch.ones_like(input_ids)


def _our_prompt_arrays(ours, prompt, batch):
    pre_t, post_t, bos_pre, bos_post = ours.format_prompt(prompt)
    return build_prompt_ids(
        ours.tokenizer, pre_t, post_t, num_image_tokens(ours.cfg), batch,
        add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)


# ---------------------------------------------------------------------------
def test_vision_feature_parity(pair):
    family, hf, ours = pair
    px = rand_pixels(BATCH, ours.cfg.vision.image_size, seed=3)
    with torch.no_grad():
        tower = _hf_vision_tower(family, hf)
        out = tower(torch.from_numpy(px))
        if family == "blip2":
            ref = out.pooler_output.numpy()
        else:
            # reference backbones mean-pool last_hidden_state
            # (llava.py:110-117, paligemma.py:110-112)
            ref = out.last_hidden_state.mean(dim=1).numpy()

    got = np.asarray(ours.module.apply(
        ours.params, jnp.asarray(px.transpose(0, 2, 3, 1)),
        method="vision_features"))

    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    assert np.all(cos > 0.999), f"feature cosine {cos}"
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_prefill_logits_parity(pair):
    family, hf, ours = pair
    px = rand_pixels(BATCH, ours.cfg.vision.image_size, seed=5)
    input_ids, attn = _hf_inputs(family, hf, ours, PROMPT, BATCH)
    with torch.no_grad():
        ref = hf(input_ids=input_ids, pixel_values=torch.from_numpy(px),
                 attention_mask=attn).logits.numpy()

    pre_ids, post_ids, prompt_len = _our_prompt_arrays(ours, PROMPT, BATCH)
    got = np.asarray(ours.module.apply(
        ours.params, jnp.asarray(px.transpose(0, 2, 3, 1)),
        pre_ids, post_ids))

    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4)


def test_greedy_token_parity(pair):
    family, hf, ours = pair
    px = rand_pixels(BATCH, ours.cfg.vision.image_size, seed=11)
    input_ids, attn = _hf_inputs(family, hf, ours, PROMPT, BATCH)
    eos = ours.cfg.decoder.eos_token_id
    with torch.no_grad():
        out = hf.generate(
            input_ids=input_ids, pixel_values=torch.from_numpy(px),
            attention_mask=attn, do_sample=False, num_beams=1,
            max_new_tokens=MAX_NEW, pad_token_id=0, use_cache=True)
    out = out.numpy()
    # strip the echoed prompt when present (BLIP-2's overridden generate may
    # return only new tokens depending on version)
    if out.shape[1] >= input_ids.shape[1] and np.array_equal(
            out[:, :input_ids.shape[1]], input_ids.numpy()):
        hf_new = out[:, input_ids.shape[1]:]
    else:
        hf_new = out

    pre_ids, post_ids, prompt_len = _our_prompt_arrays(ours, PROMPT, BATCH)
    engine = GenerationEngine(
        ours.module, ours.cfg, batch_size=BATCH,
        max_prompt_len=int(prompt_len[0]), max_new_tokens=MAX_NEW,
        cache_dtype=jnp.float32, eos_id=eos, pad_id=0)
    res = engine.generate(ours.params, jnp.asarray(px.transpose(0, 2, 3, 1)),
                          pre_ids, post_ids, prompt_len)
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)

    for i in range(BATCH):
        ref_row = [int(t) for t in hf_new[i]]
        # HF may strip a leading BOS duplicate; cut ref at first EOS inclusive
        if eos in ref_row:
            ref_row = ref_row[:ref_row.index(eos) + 1]
        got_row = [int(t) for t in toks[i, :lens[i]]]
        assert got_row == ref_row, (
            f"{family} row {i}: ours {got_row} vs HF {ref_row}")


def test_beam_search_token_parity(pair):
    family, hf, ours = pair
    from vlm_tpu.generate.beam import BeamSearchEngine
    px = rand_pixels(BATCH, ours.cfg.vision.image_size, seed=13)
    input_ids, attn = _hf_inputs(family, hf, ours, PROMPT, BATCH)
    eos = ours.cfg.decoder.eos_token_id
    K, NEW = 2, 12
    with torch.no_grad():
        out = hf.generate(
            input_ids=input_ids, pixel_values=torch.from_numpy(px),
            attention_mask=attn, do_sample=False, num_beams=K,
            max_new_tokens=NEW, pad_token_id=0, use_cache=True,
            length_penalty=1.0, early_stopping=False)
    out = out.numpy()
    if out.shape[1] >= input_ids.shape[1] and np.array_equal(
            out[:, :input_ids.shape[1]], input_ids.numpy()):
        hf_new = out[:, input_ids.shape[1]:]
    else:
        hf_new = out

    pre_ids, post_ids, prompt_len = _our_prompt_arrays(ours, PROMPT, BATCH)
    engine = BeamSearchEngine(
        ours.module, ours.cfg, batch_size=BATCH,
        max_prompt_len=int(prompt_len[0]), num_beams=K, max_new_tokens=NEW,
        length_penalty=1.0, cache_dtype=jnp.float32, eos_id=eos, pad_id=0)
    res = engine.generate(ours.params, jnp.asarray(px.transpose(0, 2, 3, 1)),
                          pre_ids, post_ids, prompt_len)
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.lengths)

    for i in range(BATCH):
        ref_row = [int(t) for t in hf_new[i]]
        # HF appends EOS to the chosen hypothesis and pads; ours excludes it
        ref_trim = []
        for t in ref_row:
            if t == eos:
                break
            ref_trim.append(t)
        # HF pads with pad_token_id=0 after EOS; strip trailing pads when no
        # EOS was emitted
        if eos not in ref_row:
            while ref_trim and ref_trim[-1] == 0:
                ref_trim.pop()
        got_row = [int(t) for t in toks[i, :lens[i]]]
        assert got_row == ref_trim, (
            f"{family} beam row {i}: ours {got_row} vs HF {ref_trim}")
