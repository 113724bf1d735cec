"""KV-cached batched generation via ``lax.while_loop``.

Replaces the reference's per-image HF ``model.generate`` Python loop
(`/root/reference/scripts/prompt_inference.py:75-79`,
`models/base_model.py:68-69`) with a TPU-native design:

- one jitted **prefill** over the batch of merged (text+image) prompts writes
  the slot-based KV cache and yields the first token;
- one jitted **decode loop** (``lax.while_loop``) emits up to
  ``max_new_tokens`` greedily (or with temperature sampling), with an
  early-exit condition the moment every sequence has hit EOS — no
  data-dependent Python control flow, static shapes throughout;
- the cache is donated through the loop, so decoding is in-place in HBM.

Prompts are batch-constant (fixed per dataset run), so a single compiled
(prompt_len, batch) shape serves the whole dataset.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import VLMConfig
from ..models.decoder import init_kv_cache
from ..models.vlm import VLMModule


@dataclasses.dataclass
class GenerationResult:
    """tokens: [B, max_new] generated ids (pad after EOS); lengths: [B]
    number of generated tokens (including the EOS token if emitted)."""
    tokens: jax.Array
    lengths: jax.Array


def _sample(logits: jax.Array, temperature: float, rng: Optional[jax.Array],
            step: jax.Array, top_k: int = 0, top_p: float = 1.0) -> jax.Array:
    """Greedy (temperature<=0), else temperature sampling with optional
    top-k and/or nucleus (top-p) filtering. All static-shape under jit."""
    if temperature <= 0.0 or rng is None:
        # argmax is dtype-invariant here: bf16 logits upcast exactly to
        # fp32, so ordering and tie structure are identical either way.
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # Sampling numerics run in fp32 regardless of the logits buffer dtype
    # (the decode hot path hands bf16 — an exact representation of the
    # same values, see Decoder.__call__ logits_dtype).
    logits = logits.astype(jnp.float32) / temperature
    # Rank-based (not value-threshold) filtering: ties at the boundary must
    # NOT widen the support — with bf16 logits exact ties are common and a
    # value cutoff can degenerate to full-vocabulary sampling.
    if (top_k and top_k > 0) or top_p < 1.0:
        sort_idx = jnp.argsort(logits, axis=-1, descending=True)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        ranks = jax.lax.broadcasted_iota(jnp.int32, sorted_logits.shape,
                                         sorted_logits.ndim - 1)
        keep = jnp.ones_like(sorted_logits, dtype=bool)
        if top_k and top_k > 0:
            keep &= ranks < top_k
        if top_p < 1.0:
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep &= (cum - probs) < top_p     # first token always kept
        sorted_logits = jnp.where(keep, sorted_logits, -jnp.inf)
        # Scatter back through the argsort permutation.
        inv = jnp.argsort(sort_idx, axis=-1)
        logits = jnp.take_along_axis(sorted_logits, inv, axis=-1)
    key = jax.random.fold_in(rng, step)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class GenerationEngine:
    """Compiled generation over a :class:`VLMModule`.

    Args:
        module: the assembled VLM.
        cfg: its config (for cache geometry and EOS/pad ids).
        batch_size: decode slots (compiled batch).
        max_prompt_len: static merged-prompt budget (pre + image + post).
        max_new_tokens: generation cap (reference default 100,
            `configs/prompt_inference.yaml:9`).
    """

    def __init__(self, module: VLMModule, cfg: VLMConfig, *,
                 batch_size: int, max_prompt_len: int,
                 max_new_tokens: int = 100,
                 temperature: float = 0.0,
                 top_k: int = 0,
                 top_p: float = 1.0,
                 cache_dtype=jnp.bfloat16,
                 eos_id: Optional[int] = None,
                 pad_id: Optional[int] = None):
        self.module = module
        self.cfg = cfg
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.cache_len = max_prompt_len + max_new_tokens
        self.cache_dtype = cache_dtype
        self.eos_id = cfg.decoder.eos_token_id if eos_id is None else eos_id
        self.pad_id = cfg.decoder.pad_token_id if pad_id is None else pad_id
        # `uniform` is static: it selects the scalar-offset KV write (all
        # rows decode at the same position) vs the per-row scatter path.
        self._generate = jax.jit(self._generate_impl,
                                 static_argnames=("uniform",))

    def new_cache(self) -> Dict[str, jax.Array]:
        return init_kv_cache(self.cfg.decoder, self.batch_size,
                             self.cache_len, self.cache_dtype)

    # ------------------------------------------------------------------
    def _generate_impl(self, params, pixels, pre_ids, post_ids, prompt_len,
                       rng, max_new_per_seq, uniform=True):
        mod = self.module
        # The cache is allocated INSIDE the jit: passing it as an argument
        # can never alias (it is not an output), which forced XLA to keep
        # the argument buffer alive AND copy it into the loop carry —
        # 2x cache HBM (2.4 GB wasted on a 7B model).
        cache = self.new_cache()
        last_logits, cache = mod.apply(params, pixels, pre_ids, post_ids,
                                       cache, prompt_len, method="prefill")
        max_new = self.max_new_tokens
        b = pixels.shape[0]
        # per-sequence caps are a traced array (no recompilation per cap set)
        caps = jnp.minimum(max_new_per_seq.astype(jnp.int32), max_new)

        tok0 = _sample(last_logits, self.temperature, rng,
                       jnp.asarray(0, jnp.int32), self.top_k, self.top_p)
        tokens = jnp.full((b, max_new), self.pad_id, jnp.int32)
        tokens = tokens.at[:, 0].set(tok0)
        done = jnp.logical_or(tok0 == self.eos_id, caps <= 1)
        lengths = jnp.ones((b,), jnp.int32)

        def cond(state):
            step, _, _, done, _, _ = state
            return jnp.logical_and(step < max_new, ~jnp.all(done))

        def body(state):
            step, tokens, cur, done, lengths, cache = state
            pos = prompt_len + step - 1           # position of `cur`
            # batch-constant prompts (build_prompt_ids) decode every slot at
            # the same position → scalar-offset cache writes; generate()
            # checks the lengths and falls back to per-row writes otherwise
            logits, cache = mod.apply(params, cur[:, None], pos, cache,
                                      method="decode_step",
                                      uniform_write=uniform)
            nxt = _sample(logits, self.temperature, rng, step,
                          self.top_k, self.top_p)
            nxt = jnp.where(done, self.pad_id, nxt)
            tokens = tokens.at[:, step].set(nxt)
            new_done = done | (nxt == self.eos_id) | (step + 1 >= caps)
            lengths = lengths + jnp.where(done, 0, 1)
            return (step + 1, tokens, nxt, new_done, lengths, cache)

        state = (jnp.asarray(1, jnp.int32), tokens, tok0, done, lengths,
                 cache)
        _, tokens, _, done, lengths, cache = jax.lax.while_loop(
            cond, body, state)
        return tokens, lengths

    # ------------------------------------------------------------------
    def generate(self, params, pixels: jax.Array, pre_ids: jax.Array,
                 post_ids: jax.Array, prompt_len: jax.Array,
                 rng: Optional[jax.Array] = None,
                 max_new_per_seq: Optional[jax.Array] = None) -> GenerationResult:
        """Batched generation. ``pixels`` [B,H,W,3] normalized; ``pre_ids``/
        ``post_ids`` [B, P] left-aligned (pad with pad_id); ``prompt_len``
        [B] true merged lengths. ``max_new_per_seq`` [B] optionally caps each
        sequence's generation (clamped to ``max_new_tokens``); it is a traced
        argument, so varying caps never recompile."""
        if rng is None:
            rng = jax.random.key(0)
        if max_new_per_seq is None:
            max_new_per_seq = jnp.full((pixels.shape[0],),
                                       self.max_new_tokens, jnp.int32)
        # Non-uniform prompt lengths must take the per-row KV write path —
        # the scalar-offset write would place every row at prompt_len[0]
        # and silently corrupt longer rows' prompt KV. The host check is
        # one-time per array: jax caches the fetched host copy.
        pl_host = np.asarray(prompt_len)
        uniform = bool((pl_host == pl_host[0]).all())
        tokens, lengths = self._generate(params, pixels, pre_ids, post_ids,
                                         prompt_len, rng, max_new_per_seq,
                                         uniform=uniform)
        return GenerationResult(tokens=tokens, lengths=lengths)


def build_prompt_ids(tokenizer, pre_text: str, post_text: str,
                     n_image_tokens: int, batch: int,
                     add_bos_to_pre: bool = False,
                     add_bos_to_post: bool = False):
    """Tokenize the (batch-constant) prompt halves → device-ready arrays.

    Returns (pre_ids [B,P1], post_ids [B,P2], prompt_len [B]).
    """
    pre = tokenizer.encode(pre_text, add_bos=add_bos_to_pre) if (
        pre_text or add_bos_to_pre) else []
    post = tokenizer.encode(post_text, add_bos=add_bos_to_post) if (
        post_text or add_bos_to_post) else []
    pre_ids = jnp.asarray([pre] * batch, jnp.int32).reshape(batch, len(pre))
    post_ids = jnp.asarray([post] * batch, jnp.int32).reshape(batch, len(post))
    total = len(pre) + n_image_tokens + len(post)
    prompt_len = jnp.full((batch,), total, jnp.int32)
    return pre_ids, post_ids, prompt_len
