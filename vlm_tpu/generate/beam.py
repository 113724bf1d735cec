"""Beam search decoding (HF ``generate(num_beams=K)`` semantics).

The reference's ``model.generate`` supports beam search even though its
configs default to greedy (`/root/reference/models/base_model.py:68-69`).
This implements the same algorithm the HF beam scorer runs, TPU-natively:
one jitted ``lax.while_loop`` with static shapes — fixed beam count, a
fixed-size hypothesis pool updated by sort instead of a Python heap, and
per-step KV-cache reordering as a batched gather.

Semantics matched to HF (``do_sample=False``, default knobs):

- per step: ``scores = beam_scores + log_softmax(logits)``; top ``2K``
  candidates per batch item over the flattened ``K*V`` grid (2K so EOS
  candidates never starve the K running beams — at most one EOS candidate
  per beam ⇒ ≥K non-EOS survive);
- an EOS candidate with rank < K finalizes a hypothesis with score
  ``sum_logprobs / len**length_penalty`` (EOS excluded from the tokens);
  lower-ranked EOS candidates are dropped;
- the K best non-EOS candidates become the next beams (cache rows gathered
  to follow their source beams);
- ``early_stopping=False`` done-rule: a batch item is done once it holds K
  hypotheses and the worst of them is no worse than the best running
  beam's optimistic score ``best_sum_logprobs / cur_len**length_penalty``;
- at the token cap, still-running beams are offered to the pool
  (HF ``finalize``), and the best hypothesis is returned.

Verified token-for-token against HF beam search on tiny random-weight
models in tests/test_hf_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.configs import VLMConfig
from ..models.decoder import init_kv_cache
from ..models.vlm import VLMModule

NEG = jnp.float32(-1e9)


@dataclasses.dataclass
class BeamResult:
    """tokens: [B, max_new] best-hypothesis ids (pad after end);
    lengths: [B] hypothesis lengths (EOS not included); scores: [B]."""
    tokens: jax.Array
    lengths: jax.Array
    scores: jax.Array


class BeamSearchEngine:
    """Compiled beam search over a :class:`VLMModule`."""

    def __init__(self, module: VLMModule, cfg: VLMConfig, *,
                 batch_size: int, max_prompt_len: int,
                 num_beams: int = 4, max_new_tokens: int = 100,
                 length_penalty: float = 1.0,
                 cache_dtype=jnp.bfloat16,
                 eos_id: Optional[int] = None,
                 pad_id: Optional[int] = None):
        self.module = module
        self.cfg = cfg
        self.batch_size = batch_size
        self.num_beams = num_beams
        self.max_new_tokens = max_new_tokens
        self.length_penalty = length_penalty
        self.cache_len = max_prompt_len + max_new_tokens
        self.cache_dtype = cache_dtype
        self.eos_id = cfg.decoder.eos_token_id if eos_id is None else eos_id
        self.pad_id = cfg.decoder.pad_token_id if pad_id is None else pad_id
        # `uniform` (static) selects the scalar-offset KV write: all B*K
        # beams decode in lockstep, so it only depends on whether the
        # prompt lengths themselves are batch-constant (checked host-side
        # in generate()).
        self._search = jax.jit(self._search_impl,
                               static_argnames=("uniform",))

    # ------------------------------------------------------------------
    def _hyp_rank(self, scores: jax.Array) -> jax.Array:
        """Descending sort indices."""
        return jnp.argsort(-scores, axis=-1)

    def _search_impl(self, params, pixels, pre_ids, post_ids, prompt_len,
                     uniform=True):
        mod = self.module
        B = pixels.shape[0]
        K = self.num_beams
        max_new = self.max_new_tokens
        lp = self.length_penalty
        BK = B * K

        # ---- prefill once per image, then expand each row to K beams ----
        cache = init_kv_cache(self.cfg.decoder, B, self.cache_len,
                              self.cache_dtype)
        last_logits, cache = mod.apply(params, pixels, pre_ids, post_ids,
                                       cache, prompt_len, method="prefill")
        # tree-map per layer: covers plain arrays and QuantizedKV layers
        cache = {
            kv: tuple(jax.tree.map(lambda a: jnp.repeat(a, K, axis=0),
                                   layer)
                      for layer in layers)
            for kv, layers in cache.items()
        }
        logp0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)

        V = logp0.shape[-1]
        # beam 0 starts at 0, the rest at -inf (HF init) — the first step's
        # candidates all come from beam 0.
        beam_scores = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)
        tokens = jnp.full((B, K, max_new), self.pad_id, jnp.int32)
        hyp_scores = jnp.full((B, K), NEG, jnp.float32)
        hyp_tokens = jnp.full((B, K, max_new), self.pad_id, jnp.int32)
        hyp_lengths = jnp.zeros((B, K), jnp.int32)
        done = jnp.zeros((B,), bool)

        prompt_len_k = jnp.repeat(prompt_len, K, axis=0)        # [BK]

        def select(step, step_logp, beam_scores, tokens, hyps, done):
            """One HF beam-scorer step. ``step_logp``: [B, K, V] log-probs
            of the token being chosen at position ``step`` (0-based in the
            generated suffix). Returns next (beam_scores, beam_src, token,
            hyps, done)."""
            hyp_scores, hyp_tokens, hyp_lengths = hyps
            cand = beam_scores[:, :, None] + step_logp        # [B, K, V]
            flat = cand.reshape(B, K * V)
            top_vals, top_idx = jax.lax.top_k(flat, 2 * K)    # [B, 2K]
            top_beam = top_idx // V
            top_tok = (top_idx % V).astype(jnp.int32)

            is_eos = top_tok == self.eos_id
            rank = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * K), 1)

            # --- finalize EOS candidates with rank < K ---
            # HF normalizes by generated_len = step + 1 (the EOS counts
            # toward the length even though it is excluded from the tokens)
            gen_len = (jnp.asarray(step, jnp.int32) + 1).astype(jnp.float32)
            cand_hyp_score = jnp.where(is_eos & (rank < K),
                                       top_vals / gen_len ** lp, NEG)
            # don't add to already-done batches
            cand_hyp_score = jnp.where(done[:, None], NEG, cand_hyp_score)
            cand_tokens = jnp.take_along_axis(
                tokens, top_beam[:, :, None], axis=1)         # [B, 2K, max]
            # pool = existing K hyps + 2K candidates → keep best K
            pool_scores = jnp.concatenate([hyp_scores, cand_hyp_score], 1)
            pool_tokens = jnp.concatenate([hyp_tokens, cand_tokens], 1)
            pool_lengths = jnp.concatenate(
                [hyp_lengths,
                 jnp.full((B, 2 * K), step, jnp.int32)], 1)
            order = self._hyp_rank(pool_scores)[:, :K]        # [B, K]
            hyp_scores = jnp.take_along_axis(pool_scores, order, axis=1)
            hyp_tokens = jnp.take_along_axis(pool_tokens, order[:, :, None],
                                             axis=1)
            hyp_lengths = jnp.take_along_axis(pool_lengths, order, axis=1)

            # --- pick the K best non-EOS candidates as next beams ---
            ok = ~is_eos
            slot = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1   # [B, 2K]
            take = ok & (slot < K)
            # scatter candidates into their slots via sort: key = slot where
            # taken else big
            key = jnp.where(take, slot, 2 * K)
            ordr = jnp.argsort(key, axis=1)[:, :K]
            nxt_scores = jnp.take_along_axis(top_vals, ordr, axis=1)
            nxt_beam = jnp.take_along_axis(top_beam, ordr, axis=1)
            nxt_tok = jnp.take_along_axis(top_tok, ordr, axis=1)

            # --- done rule (early_stopping=False) ---
            # HF: best attainable = max over ALL top-2K candidate scores
            # (EOS candidates included), normalized by the same gen_len
            n_hyps = jnp.sum(hyp_scores > NEG / 2, axis=1)
            best_possible = jnp.max(top_vals, axis=1) / gen_len ** lp
            worst_hyp = hyp_scores[:, K - 1]
            new_done = done | ((n_hyps >= K) & (worst_hyp >= best_possible))

            # frozen batches keep scores/beams stable (decode continues but
            # updates are masked)
            nxt_scores = jnp.where(done[:, None], beam_scores, nxt_scores)
            nxt_beam = jnp.where(done[:, None], jnp.arange(K)[None], nxt_beam)
            nxt_tok = jnp.where(done[:, None], self.pad_id, nxt_tok)
            return (nxt_scores, nxt_beam, nxt_tok,
                    (hyp_scores, hyp_tokens, hyp_lengths), new_done)

        # ---- first token (from prefill logits; beams all share beam 0) ----
        step_logp = jnp.broadcast_to(logp0[:, None], (B, K, V))
        beam_scores, beam_src, tok, hyps, done = select(
            0, step_logp, beam_scores, tokens,
            (hyp_scores, hyp_tokens, hyp_lengths), done)
        tokens = jnp.take_along_axis(tokens, beam_src[:, :, None], axis=1)
        tokens = tokens.at[:, :, 0].set(tok)
        cache = self._gather_cache(cache, beam_src, B, K)
        cur = tok.reshape(BK)

        def cond(state):
            step, _, _, _, _, _, done, _ = state
            return jnp.logical_and(step < max_new, ~jnp.all(done))

        def body(state):
            (step, beam_scores, tokens, hyp_scores, hyp_tokens,
             hyp_lengths, done, carry) = state
            cur, cache = carry
            pos = prompt_len_k + step - 1
            # All B*K beams are in lockstep; with batch-constant prompts
            # (checked in generate()) the KV write is scalar-offset.
            logits, cache = mod.apply(params, cur[:, None], pos, cache,
                                      method="decode_step",
                                      uniform_write=uniform)
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1).reshape(B, K, V)
            beam_scores, beam_src, tok, hyps, done = select(
                step, logp, beam_scores, tokens,
                (hyp_scores, hyp_tokens, hyp_lengths), done)
            hyp_scores, hyp_tokens, hyp_lengths = hyps
            tokens = jnp.take_along_axis(tokens, beam_src[:, :, None],
                                         axis=1)
            tokens = tokens.at[:, :, step].set(tok)
            cache = self._gather_cache(cache, beam_src, B, K)
            cur = tok.reshape(BK)
            return (step + 1, beam_scores, tokens, hyp_scores, hyp_tokens,
                    hyp_lengths, done, (cur, cache))

        hyp_scores, hyp_tokens, hyp_lengths = hyps
        state = (jnp.asarray(1, jnp.int32), beam_scores, tokens, hyp_scores,
                 hyp_tokens, hyp_lengths, done, (cur, cache))
        (step, beam_scores, tokens, hyp_scores, hyp_tokens, hyp_lengths,
         done, _) = jax.lax.while_loop(cond, body, state)

        # ---- finalize: offer still-running beams to the pool ----
        # HF finalize: generated_len = step (all generated tokens, no EOS)
        run_scores = jnp.where(
            done[:, None], NEG,
            beam_scores / jnp.maximum(step.astype(jnp.float32), 1.0) ** lp)
        pool_scores = jnp.concatenate([hyp_scores, run_scores], axis=1)
        pool_tokens = jnp.concatenate([hyp_tokens, tokens], axis=1)
        pool_lengths = jnp.concatenate(
            [hyp_lengths,
             jnp.broadcast_to(step, (B, K)).astype(jnp.int32)], axis=1)
        order = self._hyp_rank(pool_scores)[:, :1]
        best_tokens = jnp.take_along_axis(pool_tokens, order[:, :, None],
                                          axis=1)[:, 0]
        best_len = jnp.take_along_axis(pool_lengths, order, axis=1)[:, 0]
        best_score = jnp.take_along_axis(pool_scores, order, axis=1)[:, 0]
        # pad beyond the hypothesis length
        pos = jax.lax.broadcasted_iota(jnp.int32, best_tokens.shape, 1)
        best_tokens = jnp.where(pos < best_len[:, None], best_tokens,
                                self.pad_id)
        return best_tokens, best_len, best_score

    @staticmethod
    def _gather_cache(cache, beam_src, B, K):
        """Reorder beam cache rows: row (b, k) ← (b, beam_src[b, k])."""
        flat = (jnp.arange(B)[:, None] * K + beam_src).reshape(-1)  # [BK]
        # tree-map per layer: covers plain arrays and QuantizedKV layers
        return {
            kv: tuple(jax.tree.map(lambda a: jnp.take(a, flat, axis=0),
                                   layer)
                      for layer in layers)
            for kv, layers in cache.items()
        }

    # ------------------------------------------------------------------
    def generate(self, params, pixels: jax.Array, pre_ids: jax.Array,
                 post_ids: jax.Array, prompt_len: jax.Array) -> BeamResult:
        pl_host = np.asarray(prompt_len)
        uniform = bool((pl_host == pl_host[0]).all())
        tokens, lengths, scores = self._search(params, pixels, pre_ids,
                                               post_ids, prompt_len,
                                               uniform=uniform)
        return BeamResult(tokens=tokens, lengths=lengths, scores=scores)
