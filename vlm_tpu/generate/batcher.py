"""Continuous batching: slot-based admission over a stream of images.

The wave-based :class:`~vlm_tpu.generate.decode.GenerationEngine` loses
throughput when generation lengths vary — the whole batch waits for its
slowest member. This engine instead keeps ``B`` decode slots busy:

- a slot that hits EOS (or the token cap) is refilled by prefilling the
  next pending image *into that slot* of the shared KV cache (batched group
  admission: up to ``admit_block`` free slots prefill together, amortizing
  the vision encoder over admissions);
- decode runs in **chunks of ``sync_every`` steps inside one jit**
  (``lax.while_loop`` with in-device EOS/cap tracking), so the host syncs
  once per chunk, not once per token. A decode step is ~7-10 ms of device
  work; a per-token host round trip (dispatch + token pull) costs multiples
  of that through a remote-attached TPU and is pure overhead even locally.
  The chunk loop exits early once every slot is done, so the tail admission
  latency stays bounded by the real work, not by the chunk size.

All device work is jitted with static shapes: per-slot cache writes go
through the Pallas scatter-write kernel (`vlm_tpu/ops/kvcache.py`),
admission group size and chunk length are compiled constants, and the host
loop only moves integers and tokens. This is the "slot-based cache with
admission on slot-free" design from SURVEY.md §7 ("Continuous batching with
KV-cache paging") — simpler than paged attention but sufficient because
every prompt in a run has the same length.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import prefetch_batches
from ..models.configs import VLMConfig
from ..models.decoder import init_kv_cache
from ..models.vlm import VLMModule


@dataclasses.dataclass
class _Slot:
    image_idx: int = -1          # which input this slot is generating for
    tokens: List[int] = dataclasses.field(default_factory=list)
    active: bool = False


class ContinuousBatcher:
    def __init__(self, module: VLMModule, cfg: VLMConfig, *,
                 batch_size: int, max_prompt_len: int,
                 max_new_tokens: int = 100,
                 admit_block: Optional[int] = None,
                 cache_dtype=jnp.bfloat16,
                 eos_id: Optional[int] = None,
                 pad_id: Optional[int] = None,
                 temperature: float = 0.0,
                 top_k: int = 0,
                 top_p: float = 1.0,
                 rng: Optional[jax.Array] = None,
                 sync_every: int = 8):
        self.module = module
        self.cfg = cfg
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens
        self.max_prompt_len = max_prompt_len
        self.cache_len = max_prompt_len + max_new_tokens
        self.cache_dtype = cache_dtype
        self.eos_id = cfg.decoder.eos_token_id if eos_id is None else eos_id
        self.pad_id = cfg.decoder.pad_token_id if pad_id is None else pad_id
        self.admit_block = admit_block or max(1, batch_size // 4)
        self.sync_every = max(1, sync_every)
        # Sampling parity with the wave engine (greedy when temperature<=0).
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self._rng = rng if rng is not None else jax.random.key(0)

        # The cache is donated: each call's input buffer is dead afterwards,
        # so XLA updates it in place instead of holding a second multi-GB
        # copy in HBM.
        self._prefill_group = jax.jit(self._prefill_group_impl,
                                      donate_argnums=(5,))
        self._decode_chunk = jax.jit(self._decode_chunk_impl,
                                     donate_argnums=(6,))

    # ------------------------- jitted device fns -------------------------
    def _sample(self, logits: jax.Array, step: jax.Array) -> jax.Array:
        from .decode import _sample
        return _sample(logits, self.temperature,
                       None if self.temperature <= 0.0 else self._rng,
                       step, self.top_k, self.top_p)

    def _prefill_group_impl(self, params, pixels, pre_ids, post_ids,
                            prompt_len, cache, slots, step):
        """Prefill ``g`` sequences and scatter their KV into ``cache`` at
        batch indices ``slots`` [g]."""
        g = pixels.shape[0]
        group_cache = init_kv_cache(self.cfg.decoder, g, self.cache_len,
                                    self.cache_dtype)
        last, group_cache = self.module.apply(
            params, pixels, pre_ids, post_ids, group_cache, prompt_len,
            method="prefill")

        def scatter_layer(full_l, part_l):
            # full_l: [B, S, H, D]; part_l: [g, S, H, D]
            def write(i, acc):
                sl = jax.lax.dynamic_slice_in_dim(part_l, i, 1, axis=0)
                return jax.lax.dynamic_update_slice_in_dim(
                    acc, sl, slots[i], axis=0)
            return jax.lax.fori_loop(0, g, write, full_l)

        cache = {
            "k": tuple(scatter_layer(f, p)
                       for f, p in zip(cache["k"], group_cache["k"])),
            "v": tuple(scatter_layer(f, p)
                       for f, p in zip(cache["v"], group_cache["v"])),
        }
        first_tok = self._sample(last, step)
        return first_tok, cache

    def _decode_chunk_impl(self, params, cur_tokens, seq_len, gen_count,
                           caps, active, cache, base_step):
        """Up to ``sync_every`` decode steps for all slots in one device
        program. EOS/cap bookkeeping runs in-device so the host only pulls
        the [K, B] token block per chunk; the loop exits early once every
        slot is done (bounding tail latency by work, not chunk size)."""
        K = self.sync_every
        b = cur_tokens.shape[0]
        toks0 = jnp.full((K, b), self.pad_id, jnp.int32)

        def cond(state):
            k, _, _, _, _, act, _ = state
            return jnp.logical_and(k < K, jnp.any(act))

        def body(state):
            k, toks, cur, slen, gcnt, act, cache = state
            logits, cache = self.module.apply(
                params, cur[:, None], slen, cache, method="decode_step")
            nxt = self._sample(logits, base_step + k)
            nxt = jnp.where(act, nxt, self.pad_id)
            toks = jax.lax.dynamic_update_slice(toks, nxt[None], (k, 0))
            finished = act & ((nxt == self.eos_id) | (gcnt + 1 >= caps))
            slen = slen + act.astype(jnp.int32)
            gcnt = gcnt + act.astype(jnp.int32)
            act = act & ~finished
            cur = jnp.where(act, nxt, self.pad_id)
            return (k + 1, toks, cur, slen, gcnt, act, cache)

        state = (jnp.asarray(0, jnp.int32), toks0, cur_tokens, seq_len,
                 gen_count, active, cache)
        _, toks, _, _, _, _, cache = jax.lax.while_loop(cond, body, state)
        return toks, cache

    # ------------------------- host loop -------------------------
    def run(self, params, pixel_fn: Callable[[List[int]], jax.Array],
            pre_ids_row: np.ndarray, post_ids_row: np.ndarray,
            prompt_len_scalar: int, n_images: int,
            progress: Optional[Callable[[int], None]] = None,
            max_new_per_image: Optional[Sequence[int]] = None,
            prefetch_depth: int = 2) -> List[List[int]]:
        """Generate for ``n_images`` inputs.

        Args:
            pixel_fn: called with a list of image indices, returns their
                normalized pixel batch. Runs on a background prefetch thread
                in admission-block granularity, so host image decode overlaps
                device decode steps (the JAX-native analogue of the
                reference's DataLoader workers,
                `/root/reference/probing/train/multitask_trainer.py:165-175`).
            pre_ids_row/post_ids_row: the (batch-constant) prompt id rows.
            prompt_len_scalar: merged prompt length.
            max_new_per_image: optional per-request generation caps (each
                clamped to ``max_new_tokens``) — the serving analogue of a
                per-request ``max_tokens`` parameter.
        Returns: generated token lists, in input order. After the call,
        :attr:`last_latency_s` holds per-image admission→completion latency
        (None for images never admitted, e.g. after an interrupt).
        """
        B = self.batch_size
        cache = init_kv_cache(self.cfg.decoder, B, self.cache_len,
                              self.cache_dtype)
        slots = [_Slot() for _ in range(B)]
        results: List[Optional[List[int]]] = [None] * n_images
        self.last_latency_s: List[Optional[float]] = [None] * n_images
        t_admit: List[float] = [0.0] * n_images
        cur_tokens = np.full((B,), self.pad_id, np.int32)
        seq_len = np.full((B,), 0, np.int32)
        gen_count = np.zeros((B,), np.int32)
        caps = np.full((B,), self.max_new_tokens, np.int32)

        pre_g = {}
        post_g = {}
        # monotone device-call counter folded into the sampling rng (traced
        # scalar — no recompilation per step)
        global_step = [0]

        # Admission happens in fixed blocks of input order, so a producer
        # thread can decode block i+1's images while the device decodes.
        blocks = [list(range(i, min(i + self.admit_block, n_images)))
                  for i in range(0, n_images, self.admit_block)]
        block_iter = prefetch_batches(
            blocks, lambda idxs: (idxs, pixel_fn(idxs)),
            depth=max(1, prefetch_depth))

        def admit(free: List[int], idxs: List[int], pixels):
            nonlocal cache
            group = free[:len(idxs)]
            g = len(group)
            now = time.perf_counter()
            for idx in idxs:
                t_admit[idx] = now
            if g not in pre_g:
                pre_g[g] = jnp.asarray(np.repeat(pre_ids_row[None], g, 0))
                post_g[g] = jnp.asarray(np.repeat(post_ids_row[None], g, 0))
            plen = jnp.full((g,), prompt_len_scalar, jnp.int32)
            global_step[0] += 1
            first, cache = self._prefill_group(
                params, pixels, pre_g[g], post_g[g], plen, cache,
                jnp.asarray(group, jnp.int32),
                jnp.asarray(global_step[0], jnp.int32))
            first = np.asarray(first)
            for j, s in enumerate(group):
                cap = self.max_new_tokens
                if max_new_per_image is not None:
                    cap = max(1, min(cap, int(max_new_per_image[idxs[j]])))
                slots[s] = _Slot(image_idx=idxs[j], tokens=[int(first[j])],
                                 active=True)
                cur_tokens[s] = first[j]
                seq_len[s] = prompt_len_scalar
                gen_count[s] = 1
                caps[s] = cap
                if int(first[j]) == self.eos_id or cap <= 1:
                    slots[s].active = False
                    _finish(s)

        def _finish(s: int):
            slot = slots[s]
            toks = [t for t in slot.tokens if t != self.eos_id]
            results[slot.image_idx] = toks
            self.last_latency_s[slot.image_idx] = \
                time.perf_counter() - t_admit[slot.image_idx]
            slots[s] = _Slot()
            if progress is not None:
                progress(1)

        pending = next(block_iter, None)
        try:
            while pending is not None or any(s.active for s in slots):
                free = [i for i, s in enumerate(slots) if not s.active]
                if pending is not None and len(free) >= len(pending[0]):
                    admit(free, *pending)
                    pending = next(block_iter, None)
                    continue
                # one chunk of up to sync_every decode steps for all slots;
                # the host replays the [K, B] token block to update its slot
                # state (EOS/cap rules identical to the device bookkeeping)
                active = np.asarray([s.active for s in slots], bool)
                toks, cache = self._decode_chunk(
                    params, jnp.asarray(cur_tokens), jnp.asarray(seq_len),
                    jnp.asarray(gen_count), jnp.asarray(caps),
                    jnp.asarray(active), cache,
                    jnp.asarray(global_step[0], jnp.int32))
                global_step[0] += self.sync_every
                toks = np.asarray(toks)
                for k in range(toks.shape[0]):
                    if not any(s.active for s in slots):
                        break
                    row = toks[k]
                    for i, s in enumerate(slots):
                        if not s.active:
                            continue
                        t = int(row[i])
                        seq_len[i] += 1
                        gen_count[i] += 1
                        s.tokens.append(t)
                        if t == self.eos_id or gen_count[i] >= caps[i]:
                            s.active = False
                            _finish(i)
                    cur_tokens = np.where([s.active for s in slots], row,
                                          self.pad_id).astype(np.int32)
        except KeyboardInterrupt:
            # Partial-results semantics (reference:
            # scripts/prompt_inference.py:80-86): unfinished inputs stay
            # None so the caller can evaluate only what completed.
            print("\n[batcher] interrupted — returning completed results")
        finally:
            block_iter.close()
        return results
