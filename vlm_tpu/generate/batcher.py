"""Continuous batching: slot-based admission over a stream of images.

The wave-based :class:`~vlm_tpu.generate.decode.GenerationEngine` loses
throughput when generation lengths vary — the whole batch waits for its
slowest member. This engine instead keeps ``B`` decode slots busy:

- a slot that hits EOS (or the token cap) is refilled by prefilling the
  next pending image *into that slot* of the shared KV cache (batched group
  admission: up to ``admit_block`` free slots prefill together, amortizing
  the vision encoder over admissions);
- decode runs in **adaptive chunks inside one jit**: a chunk keeps stepping
  (``lax.while_loop`` with in-device EOS/cap tracking) until enough slots
  have freed up for the next admission block — or every slot is done. The
  host syncs once per admission cycle, not once per token or per fixed
  stride. Generated tokens accumulate in a device-resident history buffer
  ``[B, max_new_tokens]``, and each sync pulls ONE packed array (history +
  active bitmap + counts). On a remote-attached TPU a host round trip costs
  ~40 ms — multiples of a decode step — so round trips scale with
  admissions (~n_images/admit_block), not with generated tokens;
- admission itself needs **no host round trip**: the per-slot decode state
  (current token, length, generated count, cap, active flag, token history,
  rng step) lives on the device and admission updates it inside the prefill
  program. The host's slot mirror is refreshed from the packed sync;
- the default loop is **pipelined** (``sync_every=0``): admission picks its
  slots *on the device* (first free by slot index — the ``occ`` occupancy
  bit), so the host can enqueue the next cycle's admit+chunk programs
  before the previous chunk's results are pulled. The device queue never
  drains across admission cycles; per-cycle host work (packed pull +
  pixel upload + dispatch) hides under device compute instead of
  serializing with it (~40 ms tunnel RTT per round trip otherwise). A
  positive ``sync_every`` selects the legacy synchronous loop (host syncs
  once per chunk — tighter latency observation, used by latency-recipe
  measurements).

All device work is jitted with static shapes: per-slot cache writes go
through the Pallas scatter-write kernel (`vlm_tpu/ops/kvcache.py`),
admission group size is a compiled constant, the free-slot stop threshold
and chunk-step cap are *traced* scalars (no recompiles as supply drains),
and the host loop only moves integers and tokens. This is the "slot-based
cache with admission on slot-free" design from SURVEY.md §7 ("Continuous
batching with KV-cache paging") — simpler than paged attention but
sufficient because every prompt in a run has the same length.
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
    # Host mirror holds only identity + liveness; caps/EOS/counts are
    # tracked on-device and arrive via the packed sync.
    image_idx: int = -1          # which input this slot is generating for
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
                 sync_every: int = 0,
                 pipeline_depth: int = 1,
                 mesh=None):
        self.module = module
        self.cfg = cfg
        self.batch_size = batch_size
        #: optional (data, model) mesh: the slot-state and KV cache shard
        #: their batch (slot) dim over "data", so decode chunks run SPMD
        #: data-parallel while the TP params shard the matmuls. The caller
        #: is responsible for running :meth:`run` under the ambient mesh
        #: (``maybe_mesh``) and for batch_size % data == 0.
        self.mesh = mesh
        if mesh is not None:
            from ..core.mesh import DATA_AXIS
            if batch_size % mesh.shape[DATA_AXIS] != 0:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh "
                    f"data axis {mesh.shape[DATA_AXIS]}")
        self.max_new_tokens = max_new_tokens
        self.max_prompt_len = max_prompt_len
        self.cache_len = max_prompt_len + max_new_tokens
        self.cache_dtype = cache_dtype
        self.eos_id = cfg.decoder.eos_token_id if eos_id is None else eos_id
        self.pad_id = cfg.decoder.pad_token_id if pad_id is None else pad_id
        # Default admission block: ~8 slots per admission, scaled down for
        # small batches. Decode chunks run until admit_block slots are
        # free, so large blocks leave freed slots idle between admissions
        # (occupancy loss), while tiny blocks pay per-admission dispatch
        # and small-g prefill cost. Measured on v5e (round 5): B=128 best
        # at 8 (8bit 86.8 img/s vs 77.7 at the old B//4=32; bf16 61.3 vs
        # 56.3), B=64 best at 8 (32.8 vs 32.1 at 16), B=16 best at 4
        # (admit 2 degrades severely). clamp(B//8, 4, 8) hits every
        # measured best at the recipe batch sizes; above 128 slots the
        # cap of 8 is measurably low (B=192: admit 16 beats admit 8 by
        # +4.7%) — pass admit_block explicitly for oversized batches.
        self.admit_block = admit_block or min(
            batch_size, max(4, min(8, batch_size // 8)))
        if not 1 <= self.admit_block <= batch_size:
            raise ValueError(
                f"admit_block ({self.admit_block}) must be in "
                f"[1, batch_size={batch_size}]: a full admission block must "
                "be able to find enough free slots")
        # Upper bound on decode steps per chunk. 0 = adaptive only (a chunk
        # runs until the free-slot threshold / completion); a positive value
        # caps the chunk and forces a host sync at least every N steps
        # (tighter progress reporting at the cost of more round trips).
        self.sync_every = int(sync_every)
        # Pipelined loop (sync_every=0): number of un-pulled chunk results
        # allowed in flight. 1 keeps the device exactly one admission cycle
        # ahead of the host — enough to hide tunnel round trips without
        # inflating the latency-observation lag; raise it only if per-cycle
        # host work (pull + pixel upload + dispatch) exceeds per-cycle
        # device time.
        self.pipeline_depth = max(1, int(pipeline_depth))
        # Sampling parity with the wave engine (greedy when temperature<=0).
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self._rng = rng if rng is not None else jax.random.key(0)
        self._runs = 0      # folds into the sampling key per run()

        # Split-admission A/B (VERDICT r4 item 5a): run the vision tower as
        # its own dispatched program and feed pre-projected image embeds to
        # the admission program, so XLA schedules the int8 prefill dot chain
        # alone. Default off — the fused program measured faster (see
        # IMPLEMENTATION_NOTES round-5 admission table); kept as an
        # env-gated capability for re-measurement on future hardware.
        import os
        self.split_admit = os.environ.get("VLM_TPU_SPLIT_ADMIT", "0") == "1"
        if self.split_admit:
            self._encode_images = jax.jit(
                lambda p, px: module.apply(p, px, method="encode_images"))

        # The cache is donated: each call's input buffer is dead afterwards,
        # so XLA updates it in place instead of holding a second multi-GB
        # copy in HBM.
        self._admit_group = jax.jit(self._admit_group_impl,
                                    donate_argnums=(6, 7))
        self._decode_chunk = jax.jit(self._decode_chunk_impl,
                                     donate_argnums=(1, 2))

    # ------------------------- jitted device fns -------------------------
    def _sample(self, logits: jax.Array, rng: Optional[jax.Array],
                step: jax.Array) -> jax.Array:
        from .decode import _sample
        return _sample(logits, self.temperature,
                       rng,                    # traced key; None = greedy
                       step, self.top_k, self.top_p)

    def _init_state(self, rng: Optional[jax.Array] = None):
        """Device-resident per-slot decode state. Lives on the device across
        the whole run; admission updates it inside the prefill program and
        chunks carry it — the host never re-uploads it. When sampling, the
        run's key travels in the state (a traced input), so successive
        runs draw fresh streams without recompiling."""
        b = self.batch_size
        state = {
            "cur": jnp.full((b,), self.pad_id, jnp.int32),
            "slen": jnp.zeros((b,), jnp.int32),
            "gcnt": jnp.zeros((b,), jnp.int32),
            "caps": jnp.full((b,), self.max_new_tokens, jnp.int32),
            "act": jnp.zeros((b,), bool),
            "hist": jnp.full((b, self.max_new_tokens), self.pad_id,
                             jnp.int32),
            "step": jnp.zeros((), jnp.int32),
            # Rotating decode window (see _decode_chunk_impl): dstep counts
            # CHUNK steps only (not admissions); acol[i] = dstep mod W at
            # slot i's admission; pcol = the run's batch-constant prompt
            # length (the window starts right after the prompt rows).
            "dstep": jnp.zeros((), jnp.int32),
            "acol": jnp.zeros((b,), jnp.int32),
            "pcol": jnp.zeros((), jnp.int32),
            # Occupancy: True from admission until the end of the next
            # decode chunk observes the slot inactive. Differs from "act"
            # only for slots that finish *inside* an admission (EOS/cap=1
            # first token): they stay occupied until a chunk runs, so
            # back-to-back admissions never reuse a slot whose result the
            # host hasn't had a chance to observe. Device-side slot choice
            # (first g free by index) therefore exactly mirrors the host's
            # slot table at every point in the dispatch order.
            "occ": jnp.zeros((b,), bool),
        }
        if self.temperature > 0.0:
            state["rng"] = rng if rng is not None else \
                jax.random.fold_in(self._rng, self._runs)
        return state

    def _admit_group_impl(self, params, pixels, pre_ids, post_ids,
                          prompt_len, caps_new, state, cache):
        """Prefill ``g`` sequences into the first ``g`` FREE slots (chosen
        on-device: lowest unoccupied slot indices) and update the per-slot
        decode state (caps from ``caps_new`` [g]). The group's first sampled
        tokens land in the history buffer — nothing returns to the host.

        Device-side slot choice is what makes the pipelined host loop
        possible: the host can dispatch this program without having synced
        which slots freed during the previous chunk. The choice (stable
        argsort of ``occ`` → first g free, ascending index) is identical to
        the host mirror's ``free[:g]``, so the host reconstructs the
        assignment without any extra device pull. The caller must guarantee
        ≥ g slots are free at execution time (the previous chunk's
        ``stop_free`` provides it)."""
        g = pixels.shape[0]
        # Free slots first (False < True), ties broken by ascending index
        # (stable sort) — exactly the host's free[:g].
        slots = jnp.argsort(state["occ"], stable=True)[:g]
        # The group cache only ever holds PROMPT rows (prefill writes at
        # columns [0, max_prompt_len)); allocating it cache_len deep — and
        # streaming those provably-zero decode-window columns through the
        # scatter — was ~(max_new/cache_len) wasted traffic per admission.
        group_cache = init_kv_cache(self.cfg.decoder, g, self.max_prompt_len,
                                    self.cache_dtype)
        if pixels.ndim == 3:
            # Split-admission mode: ``pixels`` carries pre-projected image
            # embeds [g, T_img, H] from the separate vision program.
            last, group_cache = self.module.apply(
                params, None, pre_ids, post_ids, group_cache, prompt_len,
                method="prefill", image_embeds=pixels)
        else:
            last, group_cache = self.module.apply(
                params, pixels, pre_ids, post_ids, group_cache, prompt_len,
                method="prefill")

        def scatter_one(full, part):
            # full: [B, cache_len, ...]; part: [g, max_prompt_len, ...] —
            # each slot's prompt rows land at columns [0, max_prompt_len)
            # of its cache row (the decode window behind them is validated
            # only after fresh writes, so it needs no clearing).
            zeros = (jnp.zeros((), jnp.int32),) * (part.ndim - 1)

            def write(i, acc):
                sl = jax.lax.dynamic_slice_in_dim(part, i, 1, axis=0)
                return jax.lax.dynamic_update_slice(
                    acc, sl, (slots[i],) + zeros)
            return jax.lax.fori_loop(0, g, write, full)

        def scatter_layer(full_l, part_l):
            # tree-map covers plain arrays and QuantizedKV (int8) layers
            return jax.tree.map(scatter_one, full_l, part_l)

        cache = {
            "k": tuple(scatter_layer(f, p)
                       for f, p in zip(cache["k"], group_cache["k"])),
            "v": tuple(scatter_layer(f, p)
                       for f, p in zip(cache["v"], group_cache["v"])),
        }
        first = self._sample(last, state.get("rng"), state["step"])
        act_new = (first != self.eos_id) & (caps_new > 1)
        # Reset the admitted slots' history rows (stale tokens from the
        # previous occupant) and record each sequence's first token.
        hist = state["hist"].at[slots].set(self.pad_id)
        hist = hist.at[slots, 0].set(first)
        new_state = {
            "cur": state["cur"].at[slots].set(
                jnp.where(act_new, first, self.pad_id)),
            "slen": state["slen"].at[slots].set(prompt_len),
            "gcnt": state["gcnt"].at[slots].set(1),
            "caps": state["caps"].at[slots].set(caps_new),
            "act": state["act"].at[slots].set(act_new),
            "hist": hist,
            "step": state["step"] + 1,
            # Admission does not advance dstep, so every group admitted in
            # one cycle shares the window origin of the next chunk's first
            # step — preserving the invariant dstep - acol ≡ gcnt - 1
            # (mod W) for active slots.
            "dstep": state["dstep"],
            "acol": state["acol"].at[slots].set(
                jnp.mod(state["dstep"], self.max_new_tokens)),
            "pcol": prompt_len[0].astype(jnp.int32),
            # Occupied regardless of act_new: an EOS-at-admission slot is
            # not reusable until the next chunk's packed result has had a
            # chance to carry its history row to the host.
            "occ": state["occ"].at[slots].set(True),
        }
        if "rng" in state:
            new_state["rng"] = state["rng"]
        return new_state, cache

    def _decode_chunk_impl(self, params, state, cache, stop_free,
                           max_steps):
        """Decode for all slots in one device program until at least
        ``stop_free`` slots are free (EOS/cap bookkeeping runs in-device),
        every slot is done, or ``max_steps`` steps ran. Tokens accumulate in
        the device-resident history; the return packs history + active
        bitmap + generated counts into ONE int32 array so the host pays a
        single pull per sync."""
        b = self.batch_size
        n_new = self.max_new_tokens
        caps = state["caps"]
        base_step = state["step"]
        base_dstep = state["dstep"]
        pcol = state["pcol"]
        acol = state["acol"]
        rng = state.get("rng")
        col = jnp.arange(n_new, dtype=jnp.int32)[None, :]       # [1, n_new]
        # Rotating decode window: at chunk step t (= dstep), EVERY slot
        # writes its new KV row at cache column pcol + (t mod W) — a
        # scalar-offset slice update, not a per-slot scatter (the Pallas
        # scatter kernel's B-program grid measured 3.3 ms/step at B=128 on
        # 3B; the uniform write is 1.3 ms). Slot i's live rows are
        # reconstructed in the attention mask: its j-th generated token
        # (j = 0 .. gcnt-1) sits at column pcol + ((acol_i + j) mod W),
        # because active slots decode once per chunk step
        # (dstep - acol_i ≡ gcnt_i - 1 mod W) and each column a slot can
        # reach was freshly written after its admission (every step writes
        # ALL rows, active or not, so stale rows from previous occupants
        # are always overwritten before the mask can reach them). Column
        # order is invisible to softmax; RoPE positions still come from
        # slen, so tokens are bit-identical to the per-slot-scatter layout.
        cache_cols = jnp.arange(self.cache_len, dtype=jnp.int32)[None, :]
        # Mask precompute, hoisted out of the while body (XLA does not LICM
        # across while_loop iterations): only `j < gcnt` varies per step.
        # Folding the three loop-invariant terms into one int32 key makes
        # the in-loop mask a single compare: prompt rows get key -1
        # (< any gcnt ≥ 0 → always valid), columns outside the window get
        # key n_new (≥ every cap → never valid), window rows keep their
        # per-slot modular age j.
        j = jnp.mod(cache_cols - pcol - acol[:, None], n_new)   # [B, L]
        valid_key = jnp.where(cache_cols < pcol, -1,
                              jnp.where(cache_cols < pcol + n_new, j, n_new))

        def free(act):
            return b - jnp.sum(act.astype(jnp.int32))

        def cond(carry):
            k, _, _, _, act, _, _ = carry
            return (k < max_steps) & jnp.any(act) & (free(act) < stop_free)

        def body(carry):
            k, cur, slen, gcnt, act, hist, cache = carry
            wcol = pcol + jnp.mod(base_dstep + k, n_new)
            valid = valid_key < gcnt[:, None]
            logits, cache = self.module.apply(
                params, cur[:, None], slen, cache, method="decode_step",
                write_col=wcol, kv_valid=valid,
                # Scalar form of the same mask: the fused decode kernel
                # rebuilds it from an in-kernel iota (no [B, L] stream);
                # paths that consume kv_valid instead leave this dead.
                kv_window=(pcol, n_new, acol, gcnt))
            nxt = self._sample(logits, rng, base_step + k)
            nxt = jnp.where(act, nxt, self.pad_id)
            # Dense masked write of token #gcnt per active slot (a scatter
            # at [i, gcnt[i]] serializes on TPU; this streams [B, n_new]).
            hist = jnp.where(act[:, None] & (col == gcnt[:, None]),
                             nxt[:, None], hist)
            finished = act & ((nxt == self.eos_id) | (gcnt + 1 >= caps))
            slen = slen + act.astype(jnp.int32)
            gcnt = gcnt + act.astype(jnp.int32)
            act = act & ~finished
            cur = jnp.where(act, nxt, self.pad_id)
            return (k + 1, cur, slen, gcnt, act, hist, cache)

        carry = (jnp.asarray(0, jnp.int32), state["cur"], state["slen"],
                 state["gcnt"], state["act"], state["hist"], cache)
        k, cur, slen, gcnt, act, hist, cache = jax.lax.while_loop(
            cond, body, carry)
        new_state = {"cur": cur, "slen": slen, "gcnt": gcnt, "caps": caps,
                     "act": act, "hist": hist, "step": base_step + k,
                     "dstep": base_dstep + k, "acol": acol, "pcol": pcol,
                     # Chunk exit is the host-observability boundary: every
                     # slot inactive here has its result in this packed
                     # return, so it becomes reusable (occ := act).
                     "occ": act}
        if rng is not None:
            new_state["rng"] = rng
        packed = jnp.concatenate(
            [hist, act.astype(jnp.int32)[:, None], gcnt[:, None]], axis=1)
        if self.mesh is not None:
            # The host pulls this array every sync; replicating it makes it
            # fully addressable under multi-process meshes (one small
            # all-gather) and is a no-op cost single-process.
            from jax.sharding import NamedSharding, PartitionSpec
            packed = jax.lax.with_sharding_constraint(
                packed, NamedSharding(self.mesh, PartitionSpec()))
        return packed, new_state, cache

    # ------------------------- host loop -------------------------
    def run(self, params, pixel_fn: Callable[[List[int]], jax.Array],
            pre_ids_row: np.ndarray, post_ids_row: np.ndarray,
            prompt_len_scalar: int, n_images: int,
            progress: Optional[Callable[[int], None]] = None,
            max_new_per_image: Optional[Sequence[int]] = None,
            prefetch_depth: int = 2,
            rng: Optional[jax.Array] = None) -> List[List[int]]:
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
            rng: sampling key for this run (temperature>0 only). Default:
                the constructor key folded with a per-run counter, so
                repeated runs draw fresh streams.
        Returns: generated token lists, in input order. After the call,
        :attr:`last_latency_s` holds per-image admission→completion latency
        (None for images never admitted, e.g. after an interrupt).

        Latency semantics: completion is observed at chunk sync, so
        ``last_latency_s`` is quantized to admission-cycle granularity —
        with ``sync_every=0`` a chunk can span up to ``max_new_tokens``
        steps, so a slot that finished early in a long chunk reports the
        chunk's end time. This is the honest *host-observable* latency (a
        caller could not have acted sooner). Measured (r4 sweep,
        IMPLEMENTATION_NOTES "sync_every latency recipe"): while groups
        keep arriving the pipelined loop already syncs once per admission
        cycle, so ``sync_every>0`` does NOT tighten p50/p99 at the
        headline workload — it only costs throughput (−6…−15%). The knob
        remains for step-capped measurement runs (e.g. fixed-step phase
        decomposition); tail control in deployment is ``max_new_tokens``.

        Loop selection: ``sync_every=0`` (default) runs the pipelined loop —
        admit/chunk programs for cycle k+1 are enqueued before cycle k's
        packed result is pulled, so tunnel round trips and pixel uploads
        hide under device compute. ``sync_every>0`` runs the legacy
        synchronous loop (one blocking sync per chunk): chunk-length caps
        would break the pipelined loop's free-slot guarantee (an admission
        may only execute once the previous chunk has freed enough slots,
        which a step-capped chunk cannot promise).
        """
        B = self.batch_size
        n_new = self.max_new_tokens
        cache = init_kv_cache(self.cfg.decoder, B, self.cache_len,
                              self.cache_dtype)
        state = self._init_state(rng)
        if self.mesh is not None:
            # Slot-dim sharding over "data": jit carries these shardings
            # through every admit/decode program, so the cache stream and
            # decode matmuls split across the data axis.
            from ..parallel.sharding import shard_batch
            cache = shard_batch(cache, self.mesh)
            state = shard_batch(state, self.mesh)
        self._runs += 1
        slots = [_Slot() for _ in range(B)]
        results: List[Optional[List[int]]] = [None] * n_images
        self.last_latency_s: List[Optional[float]] = [None] * n_images
        t_admit: List[float] = [0.0] * n_images

        pre_g = {}
        post_g = {}
        plen_g = {}

        # Admission happens in fixed blocks of input order, so a producer
        # thread can decode block i+1's images while the device decodes.
        blocks = [list(range(i, min(i + self.admit_block, n_images)))
                  for i in range(0, n_images, self.admit_block)]
        block_iter = prefetch_batches(
            blocks, lambda idxs: (idxs, pixel_fn(idxs)),
            depth=max(1, prefetch_depth))

        max_steps = jnp.asarray(n_new if self.sync_every <= 0
                                else self.sync_every, jnp.int32)
        stop_never = jnp.asarray(B + 1, jnp.int32)   # drain: run to done

        # NB: dispatches are async — "admit_s"/"chunk_dispatch_s" time only
        # program submission. "sync_s" blocks until the dispatched chunk
        # finishes on the device, so it is decode compute + the host pull,
        # not pull alone (in the pipelined loop the wait overlaps the next
        # cycle's device work, so large sync_s there is *hidden* time).
        stats = {"admit_s": 0.0, "admits": 0, "chunk_dispatch_s": 0.0,
                 "chunks": 0, "sync_s": 0.0, "block_wait_s": 0.0}
        self.last_stats = stats

        def timed(key, fn, *a):
            t0 = time.perf_counter()
            out = fn(*a)
            stats[key + "_s"] += time.perf_counter() - t0
            return out

        def dispatch_admit(idxs: List[int], pixels):
            """Enqueue the admission program. Slot choice happens on the
            device (first g free, ascending index); the host mirrors it in
            assign_slots without any device pull."""
            nonlocal cache, state
            g = len(idxs)
            stats["admits"] += 1
            if g not in pre_g:
                pre_g[g] = jnp.asarray(np.repeat(pre_ids_row[None], g, 0))
                post_g[g] = jnp.asarray(np.repeat(post_ids_row[None], g, 0))
                plen_g[g] = jnp.full((g,), prompt_len_scalar, jnp.int32)
            caps = []
            for j in range(g):
                cap = self.max_new_tokens
                if max_new_per_image is not None:
                    cap = max(1, min(cap, int(max_new_per_image[idxs[j]])))
                caps.append(cap)
            if self.split_admit:
                pixels = self._encode_images(params, pixels)
            state, cache = self._admit_group(
                params, pixels, pre_g[g], post_g[g], plen_g[g],
                jnp.asarray(np.asarray(caps, np.int32)), state, cache)

        def assign_slots(idxs: List[int], t0: float) -> None:
            """Mirror the device's slot choice for admission ``idxs``: the
            first len(idxs) free slots in ascending index order — identical
            to argsort(occ)[:g] because the mirror is updated in dispatch
            order (occupied at admit, freed only when a chunk's packed
            result has been resolved)."""
            free = [i for i, s in enumerate(slots) if not s.active]
            assert len(free) >= len(idxs), "admission without free slots"
            for j, s in enumerate(free[:len(idxs)]):
                slots[s] = _Slot(image_idx=idxs[j], active=True)
                t_admit[idxs[j]] = t0

        def resolve(packed) -> None:
            """Pull the packed chunk result (ONE host round trip) and
            resolve every slot the device finished since the last sync."""
            t0 = time.perf_counter()
            arr = np.asarray(packed)
            stats["sync_s"] += time.perf_counter() - t0
            act = arr[:, n_new].astype(bool)
            gcnt = arr[:, n_new + 1]
            now = time.perf_counter()
            for i, s in enumerate(slots):
                if not s.active or act[i]:
                    continue
                toks = [int(t) for t in arr[i, :gcnt[i]]
                        if t != self.eos_id]
                results[s.image_idx] = toks
                self.last_latency_s[s.image_idx] = now - t_admit[s.image_idx]
                slots[i] = _Slot()
                if progress is not None:
                    progress(1)

        # Pipelined-loop event stream: admissions and chunk results are
        # recorded at dispatch and replayed in order when resolved, so the
        # host mirror always reflects device state at the corresponding
        # point of the dispatch stream. Held at run() scope so the
        # interrupt handler can drain already-dispatched work.
        events: List[tuple] = []   # ("admit", idxs, t) | ("chunk", arr, t)
        t_last_pull = 0.0

        def process_event() -> None:
            nonlocal t_last_pull
            kind, payload, t0 = events.pop(0)
            if kind == "admit":
                assign_slots(payload, max(t0, t_last_pull))
            else:
                resolve(payload)
                t_last_pull = time.perf_counter()

        def drain_events(keep_chunks: int) -> None:
            while sum(1 for e in events if e[0] == "chunk") > keep_chunks:
                process_event()

        def run_sync() -> None:
            """Legacy synchronous loop: one blocking sync per chunk."""
            nonlocal state, cache
            pending = timed("block_wait", next, block_iter, None)
            while pending is not None or any(s.active for s in slots):
                n_free = sum(not s.active for s in slots)
                if pending is not None and n_free >= len(pending[0]):
                    # Admission dispatches device work but needs no host
                    # round trip — slot state updates inside the program.
                    idxs, pixels = pending
                    t0 = time.perf_counter()
                    timed("admit", dispatch_admit, idxs, pixels)
                    assign_slots(idxs, t0)
                    pending = timed("block_wait", next, block_iter, None)
                    continue
                # Decode until the next admission fits (or, with no supply
                # left, until every slot drains). stop_free is traced — the
                # same compiled chunk serves admission-sized stops and the
                # final drain.
                stop = (jnp.asarray(len(pending[0]), jnp.int32)
                        if pending is not None else stop_never)
                stats["chunks"] += 1
                t0 = time.perf_counter()
                packed, state, cache = self._decode_chunk(
                    params, state, cache, stop, max_steps)
                stats["chunk_dispatch_s"] += time.perf_counter() - t0
                resolve(packed)

        def run_pipelined() -> None:
            """Pipelined loop: enqueue cycle k+1's admit+chunk before
            pulling cycle k's packed result. Events (admissions, chunk
            results) are recorded at dispatch and replayed in order when
            resolved, so the host mirror always reflects device state at
            the corresponding point of the dispatch stream.

            The free-slot guarantee that makes blind dispatch safe: a chunk
            with stop_free=s only exits once ≥ s slots are free (its step
            cap is max_new_tokens, enough for every active slot to reach
            its cap), so the following admission of g ≤ s images always
            finds slots. ``guaranteed`` tracks the conservative free count
            along the dispatch stream.

            Latency accounting: an admission's wall-clock start is taken as
            max(dispatch time, pull time of the chunk dispatched before it)
            — the device cannot have started it earlier than either.
            Completions are observed at the (lazy, one-cycle-behind) packed
            pull, so percentiles carry up to one extra cycle of observation
            lag versus the synchronous loop."""
            nonlocal state, cache
            guaranteed = B
            pending = timed("block_wait", next, block_iter, None)
            while pending is not None:
                while pending is not None and guaranteed >= len(pending[0]):
                    idxs, pixels = pending
                    timed("admit", dispatch_admit, idxs, pixels)
                    events.append(("admit", idxs, time.perf_counter()))
                    guaranteed -= len(idxs)
                    pending = timed("block_wait", next, block_iter, None)
                stop = (jnp.asarray(len(pending[0]), jnp.int32)
                        if pending is not None else stop_never)
                stats["chunks"] += 1
                t0 = time.perf_counter()
                packed, state, cache = self._decode_chunk(
                    params, state, cache, stop, max_steps)
                stats["chunk_dispatch_s"] += time.perf_counter() - t0
                events.append(("chunk", packed, t0))
                guaranteed = len(pending[0]) if pending is not None else B
                drain_events(self.pipeline_depth)
            # The final chunk (stop_never) drained every slot on-device;
            # replay the remaining events to collect its results.
            while events:
                process_event()

        try:
            if self.sync_every > 0:
                run_sync()
            else:
                run_pipelined()
        except KeyboardInterrupt:
            # Partial-results semantics (reference:
            # scripts/prompt_inference.py:80-86): unfinished inputs stay
            # None so the caller can evaluate only what completed. In the
            # pipelined loop, already-dispatched chunks complete on-device
            # regardless of the interrupt (bounded: ≤ pipeline_depth+1
            # chunks); replaying the recorded events collects their
            # results too.
            print("\n[batcher] interrupted — returning completed results")
            try:
                while events:
                    process_event()
            except Exception:
                pass
        finally:
            block_iter.close()
        return results
