"""VLM model wrapper: the user-facing model object with the reference's API
surface (``generate_text``, ``get_vision_backbone``) on top of the jitted
JAX stack.

Mirrors `/root/reference/models/base_model.py:6-100` capability-for-capability:

- quantization strings fp32/fp16/8bit/4bit → TPU dtype/quant policy
  (`vlm_tpu.core.dtypes` — documented deviations there);
- ``generate_text(image, prompt, max_tokens)`` — single-image parity API;
- ``generate_batch(images, prompt, max_tokens)`` — the TPU-native batched
  path the scripts actually use (the reference has no equivalent: its hot
  loop is batch-1, `scripts/prompt_inference.py:75-79`);
- ``get_vision_backbone(cleanup=True)`` — hands the vision tower + params to
  the probing subsystem and drops decoder references so HBM is released.

Weights: random-initialized unless a checkpoint/safetensors path is given
(``model_id`` pointing at a local directory) — see
`vlm_tpu.models.hf_weights` for the converter.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.dtypes import DTypePolicy, policy_for
from ..data.tokenizer import Tokenizer, load_tokenizer
from ..generate.decode import GenerationEngine, build_prompt_ids
from ..ops.preprocess import host_batch, normalize_images, recipe_for
from .backbone import VisionBackbone
from .configs import VLMConfig
from .vlm import init_vlm, num_image_tokens


def resolve_quantize_vision(flag: Optional[bool]) -> bool:
    """Resolve the ``quantize_vision`` knob: explicit value wins, else the
    ``VLM_TPU_QUANT_VISION=1`` env fallback. Exposed so trainers can record
    the *resolved* value in their config snapshots (``head_config.yaml``) —
    a tester run in a different shell must rebuild the same tower."""
    if flag is None:
        import os
        return os.environ.get("VLM_TPU_QUANT_VISION", "0") == "1"
    return bool(flag)


class VLMModel:
    """Base VLM. Subclasses define the prompt template via
    :meth:`format_prompt` (reference: llava.py:49-61, blip2.py:48,
    paligemma.py:62)."""

    #: subclasses set: config factory name ("llava" | "paligemma" | "blip2")
    family: str = ""

    def __init__(self, model_id: Optional[str] = None,
                 device=None, quantization: str = "fp32", *,
                 size: Optional[str] = None, seed: int = 0,
                 batch_size: int = 8, attn_impl: str = "auto",
                 mesh=None, quantize_vision: Optional[bool] = None):
        from ..core.mesh import mesh_from_config
        from .configs import VLM_CONFIGS
        self.model_id = model_id
        #: config-driven multi-device placement — the TPU-native successor of
        #: the reference's ``device_map="auto"`` knob
        #: (`/root/reference/models/base_model.py:81`): a (data, model) mesh
        #: built from the YAML ``mesh:`` block. None = single device.
        self.mesh = mesh_from_config(mesh)
        self.quantization = quantization
        self.policy: DTypePolicy = policy_for(quantization)
        self.cfg: VLMConfig = VLM_CONFIGS[self.family](size or self.default_size())
        self.batch_size = batch_size
        self.attn_impl = attn_impl
        self.recipe = recipe_for(self.family)
        if self.recipe.image_size != self.cfg.vision.image_size:
            # Reduced-size variants (e.g. "test") keep the recipe's filters
            # and normalization but target the model's actual resolution.
            import dataclasses as _dc
            self.recipe = _dc.replace(self.recipe,
                                      image_size=self.cfg.vision.image_size)
        self.tokenizer: Tokenizer = load_tokenizer(
            model_id,
            bos_id=self.cfg.decoder.bos_token_id,
            eos_id=self.cfg.decoder.eos_token_id,
            pad_id=self.cfg.decoder.pad_token_id)

        # Vision-tower quantization (``quantize_vision`` config knob /
        # ``VLM_TPU_QUANT_VISION=1`` env): quantize the encoder's Dense
        # layers to the same bits as the decoder. OFF by default — the
        # decoder dominates weights for LLaVA/PaliGemma and an fp tower is
        # strictly more accurate — but matches the reference's
        # whole-model ``load_in_8bit`` semantics and pays for BLIP-2,
        # whose EVA ViT-g is 1B params of encoder compute per image.
        self.quantize_vision = resolve_quantize_vision(quantize_vision)
        self.vision_quant_bits = (self.policy.quantized_bits
                                  if self.quantize_vision else 0)
        from ..core.mesh import MODEL_AXIS
        self.module, self.params = init_vlm(
            self.cfg, jax.random.key(seed),
            dtype=self.policy.compute_dtype,
            param_dtype=jnp.float32 if self.policy.name == "fp32"
            else jnp.bfloat16,
            attn_impl=attn_impl,
            quant_bits=self.policy.quantized_bits,
            vision_quant_bits=self.vision_quant_bits,
            model_ways=(self.mesh.shape[MODEL_AXIS]
                        if self.mesh is not None else 1))
        self._maybe_load_weights()
        if self.mesh is not None:
            from ..parallel.sharding import shard_params
            self.params = shard_params(self.params, self.mesh)
            print(f"Model params sharded over mesh "
                  f"{dict(self.mesh.shape)}")
        self._engines: Dict[Any, GenerationEngine] = {}
        print(f"Model {self.family} ({self.quantization}) ready.")

    def _data_size(self) -> int:
        """Size of the mesh's data axis (1 when single-device)."""
        from ..core.mesh import DATA_AXIS
        return self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1

    #: production default sizes, like the reference's default HF ids
    #: (llava.py:24, paligemma.py:37, blip2.py:24); tests pass size="test".
    DEFAULT_SIZE = "test"

    def default_size(self) -> str:
        return self.DEFAULT_SIZE

    def _maybe_load_weights(self):
        """Load weights when ``model_id`` is a local directory: our native
        checkpoint format (``params.msgpack``) or converted HF safetensors."""
        if not self.model_id:
            return
        from pathlib import Path
        p = Path(self.model_id)
        if not p.exists():
            # A typo'd path (or an HF hub id — this framework never
            # downloads) must not silently produce a random-weight model.
            raise FileNotFoundError(
                f"model_id {self.model_id!r} is not a local checkpoint "
                f"directory (hub ids are not supported; convert the "
                f"checkpoint locally)")
        if (p / "params.msgpack").exists():
            from ..utils.checkpoint import load_vlm_checkpoint
            self.params = load_vlm_checkpoint(p, self.params)
        else:
            from .hf_weights import load_vlm_weights
            self.params = load_vlm_weights(self.family, self.cfg, p,
                                           self.params)

    def save_checkpoint(self, path) -> None:
        """Persist the full VLM in the framework's native format; reload by
        passing ``path`` as ``model_id``."""
        from ..utils.checkpoint import save_vlm_checkpoint
        save_vlm_checkpoint(path, self.params, {
            "family": self.family,
            "quantization": self.quantization,
            "vision_layers": self.cfg.vision.layers,
            "decoder_layers": self.cfg.decoder.layers,
        })

    # ------------------------- prompts -------------------------
    def format_prompt(self, prompt: str):
        """Return (pre_text, post_text, add_bos_to_pre, add_bos_to_post):
        text around the image-token block."""
        raise NotImplementedError

    # ------------------------- generation -------------------------
    def kv_cache_dtype(self):
        """Cache dtype for the decode engines. ``VLM_TPU_KV_CACHE=int8``
        opts into the quantized cache (halves the per-step HBM cache read —
        the dominant decode stream for the MHA decoders, LLaVA/BLIP-2);
        default is the compute dtype."""
        import os
        if os.environ.get("VLM_TPU_KV_CACHE", "").lower() == "int8":
            return "int8"
        return self.policy.compute_dtype

    def _engine(self, batch: int, prompt_len: int, max_tokens: int,
                temperature: float = 0.0, top_k: int = 0,
                top_p: float = 1.0) -> GenerationEngine:
        # the cache dtype is part of the key: flipping VLM_TPU_KV_CACHE
        # mid-process must not silently reuse a stale-dtype engine
        key = (batch, prompt_len, max_tokens, str(self.kv_cache_dtype()),
               temperature, top_k, top_p)
        if key not in self._engines:
            self._engines[key] = GenerationEngine(
                self.module, self.cfg, batch_size=batch,
                max_prompt_len=prompt_len, max_new_tokens=max_tokens,
                temperature=temperature, top_k=top_k, top_p=top_p,
                cache_dtype=self.kv_cache_dtype(),
                eos_id=self.tokenizer.eos_id,
                pad_id=self.tokenizer.pad_id)
        return self._engines[key]

    def generate_batch(self, images: Sequence[Image.Image], prompt: str,
                       max_tokens: int = 100,
                       num_beams: int = 1,
                       temperature: float = 0.0,
                       top_k: int = 0,
                       top_p: float = 1.0,
                       seed: int = 0) -> List[str]:
        """Batched generate: one prefill + one decode loop for the batch.
        ``num_beams > 1`` runs beam search with HF ``generate`` semantics
        (token-parity tested in tests/test_hf_parity.py);
        ``temperature > 0`` samples (optionally top-k / nucleus filtered)
        with a key derived from ``seed`` — the config-surface equivalent of
        the reference's ``model.generate`` kwargs
        (`/root/reference/models/base_model.py:68-69`)."""
        from ..core.mesh import maybe_mesh, pad_to_multiple
        n = len(images)
        images = list(images)
        # Under a mesh the compiled batch must divide over the data axis:
        # pad with a repeat of the last image and drop the extras at the end.
        b = pad_to_multiple(n, self._data_size())
        if b > n:
            images = images + [images[-1]] * (b - n)
        batch = host_batch(images, self.recipe)
        pixels = normalize_images(jnp.asarray(batch), recipe=self.recipe,
                                  compute_dtype=self.policy.compute_dtype)
        pre_t, post_t, bos_pre, bos_post = self.format_prompt(prompt)
        pre_ids, post_ids, prompt_len = build_prompt_ids(
            self.tokenizer, pre_t, post_t, num_image_tokens(self.cfg), b,
            add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
        if self.mesh is not None:
            from ..parallel.sharding import shard_batch
            pixels, pre_ids, post_ids, prompt_len = shard_batch(
                (pixels, pre_ids, post_ids, prompt_len), self.mesh)
        if num_beams > 1:
            if temperature > 0:
                raise ValueError("beam search is deterministic; "
                                 "temperature>0 with num_beams>1 is not "
                                 "supported (HF raises the same way)")
            from ..generate.beam import BeamSearchEngine
            key = ("beam", b, int(prompt_len[0]), max_tokens, num_beams,
                   str(self.kv_cache_dtype()))
            if key not in self._engines:
                self._engines[key] = BeamSearchEngine(
                    self.module, self.cfg, batch_size=b,
                    max_prompt_len=int(prompt_len[0]), num_beams=num_beams,
                    max_new_tokens=max_tokens,
                    cache_dtype=self.kv_cache_dtype(),
                    eos_id=self.tokenizer.eos_id,
                    pad_id=self.tokenizer.pad_id)
            with maybe_mesh(self.mesh):
                result = self._engines[key].generate(
                    self.params, pixels, pre_ids, post_ids, prompt_len)
        else:
            engine = self._engine(b, int(prompt_len[0]), max_tokens,
                                  temperature, top_k, top_p)
            with maybe_mesh(self.mesh):
                result = engine.generate(
                    self.params, pixels, pre_ids, post_ids, prompt_len,
                    rng=jax.random.key(seed) if temperature > 0 else None)
        toks = np.asarray(result.tokens)
        lens = np.asarray(result.lengths)
        out = []
        for i in range(n):
            ids = toks[i, :lens[i]]
            ids = [int(t) for t in ids if int(t) != self.tokenizer.eos_id]
            out.append(self.tokenizer.decode(ids).strip())
        return out

    def generate_text(self, image: Image.Image, prompt: str,
                      max_tokens: int = 100) -> str:
        """Single-image API parity with the reference
        (`models/base_model.py:54-74`). Prefer :meth:`generate_batch`."""
        return self.generate_batch([image], prompt, max_tokens)[0]

    def generate_dataset(self, image_paths: Sequence, prompt: str,
                         max_tokens: int = 100,
                         batch_size: Optional[int] = None,
                         progress=None,
                         num_beams: int = 1,
                         temperature: float = 0.0,
                         top_k: int = 0,
                         top_p: float = 1.0,
                         seed: int = 0) -> List[str]:
        """Dataset-scale generation via continuous batching: slots refill the
        moment a sequence finishes, host image decode interleaves with device
        decode steps. Returns decoded texts in input order.

        Sampling knobs mirror :meth:`generate_batch`. ``num_beams > 1``
        falls back to wave-batched beam search (beam hypotheses share a
        per-wave cache; slot-level admission doesn't apply)."""
        from ..core.mesh import maybe_mesh, pad_to_multiple
        from ..generate.batcher import ContinuousBatcher

        bs = pad_to_multiple(batch_size or self.batch_size,
                             self._data_size())
        if num_beams > 1:
            paths = list(image_paths)
            out: List[Optional[str]] = [None] * len(paths)
            try:
                for start in range(0, len(paths), bs):
                    chunk = paths[start:start + bs]
                    images = [Image.open(p).convert("RGB") for p in chunk]
                    k = len(images)
                    if k < bs:   # pad so every wave reuses one beam engine
                        images = images + [images[-1]] * (bs - k)
                    texts = self.generate_batch(
                        images, prompt, max_tokens=max_tokens,
                        num_beams=num_beams, temperature=temperature,
                        top_k=top_k, top_p=top_p, seed=seed)[:k]
                    out[start:start + k] = texts
                    if progress is not None:
                        progress(k)
            except KeyboardInterrupt:
                print("\n[generate_dataset] interrupted — returning "
                      "completed results")
            return out
        pre_t, post_t, bos_pre, bos_post = self.format_prompt(prompt)
        pre_ids, post_ids, prompt_len = build_prompt_ids(
            self.tokenizer, pre_t, post_t, num_image_tokens(self.cfg), 1,
            add_bos_to_pre=bos_pre, add_bos_to_post=bos_post)
        paths = list(image_paths)

        def pixel_fn(idxs):
            from ..data.native_loader import load_batch
            batch = load_batch([paths[i] for i in idxs], self.recipe)
            return normalize_images(jnp.asarray(batch), recipe=self.recipe,
                                    compute_dtype=self.policy.compute_dtype)

        batcher = ContinuousBatcher(
            self.module, self.cfg, batch_size=bs,
            max_prompt_len=int(prompt_len[0]), max_new_tokens=max_tokens,
            cache_dtype=self.kv_cache_dtype(),
            eos_id=self.tokenizer.eos_id, pad_id=self.tokenizer.pad_id,
            temperature=temperature, top_k=top_k, top_p=top_p,
            rng=jax.random.key(seed) if temperature > 0 else None,
            mesh=self.mesh)
        with maybe_mesh(self.mesh):
            token_lists = batcher.run(
                self.params, pixel_fn,
                pre_ids_row=np.asarray(pre_ids[0]),
                post_ids_row=np.asarray(post_ids[0]),
                prompt_len_scalar=int(prompt_len[0]),
                n_images=len(paths), progress=progress)
        import os
        import sys as _sys
        if os.environ.get("VLM_TPU_BATCHER_STATS", "0") == "1":
            print(f"[batcher stats] {batcher.last_stats}", file=_sys.stderr)
        # Entries left None (KeyboardInterrupt) stay None so callers can
        # evaluate partial results like the reference.
        return [self.tokenizer.decode(t).strip() if t is not None else None
                for t in token_lists]

    # ------------------------- probing -------------------------
    def get_vision_backbone(self, cleanup: bool = True) -> VisionBackbone:
        """Extract the vision tower for probing. ``cleanup=True`` drops the
        decoder/projector params so device memory is released
        (reference: llava.py:63-83)."""
        vision_params = {"params": self.params["params"]["vision"]}
        backbone = VisionBackbone(self.cfg, vision_params, self.policy,
                                  attn_impl=self.attn_impl,
                                  batch_size=self.batch_size,
                                  mesh=self.mesh,
                                  quant_bits=self.vision_quant_bits)
        if cleanup:
            self.params = None
            self.module = None
            self._engines.clear()
            import gc
            gc.collect()
        return backbone


class LLaVAModel(VLMModel):
    """LLaVA-1.5: CLIP-L/336 + MLP projector + Vicuna-7B.
    Prompt format: ``USER: <image>\\n{prompt} ASSISTANT:``
    (reference: llava.py:49-61 via the HF chat template)."""
    family = "llava"
    DEFAULT_SIZE = "7b"

    def format_prompt(self, prompt: str):
        return "USER: ", f"\n{prompt} ASSISTANT:", True, False


class PaLIGemmaModel(VLMModel):
    """PaliGemma-3B-mix-224. Image tokens first, then BOS + prompt + newline
    (reference: paligemma.py:62 prepends ``<image>``; the HF processor puts
    image tokens before the BOS+text)."""
    family = "paligemma"
    DEFAULT_SIZE = "3b"

    def format_prompt(self, prompt: str):
        return "", f"{prompt}\n", False, True


class BLIP2OptModel(VLMModel):
    """BLIP-2 OPT-6.7B: 32 Q-Former tokens then
    ``Question: {prompt}. Answer:`` (reference: blip2.py:48)."""
    family = "blip2"
    DEFAULT_SIZE = "6.7b"

    def format_prompt(self, prompt: str):
        return "", f"Question: {prompt}. Answer:", False, True
