"""HF safetensors → vlm_tpu pytree weight conversion.

The reference pulls weights from the HF hub at runtime
(`/root/reference/models/base_model.py:31-35`); this framework loads from a
*local* checkpoint directory (zero-egress) and converts the public HF layouts
into our param trees. Fused projections are split (EVA's qkv), torch
``[out, in]`` linear kernels are transposed to ``[in, out]``, and conv patch
embeddings go OIHW → HWIO.

Only invoked when a local path is supplied; everything else in the framework
runs with random-initialized weights (tests, benches, dry-runs).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _load_safetensors(path: Path) -> Dict[str, np.ndarray]:
    """Load all ``*.safetensors`` shards under ``path`` into one dict."""
    from safetensors import safe_open
    tensors: Dict[str, np.ndarray] = {}
    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    for f in files:
        with safe_open(str(f), framework="numpy") as st:
            for key in st.keys():
                tensors[key] = st.get_tensor(key)
    return _normalize_hf_keys(tensors)


#: transformers ≥4.52 re-rooted composite VLMs: ``language_model.model.*`` →
#: ``model.language_model.*`` with a top-level ``lm_head``. Canonical hub
#: checkpoints (llava-1.5, paligemma mixes) still use the legacy layout; we
#: accept both by rewriting new-style keys back to the legacy names the
#: converters below address.
_NEW_STYLE_RENAMES = (
    ("model.vision_tower.", "vision_tower."),
    ("model.multi_modal_projector.", "multi_modal_projector."),
    ("model.language_model.", "language_model.model."),
)


def _normalize_hf_keys(tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if not any(k.startswith("model.") for k in tensors):
        return tensors
    out: Dict[str, np.ndarray] = {}
    for k, v in tensors.items():
        if k == "lm_head.weight":
            out["language_model.lm_head.weight"] = v
            continue
        for new, old in _NEW_STYLE_RENAMES:
            if k.startswith(new):
                k = old + k[len(new):]
                break
        out[k] = v
    return out


class _Filled:
    """Dry-run sentinel: marks a param leaf as written by the converter.

    `validate_vlm_conversion` runs the converters over a tree of
    ``jax.ShapeDtypeStruct`` leaves (from ``jax.eval_shape`` of the
    production-size init); `_set` stores this marker instead of
    materializing arrays, so full 7B-shape conversions validate in
    milliseconds of memory. Any leaf still a ShapeDtypeStruct afterwards
    was never touched by the key mapping.
    """
    __slots__ = ("shape", "dtype")

    def __init__(self, shape, dtype):
        self.shape, self.dtype = tuple(shape), dtype


class _TrackingDict(dict):
    """Records which checkpoint keys the converters actually read."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)


def _t(x):  # torch linear [out, in] -> flax kernel [in, out]
    return np.ascontiguousarray(x.T)


def _conv(x):  # torch conv OIHW -> flax HWIO
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


def _set(tree: Dict, path: str, value, expect_shape=True):
    import flax.linen as nn

    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]

    if keys[-1] == "kernel" and "kernel" not in node and "q_kernel" in node:
        # Quantized Dense (8bit/4bit modes): quantize the fp checkpoint
        # kernel into the layer's (q_kernel, scale) params.
        _set_quantized(node, path, value)
        return

    old = node[keys[-1]]
    boxed = isinstance(old, nn.Partitioned)
    old_arr = old.unbox() if boxed else old
    if expect_shape and tuple(old_arr.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {path}: ours {tuple(old_arr.shape)} "
            f"vs checkpoint {tuple(value.shape)}")
    if isinstance(old_arr, jax.ShapeDtypeStruct):
        # Dry-run validation over an eval_shape tree: record the fill
        # without materializing a production-size array.
        new = _Filled(value.shape, old_arr.dtype)
    else:
        new = jnp.asarray(value, dtype=old_arr.dtype)
    node[keys[-1]] = old.replace_boxed(new) if boxed else new


def _set_quantized(node: Dict, path: str, value):
    """Write an fp [in, out] kernel into a quantized Dense's
    (q_kernel, scale); the scheme (int8 vs grouped int4) is recovered from
    the existing param shapes."""
    import flax.linen as nn

    from ..ops.quant import quantize_int4, quantize_int8

    def unboxed(x):
        return x.unbox() if isinstance(x, nn.Partitioned) else x

    q_old = unboxed(node["q_kernel"])
    s_old = unboxed(node["scale"])
    in_dim, out_dim = value.shape
    if isinstance(q_old, jax.ShapeDtypeStruct):
        # Dry-run: derive the quantized shapes analytically (int8: q [in,
        # out] / scale [1, out]; int4: pair-packed q [in/2, out] / grouped
        # scale [in/group, out]) and check them against the eval_shape tree.
        if q_old.shape[0] == in_dim:
            q_shape, s_shape = (in_dim, out_dim), (1, out_dim)
        else:
            q_shape = (in_dim // 2, out_dim)
            s_shape = (s_old.shape[0], out_dim)
            if in_dim % s_old.shape[0]:
                raise ValueError(
                    f"int4 group mismatch at {path}: in={in_dim} not "
                    f"divisible by groups={s_old.shape[0]}")
        if q_shape != tuple(q_old.shape) or s_shape != tuple(s_old.shape):
            raise ValueError(
                f"quantized shape mismatch at {path}: "
                f"q {q_shape} vs {tuple(q_old.shape)}, "
                f"scale {s_shape} vs {tuple(s_old.shape)}")

        def rebox(old, new):
            return old.replace_boxed(new) if isinstance(old, nn.Partitioned) \
                else new

        node["q_kernel"] = rebox(node["q_kernel"],
                                 _Filled(q_shape, q_old.dtype))
        node["scale"] = rebox(node["scale"], _Filled(s_shape, s_old.dtype))
        return

    if q_old.shape[0] == in_dim:            # int8: q [in, out], scale [1, out]
        qw = quantize_int8(jnp.asarray(value, jnp.float32))
    else:                                   # int4: q [in/2, out], grouped scale
        group = in_dim // s_old.shape[0]
        qw = quantize_int4(jnp.asarray(value, jnp.float32), group_size=group)
    if tuple(qw.q.shape) != tuple(q_old.shape) or \
            tuple(qw.scale.shape) != tuple(s_old.shape):
        raise ValueError(
            f"quantized shape mismatch at {path}: "
            f"q {tuple(qw.q.shape)} vs {tuple(q_old.shape)}, "
            f"scale {tuple(qw.scale.shape)} vs {tuple(s_old.shape)}")

    def rebox(old, new):
        return old.replace_boxed(new) if isinstance(old, nn.Partitioned) \
            else new

    node["q_kernel"] = rebox(node["q_kernel"], qw.q)
    node["scale"] = rebox(node["scale"],
                          jnp.asarray(qw.scale, s_old.dtype))


def convert_clip_vision(hf: Dict[str, np.ndarray], vision_tree: Dict,
                        layers: int, prefix: str = "vision_tower.vision_model"):
    """CLIP/SigLIP-style HF vision tower → our ViTEncoder tree.

    HF names (CLIPVisionModel):
      {prefix}.embeddings.patch_embedding.weight       (conv)
      {prefix}.embeddings.class_embedding
      {prefix}.embeddings.position_embedding.weight
      {prefix}.pre_layrnorm.{weight,bias}              (CLIP only; note typo)
      {prefix}.encoder.layers.{i}.self_attn.{q,k,v,out}_proj.{weight,bias}
      {prefix}.encoder.layers.{i}.layer_norm{1,2}.{weight,bias}
      {prefix}.encoder.layers.{i}.mlp.fc{1,2}.{weight,bias}
      {prefix}.post_layernorm.{weight,bias}
    """
    p = prefix
    g = hf.__getitem__
    _set(vision_tree, "patch_embed/kernel",
         _conv(g(f"{p}.embeddings.patch_embedding.weight")))
    if f"{p}.embeddings.patch_embedding.bias" in hf:
        _set(vision_tree, "patch_embed/bias",
             g(f"{p}.embeddings.patch_embedding.bias"))
    if f"{p}.embeddings.class_embedding" in hf:
        _set(vision_tree, "cls_token",
             g(f"{p}.embeddings.class_embedding").reshape(1, 1, -1))
    _set(vision_tree, "pos_embed",
         g(f"{p}.embeddings.position_embedding.weight")[None])
    if f"{p}.pre_layrnorm.weight" in hf:      # CLIP's in-tree typo
        _set(vision_tree, "pre_ln/scale", g(f"{p}.pre_layrnorm.weight"))
        _set(vision_tree, "pre_ln/bias", g(f"{p}.pre_layrnorm.bias"))
    for i in range(layers):
        lp = f"{p}.encoder.layers.{i}"
        bt = f"block_{i}"
        for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("out_proj", "out_proj")):
            _set(vision_tree, f"{bt}/attn/{ours}/kernel",
                 _t(g(f"{lp}.self_attn.{theirs}.weight")))
            bias_key = f"{lp}.self_attn.{theirs}.bias"
            if bias_key in hf:
                _set(vision_tree, f"{bt}/attn/{ours}/bias", g(bias_key))
        _set(vision_tree, f"{bt}/ln1/scale", g(f"{lp}.layer_norm1.weight"))
        _set(vision_tree, f"{bt}/ln1/bias", g(f"{lp}.layer_norm1.bias"))
        _set(vision_tree, f"{bt}/ln2/scale", g(f"{lp}.layer_norm2.weight"))
        _set(vision_tree, f"{bt}/ln2/bias", g(f"{lp}.layer_norm2.bias"))
        _set(vision_tree, f"{bt}/fc1/kernel", _t(g(f"{lp}.mlp.fc1.weight")))
        _set(vision_tree, f"{bt}/fc1/bias", g(f"{lp}.mlp.fc1.bias"))
        _set(vision_tree, f"{bt}/fc2/kernel", _t(g(f"{lp}.mlp.fc2.weight")))
        _set(vision_tree, f"{bt}/fc2/bias", g(f"{lp}.mlp.fc2.bias"))
    _set(vision_tree, "post_ln/scale", g(f"{p}.post_layernorm.weight"))
    _set(vision_tree, "post_ln/bias", g(f"{p}.post_layernorm.bias"))


def convert_blip2_vision(hf: Dict[str, np.ndarray], vision_tree: Dict,
                         layers: int, prefix: str = "vision_model"):
    """BLIP-2 EVA ViT-g tower: fused qkv (q/v biased, k unbiased), split into
    our separate projections."""
    g = hf.__getitem__
    p = prefix
    _set(vision_tree, "patch_embed/kernel",
         _conv(g(f"{p}.embeddings.patch_embedding.weight")))
    if f"{p}.embeddings.patch_embedding.bias" in hf:
        _set(vision_tree, "patch_embed/bias",
             g(f"{p}.embeddings.patch_embedding.bias"))
    _set(vision_tree, "cls_token",
         g(f"{p}.embeddings.class_embedding").reshape(1, 1, -1))
    _set(vision_tree, "pos_embed",
         g(f"{p}.embeddings.position_embedding").reshape(
             1, -1, vision_tree["pos_embed"].shape[-1]))
    for i in range(layers):
        lp = f"{p}.encoder.layers.{i}"
        bt = f"block_{i}"
        qkv_w = g(f"{lp}.self_attn.qkv.weight")          # [3H, H]
        h = qkv_w.shape[1]
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        _set(vision_tree, f"{bt}/attn/q_proj/kernel", _t(qw))
        _set(vision_tree, f"{bt}/attn/k_proj/kernel", _t(kw))
        _set(vision_tree, f"{bt}/attn/v_proj/kernel", _t(vw))
        if f"{lp}.self_attn.qkv.bias" in hf:
            qb, kb, vb = np.split(g(f"{lp}.self_attn.qkv.bias"), 3)
            _set(vision_tree, f"{bt}/attn/q_proj/bias", qb)
            _set(vision_tree, f"{bt}/attn/v_proj/bias", vb)
        _set(vision_tree, f"{bt}/attn/out_proj/kernel",
             _t(g(f"{lp}.self_attn.projection.weight")))
        _set(vision_tree, f"{bt}/attn/out_proj/bias",
             g(f"{lp}.self_attn.projection.bias"))
        _set(vision_tree, f"{bt}/ln1/scale", g(f"{lp}.layer_norm1.weight"))
        _set(vision_tree, f"{bt}/ln1/bias", g(f"{lp}.layer_norm1.bias"))
        _set(vision_tree, f"{bt}/ln2/scale", g(f"{lp}.layer_norm2.weight"))
        _set(vision_tree, f"{bt}/ln2/bias", g(f"{lp}.layer_norm2.bias"))
        _set(vision_tree, f"{bt}/fc1/kernel", _t(g(f"{lp}.mlp.fc1.weight")))
        _set(vision_tree, f"{bt}/fc1/bias", g(f"{lp}.mlp.fc1.bias"))
        _set(vision_tree, f"{bt}/fc2/kernel", _t(g(f"{lp}.mlp.fc2.weight")))
        _set(vision_tree, f"{bt}/fc2/bias", g(f"{lp}.mlp.fc2.bias"))
    _set(vision_tree, "post_ln/scale", g(f"{p}.post_layernorm.weight"))
    _set(vision_tree, "post_ln/bias", g(f"{p}.post_layernorm.bias"))


def convert_llama_decoder(hf: Dict[str, np.ndarray], dec_tree: Dict,
                          layers: int, prefix: str = "language_model.model"):
    g = hf.__getitem__
    p = prefix
    _set(dec_tree, "embed/embedding", g(f"{p}.embed_tokens.weight"))
    for i in range(layers):
        lp = f"{p}.layers.{i}"
        bt = f"block_{i}"
        for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("o_proj", "o_proj")):
            _set(dec_tree, f"{bt}/attn/{ours}/kernel",
                 _t(g(f"{lp}.self_attn.{theirs}.weight")))
        _set(dec_tree, f"{bt}/input_norm/scale",
             g(f"{lp}.input_layernorm.weight"))
        _set(dec_tree, f"{bt}/post_attn_norm/scale",
             g(f"{lp}.post_attention_layernorm.weight"))
        _set(dec_tree, f"{bt}/mlp/gate_proj/kernel",
             _t(g(f"{lp}.mlp.gate_proj.weight")))
        _set(dec_tree, f"{bt}/mlp/up_proj/kernel",
             _t(g(f"{lp}.mlp.up_proj.weight")))
        _set(dec_tree, f"{bt}/mlp/down_proj/kernel",
             _t(g(f"{lp}.mlp.down_proj.weight")))
    _set(dec_tree, "final_norm/scale", g(f"{p}.norm.weight"))
    lm_key = prefix.replace(".model", "") + ".lm_head.weight"
    if lm_key in hf and "lm_head" in dec_tree:
        _set(dec_tree, "lm_head/kernel", _t(g(lm_key)))


def convert_opt_decoder(hf: Dict[str, np.ndarray], dec_tree: Dict,
                        layers: int,
                        prefix: str = "language_model.model.decoder"):
    """OPT decoder: biased projections, per-layer self_attn_layer_norm /
    final_layer_norm → our input_norm / post_attn_norm, plain fc1/down FFN,
    learned positions with the +2 offset baked into embed_positions."""
    g = hf.__getitem__
    p = prefix
    _set(dec_tree, "embed/embedding", g(f"{p}.embed_tokens.weight"))
    _set(dec_tree, "pos_embed/embedding", g(f"{p}.embed_positions.weight"))
    for i in range(layers):
        lp = f"{p}.layers.{i}"
        bt = f"block_{i}"
        for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                             ("v_proj", "v_proj"), ("o_proj", "out_proj")):
            _set(dec_tree, f"{bt}/attn/{ours}/kernel",
                 _t(g(f"{lp}.self_attn.{theirs}.weight")))
            _set(dec_tree, f"{bt}/attn/{ours}/bias",
                 g(f"{lp}.self_attn.{theirs}.bias"))
        _set(dec_tree, f"{bt}/input_norm/scale",
             g(f"{lp}.self_attn_layer_norm.weight"))
        _set(dec_tree, f"{bt}/input_norm/bias",
             g(f"{lp}.self_attn_layer_norm.bias"))
        _set(dec_tree, f"{bt}/post_attn_norm/scale",
             g(f"{lp}.final_layer_norm.weight"))
        _set(dec_tree, f"{bt}/post_attn_norm/bias",
             g(f"{lp}.final_layer_norm.bias"))
        _set(dec_tree, f"{bt}/mlp/fc1/kernel", _t(g(f"{lp}.fc1.weight")))
        _set(dec_tree, f"{bt}/mlp/fc1/bias", g(f"{lp}.fc1.bias"))
        _set(dec_tree, f"{bt}/mlp/down_proj/kernel",
             _t(g(f"{lp}.fc2.weight")))
        _set(dec_tree, f"{bt}/mlp/down_proj/bias", g(f"{lp}.fc2.bias"))
    _set(dec_tree, "final_norm/scale", g(f"{p}.final_layer_norm.weight"))
    _set(dec_tree, "final_norm/bias", g(f"{p}.final_layer_norm.bias"))


def convert_qformer(hf: Dict[str, np.ndarray], proj_tree: Dict,
                    layers: int, cross_freq: int,
                    prefix: str = "qformer"):
    """BLIP-2 Q-Former → our projector tree (query tokens, BERT-style
    self/cross attention per layer, query FFN, language projection)."""
    g = hf.__getitem__
    p = prefix
    _set(proj_tree, "query_tokens", g("query_tokens"))
    _set(proj_tree, "input_ln/scale", g(f"{p}.layernorm.weight"))
    _set(proj_tree, "input_ln/bias", g(f"{p}.layernorm.bias"))
    for i in range(layers):
        lp = f"{p}.encoder.layer.{i}"

        def attn(block_name, hf_attn):
            for ours, theirs in (("q", "query"), ("k", "key"),
                                 ("v", "value")):
                _set(proj_tree, f"{block_name}/{ours}/kernel",
                     _t(g(f"{hf_attn}.attention.{theirs}.weight")))
                _set(proj_tree, f"{block_name}/{ours}/bias",
                     g(f"{hf_attn}.attention.{theirs}.bias"))
            _set(proj_tree, f"{block_name}/out/kernel",
                 _t(g(f"{hf_attn}.output.dense.weight")))
            _set(proj_tree, f"{block_name}/out/bias",
                 g(f"{hf_attn}.output.dense.bias"))
            _set(proj_tree, f"{block_name}/ln/scale",
                 g(f"{hf_attn}.output.LayerNorm.weight"))
            _set(proj_tree, f"{block_name}/ln/bias",
                 g(f"{hf_attn}.output.LayerNorm.bias"))

        attn(f"self_attn_{i}", f"{lp}.attention")
        if i % cross_freq == 0:
            attn(f"cross_attn_{i}", f"{lp}.crossattention")
        _set(proj_tree, f"ffn_up_{i}/kernel",
             _t(g(f"{lp}.intermediate_query.dense.weight")))
        _set(proj_tree, f"ffn_up_{i}/bias",
             g(f"{lp}.intermediate_query.dense.bias"))
        _set(proj_tree, f"ffn_down_{i}/kernel",
             _t(g(f"{lp}.output_query.dense.weight")))
        _set(proj_tree, f"ffn_down_{i}/bias",
             g(f"{lp}.output_query.dense.bias"))
        _set(proj_tree, f"ffn_ln_{i}/scale",
             g(f"{lp}.output_query.LayerNorm.weight"))
        _set(proj_tree, f"ffn_ln_{i}/bias",
             g(f"{lp}.output_query.LayerNorm.bias"))
    _set(proj_tree, "language_projection/kernel",
         _t(g("language_projection.weight")))
    _set(proj_tree, "language_projection/bias",
         g("language_projection.bias"))


def _convert_family(family: str, cfg, hf: Dict[str, np.ndarray], tree: Dict):
    """Run the family's converters over ``tree["params"]``-style subtrees
    (mutates ``tree`` in place). Shared by :func:`load_vlm_weights` (real
    arrays) and :func:`validate_vlm_conversion` (ShapeDtypeStruct dry run).
    """
    v = cfg.vision
    if family == "llava":
        convert_clip_vision(hf, tree["vision"], v.layers,
                            prefix="vision_tower.vision_model")
        _set(tree["projector"], "fc1/kernel",
             _t(hf["multi_modal_projector.linear_1.weight"]))
        _set(tree["projector"], "fc1/bias",
             hf["multi_modal_projector.linear_1.bias"])
        _set(tree["projector"], "fc2/kernel",
             _t(hf["multi_modal_projector.linear_2.weight"]))
        _set(tree["projector"], "fc2/bias",
             hf["multi_modal_projector.linear_2.bias"])
        convert_llama_decoder(hf, tree["decoder"], cfg.decoder.layers,
                              prefix="language_model.model")
    elif family == "paligemma":
        convert_clip_vision(hf, tree["vision"], v.layers,
                            prefix="vision_tower.vision_model")
        _set(tree["projector"], "proj/kernel",
             _t(hf["multi_modal_projector.linear.weight"]))
        _set(tree["projector"], "proj/bias",
             hf["multi_modal_projector.linear.bias"])
        convert_llama_decoder(hf, tree["decoder"], cfg.decoder.layers,
                              prefix="language_model.model")
    elif family == "blip2":
        convert_blip2_vision(hf, tree["vision"], v.layers,
                             prefix="vision_model")
        convert_qformer(hf, tree["projector"], cfg.qformer.layers,
                        cfg.qformer.cross_attention_frequency)
        convert_opt_decoder(hf, tree["decoder"], cfg.decoder.layers)
    else:
        raise ValueError(f"unknown family {family}")


def load_vlm_weights(family: str, cfg, path: Path, params: Dict) -> Dict:
    """Convert a local HF checkpoint directory into our param tree.

    Currently wired: LLaVA (CLIP tower + LLaMA decoder + MLP projector),
    BLIP-2 vision tower, PaliGemma (SigLIP tower + Gemma via the LLaMA-style
    names). Raises with a clear message for unmapped tensors rather than
    silently keeping random init.
    """
    hf = _load_safetensors(Path(path))
    params = jax.tree.map(np.asarray, params)  # mutable host copy
    _convert_family(family, cfg, hf, params["params"])
    return jax.tree.map(jnp.asarray, params)


#: Checkpoint keys that legitimately go unconsumed by the converters:
#: non-persistent index buffers some transformers versions serialized, rope
#: frequency tables (recomputed from config), and tied lm_head duplicates
#: (torch ``.bin``-era saves kept the shared tensor; our tied decoders read
#: the embedding instead — see Decoder.setup / cfg.tie_embeddings).
_IGNORABLE_UNCONSUMED = (
    ".position_ids",
    ".rotary_emb.inv_freq",
    "language_model.lm_head.weight",
)


def validate_vlm_conversion(family: str, cfg, manifest: Dict[str, Dict],
                            dtype=jnp.bfloat16, param_dtype=jnp.float32,
                            quant_bits: int = 0) -> Dict[str, list]:
    """Prove the key mapping consumes a real checkpoint's full key set and
    fills every param leaf — at *production* shapes, without weights.

    ``manifest`` maps checkpoint tensor names to ``{"shape": [...],
    "dtype": "float16"}`` (vendored from the hub layouts; see
    ``scripts/gen_hf_manifests.py``). The source tensors are zero-strided
    ``np.broadcast_to`` views and the target tree comes from
    ``jax.eval_shape`` of the full-size init, so a 7B validation allocates
    ~nothing. Returns ``{"unconsumed": [...], "unfilled": [...]}`` —
    both empty for a correct mapping. Tied-weight duplicates and legacy
    buffer keys (``*.position_ids``, rope ``inv_freq``) are ignorable;
    anything else unconsumed is a mapping gap.

    Reference: the checkpoints this validates are the reference's defaults
    (`/root/reference/models/llava.py:24`, `paligemma.py:37`, `blip2.py:24`).
    """
    from .vlm import VLMModule

    src = {}
    for key, meta in manifest.items():
        dt = np.dtype(str(meta["dtype"]))
        src[key] = np.broadcast_to(np.zeros((), dt), tuple(meta["shape"]))
    hf = _TrackingDict(_normalize_hf_keys(src))

    module = VLMModule(cfg, dtype=dtype, param_dtype=param_dtype,
                       quant_bits=quant_bits)
    px = jax.ShapeDtypeStruct(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3), dtype)
    ids = jax.ShapeDtypeStruct((1, 2), jnp.int32)
    shapes = jax.eval_shape(module.init, jax.random.key(0), px, ids, ids)

    # eval_shape may return an immutable FrozenDict-like tree; deep-copy
    # into plain mutable dicts for in-place _set.
    import flax

    def to_mutable(node):
        if isinstance(node, (dict,)) or hasattr(node, "items") and \
                not hasattr(node, "unbox"):
            return {k: to_mutable(v) for k, v in node.items()}
        return node

    tree = to_mutable(flax.core.unfreeze(shapes))
    _convert_family(family, cfg, hf, tree["params"])

    unconsumed = sorted(
        k for k in hf
        if k not in hf.consumed
        and not any(k.endswith(s) or k == s for s in _IGNORABLE_UNCONSUMED))

    unfilled = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}")
            return
        leaf = node.unbox() if hasattr(node, "unbox") else node
        if not isinstance(leaf, _Filled):
            unfilled.append(path)

    walk(tree["params"], "params")
    return {"unconsumed": unconsumed, "unfilled": sorted(unfilled)}
