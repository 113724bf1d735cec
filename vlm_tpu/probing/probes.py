"""Probes: a frozen/partially-frozen vision backbone + classification head(s).

Functional mirror of `/root/reference/probing/models/linear_probe.py` and
``multitask_probe.py``:

- :class:`LinearProbe`: one head → ``forward(images) → logits [B, C]``;
- :class:`MultiTaskProbe`: one head per task over the shared [B, D] embedding
  → ``forward(images) → {"logits": {task: [B, C]}}``;
- ``predict`` = argmax;
- ``extract_features`` runs the backbone without gradient tracking when it is
  fully frozen (in JAX this is simply ``lax.stop_gradient`` — the analogue of
  the reference's eval()+no_grad switch, base_probe.py:53-67).

State layout: ``probe.variables = {"params": {...}, "batch_stats": {...}}``
for the head(s) only; backbone params live in ``probe.backbone.params`` with
``trainable_mask`` controlling which leaves receive optimizer updates.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.backbone import VisionBackbone
from .heads import make_head


class BaseProbe:
    def __init__(self, backbone: VisionBackbone, freeze_backbone: bool = True):
        self.backbone = backbone
        self.backbone.set_freeze(freeze_backbone)

    @property
    def fully_frozen(self) -> bool:
        return self.backbone.fully_frozen

    def unfreeze_last_backbone_k_layers(self, k: int, parts: str = "all",
                                        include_embeddings: bool = True):
        self.backbone.unfreeze_last_k_layers(
            k=k, parts=parts, include_embeddings=include_embeddings)

    def set_freeze_backbone(self, freeze: bool):
        self.backbone.set_freeze(freeze)

    def extract_features(self, images) -> jax.Array:
        feats = self.backbone.forward(images)
        if self.fully_frozen:
            feats = jax.lax.stop_gradient(feats)
        return feats

    # -- differentiable path used inside jitted train steps --
    def features_fn(self, backbone_params, pixels) -> jax.Array:
        feats = self.backbone._features(
            backbone_params, pixels, self.backbone.cfg.backbone_pooling)
        return feats


class LinearProbe(BaseProbe):
    """Single-task probe (reference: linear_probe.py:7-49)."""

    def __init__(self, backbone: VisionBackbone, n_out_classes: int,
                 freeze_backbone: bool = True, dropout_p: float = 0.3,
                 deeper_head: bool = False, hidden_dim: int = 512,
                 rng: Optional[jax.Array] = None):
        super().__init__(backbone, freeze_backbone)
        self.n_out_classes = n_out_classes
        self.classifier = make_head(n_out_classes, dropout_p=dropout_p,
                                    deeper=deeper_head, hidden_dim=hidden_dim)
        rng = rng if rng is not None else jax.random.key(0)
        dummy = jnp.zeros((2, backbone.output_dim), jnp.float32)
        self.head_state = self.classifier.init(rng, dummy, train=False)

    def apply_head(self, head_state, feats, train: bool = False,
                   dropout_rng: Optional[jax.Array] = None):
        """Returns (logits, new_batch_stats|None)."""
        if train:
            logits, mut = self.classifier.apply(
                head_state, feats, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng or jax.random.key(0)})
            return logits, mut["batch_stats"]
        return self.classifier.apply(head_state, feats, train=False), None

    def forward(self, images) -> jax.Array:
        feats = self.extract_features(images)
        logits, _ = self.apply_head(self.head_state, feats, train=False)
        return logits

    __call__ = forward

    def predict(self, images) -> jax.Array:
        return jnp.argmax(self.forward(images), axis=-1)


class MultiTaskProbe(BaseProbe):
    """Shared backbone, one head per task (reference: multitask_probe.py:7-49)."""

    def __init__(self, backbone: VisionBackbone, tasks: Dict[str, int],
                 freeze_backbone: bool = True, dropout_p: float = 0.3,
                 deeper_heads: bool = False, hidden_dim: int = 512,
                 rng: Optional[jax.Array] = None):
        super().__init__(backbone, freeze_backbone)
        self.tasks = dict(tasks)
        self.classifiers = {
            t: make_head(n, dropout_p=dropout_p, deeper=deeper_heads,
                         hidden_dim=hidden_dim)
            for t, n in self.tasks.items()}
        rng = rng if rng is not None else jax.random.key(0)
        dummy = jnp.zeros((2, backbone.output_dim), jnp.float32)
        self.head_state = {
            t: mod.init(jax.random.fold_in(rng, i), dummy, train=False)
            for i, (t, mod) in enumerate(self.classifiers.items())}

    def apply_heads(self, head_state, feats, train: bool = False,
                    dropout_rng: Optional[jax.Array] = None):
        logits = {}
        new_stats = {}
        for i, (t, mod) in enumerate(self.classifiers.items()):
            if train:
                rng_t = jax.random.fold_in(
                    dropout_rng or jax.random.key(0), i)
                out, mut = mod.apply(head_state[t], feats, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": rng_t})
                logits[t] = out
                new_stats[t] = mut["batch_stats"]
            else:
                logits[t] = mod.apply(head_state[t], feats, train=False)
        return logits, (new_stats if train else None)

    def forward(self, images) -> Dict[str, Any]:
        feats = self.extract_features(images)
        logits, _ = self.apply_heads(self.head_state, feats, train=False)
        return {"logits": logits}

    __call__ = forward

    def predict(self, images) -> Dict[str, jax.Array]:
        out = self.forward(images)["logits"]
        return {t: jnp.argmax(v, axis=-1) for t, v in out.items()}
