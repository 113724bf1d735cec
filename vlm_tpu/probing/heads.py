"""Probe heads (flax): linear and "deeper" MLP heads over [B, D] features.

Mirrors `/root/reference/probing/models/base_probe.py:7-22`:

- ``make_head``:        BatchNorm1d → Dropout → Linear
- ``make_head_deeper``: BatchNorm1d → Dropout → Linear → GELU → Dropout → Linear

BatchNorm carries running statistics in the ``batch_stats`` collection;
training steps pass ``train=True`` and collect mutations.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LinearHead(nn.Module):
    """BN → Dropout → Linear (reference ``make_head``)."""
    n_classes: int
    dropout_p: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train,
                       name="dropout")(x)
        return nn.Dense(self.n_classes, dtype=self.dtype, name="fc")(x)


class DeeperHead(nn.Module):
    """BN → Dropout → Linear → GELU → Dropout → Linear
    (reference ``make_head_deeper``)."""
    n_classes: int
    hidden_dim: int = 512
    dropout_p: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train,
                       name="dropout1")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_p, deterministic=not train,
                       name="dropout2")(x)
        return nn.Dense(self.n_classes, dtype=self.dtype, name="fc2")(x)


def make_head(n_classes: int, dropout_p: float = 0.3,
              deeper: bool = False, hidden_dim: int = 512) -> nn.Module:
    if deeper:
        return DeeperHead(n_classes, hidden_dim=hidden_dim,
                          dropout_p=dropout_p)
    return LinearHead(n_classes, dropout_p=dropout_p)
