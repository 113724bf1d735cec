"""Multi-task loss balancing: homoscedastic uncertainty weighting and
per-task loss EMAs (behavioral mirror of
`/root/reference/probing/train/losses.py`)."""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


class UncertaintyWeighter:
    """Kendall homoscedastic weighting:
    ``L = Σ_t exp(−s_t)·L_t + 0.5·s_t`` with learnable ``s_t = log σ_t²``
    (reference: losses.py:7-31).

    The log-vars are a tiny param pytree meant to be optimized alongside the
    head params (append :meth:`params` to the optimizer target).
    """

    def __init__(self, task_names, init_log_var: float = 0.0):
        self.task_names = list(task_names)
        self.init_log_var = float(init_log_var)

    def init_params(self) -> Dict[str, jnp.ndarray]:
        return {t: jnp.asarray(self.init_log_var, jnp.float32)
                for t in self.task_names}

    @staticmethod
    def combine(log_vars: Dict[str, jnp.ndarray],
                loss_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        total = 0.0
        for t, loss in loss_dict.items():
            s_t = log_vars[t]
            total = total + jnp.exp(-s_t) * jnp.mean(loss) + 0.5 * s_t
        return total

    @staticmethod
    def current_weights(log_vars) -> Dict[str, float]:
        return {t: float(np.exp(-np.asarray(v))) for t, v in log_vars.items()}


class RunningMeans:
    """Per-task EMA of loss values with history, plotting and JSON
    persistence (reference: losses.py:33-122)."""

    def __init__(self, task_names, alpha: float = 0.99):
        self.task_names = list(task_names)
        self.alpha = float(alpha)
        self.values: Dict[str, Optional[float]] = {
            t: None for t in self.task_names}
        self.history: Dict[str, List[float]] = {
            t: [] for t in self.task_names}

    def update(self, losses):
        for idx in range(len(self.task_names)):
            self.update_by_idx(losses[idx], idx)

    def update_by_idx(self, loss_value: float, task_idx: int):
        task = self.task_names[task_idx]
        v = self.values[task]
        new_v = loss_value if v is None else \
            self.alpha * v + (1 - self.alpha) * loss_value
        self.values[task] = new_v
        self.history[task].append(new_v)

    def get(self, task_name: str):
        return self.values.get(task_name, None)

    def get_by_index(self, idx: int):
        return self.values[self.task_names[idx]]

    def plot(self, output_path=None):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(10, 6))
        for task in self.task_names:
            plt.plot(self.history[task], label=task)
        plt.xlabel("Epoch / Iterations")
        plt.ylabel("Running Mean Loss")
        plt.title("Running Means per Task Over Time")
        plt.legend()
        plt.grid(True)
        if output_path:
            plt.savefig(output_path, bbox_inches="tight")
        plt.close()

    def save_history(self, filepath):
        with open(filepath, "w") as f:
            json.dump(self.history, f, indent=2)

    def load_history(self, filepath):
        with open(filepath, "r") as f:
            self.history = json.load(f)
        for task in self.task_names:
            if self.history.get(task):
                self.values[task] = self.history[task][-1]
            else:
                self.values[task] = None
