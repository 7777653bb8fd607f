"""Training metrics.

TPU-native equivalent of /root/reference/src/metrics_functions/
(``PerfMetrics``: accuracy, cce, mse, mae aggregated across shards —
metrics_functions.h:44, model.cc:4220). Metrics are computed on-device inside
the jitted step and reduced with jnp (psum falls out of GSPMD).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from flexflow_tpu.training.losses import IGNORE_INDEX


@dataclasses.dataclass
class PerfMetrics:
    """Host-side accumulated metrics (reference PerfMetrics)."""

    train_all: int = 0
    train_correct: int = 0
    cce_loss: float = 0.0
    sparse_cce_loss: float = 0.0
    mse_loss: float = 0.0
    mae_loss: float = 0.0

    def update(self, other: Dict[str, float]) -> None:
        self.train_all += int(other.get("count", 0))
        self.train_correct += int(other.get("correct", 0))
        for k in ("cce_loss", "sparse_cce_loss", "mse_loss", "mae_loss"):
            if k in other:
                setattr(self, k, getattr(self, k) + float(other[k]))

    @property
    def accuracy(self) -> float:
        return self.train_correct / max(self.train_all, 1)


def classification_metrics(logits: jnp.ndarray, labels: jnp.ndarray):
    """Returns device dict {count, correct} for accuracy aggregation."""
    mask = labels != IGNORE_INDEX
    pred = jnp.argmax(logits, axis=-1)
    return {
        "count": jnp.sum(mask),
        "correct": jnp.sum((pred == labels) & mask),
    }


def regression_metrics(pred: jnp.ndarray, target: jnp.ndarray):
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return {
        "mse_loss": jnp.mean(jnp.square(diff)),
        "mae_loss": jnp.mean(jnp.abs(diff)),
    }
