"""Loss functions.

TPU-native equivalent of /root/reference/src/loss_functions/ (loss seeds logit
gradients on-device; sparse-CCE, CCE, MSE, identity —
include/flexflow/loss_functions.h:27-75). Under JAX the backward seeding is
``jax.grad`` of these scalar losses; the 1/batch scale matches the reference's
replica-adjusted scaling (loss_functions.cc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def sparse_categorical_crossentropy(
    logits: jnp.ndarray,  # [..., V] (pre-softmax)
    labels: jnp.ndarray,  # [...] int
    *,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Mean token-level CE over non-ignored labels."""
    logits = logits.astype(jnp.float32)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = (logz - ll) * mask
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1)


def categorical_crossentropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Dense-target CE (targets are probability rows)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def mean_squared_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def identity_loss(pred: jnp.ndarray) -> jnp.ndarray:
    """Mean of the output (reference identity loss: grad of ones/batch)."""
    return jnp.mean(pred.astype(jnp.float32))


LOSSES = {
    "sparse_categorical_crossentropy": sparse_categorical_crossentropy,
    "categorical_crossentropy": categorical_crossentropy,
    "mean_squared_error": mean_squared_error,
    "identity": identity_loss,
}
