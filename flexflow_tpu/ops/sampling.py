"""Token sampling ops: greedy argmax, temperature, top-k, top-p (nucleus).

TPU-native equivalents of the reference's sampling operators:
- ArgMax (greedy): /root/reference/src/ops/argmax.cu (cub-based)
- Sampling (top-p): /root/reference/src/ops/sampling.cu (cub sort + prefix scan)
- ArgTopK: /root/reference/src/ops/arg_topk.cu (speculative mode emits probs)

On TPU a full-vocab sort lowers to XLA's bitonic sort on the VPU; everything is
batched over request slots. All math in float32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingConfig(NamedTuple):
    """Per-slot sampling parameters (device arrays, shape [B])."""

    temperature: jnp.ndarray  # [B] f32; <= 0 means greedy
    top_p: jnp.ndarray  # [B] f32 in (0, 1]; 1.0 disables
    top_k: jnp.ndarray  # [B] i32; 0 disables

    @staticmethod
    def greedy(batch: int) -> "SamplingConfig":
        return SamplingConfig(
            temperature=jnp.zeros((batch,), jnp.float32),
            top_p=jnp.ones((batch,), jnp.float32),
            top_k=jnp.zeros((batch,), jnp.int32),
        )


def filtered_logits(logits: jnp.ndarray, cfg: SamplingConfig) -> jnp.ndarray:
    """Temperature-scaled logits with top-k/top-p filtering applied ([B, V]).

    Filtered-out entries are -inf; greedy rows (temperature <= 0) pass
    through at temperature 1 (callers special-case greedy via argmax).
    """
    b, v = logits.shape
    greedy = cfg.temperature <= 0.0
    temp = jnp.where(greedy, 1.0, cfg.temperature)
    scaled = logits / temp[:, None]

    # top-k mask: keep the k largest logits (k == 0 disables)
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]  # [B, V]
    k = jnp.where(cfg.top_k > 0, cfg.top_k, v)
    kth = jnp.take_along_axis(
        sorted_desc, jnp.clip(k[:, None] - 1, 0, v - 1), axis=-1
    )  # [B, 1]
    masked = jnp.where(scaled >= kth, scaled, -jnp.inf)

    # top-p mask over the sorted distribution
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # keep tokens whose prefix (exclusive) mass < top_p; always keep rank 0
    keep_sorted = (cum - probs_sorted) < cfg.top_p[:, None]
    # threshold = smallest logit still kept
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(scaled >= thresh, masked, -jnp.inf)


def target_probs(logits: jnp.ndarray, cfg: SamplingConfig) -> jnp.ndarray:
    """Per-row sampling distribution [B, V] (f32) under cfg.

    Greedy rows get a one-hot at the argmax — under speculative stochastic
    verification a delta target accepts exactly the argmax path and the
    renormalized residual stays the same delta, so the sampling-mode walk
    degrades to the lossless greedy walk with no special casing.
    """
    greedy = (cfg.temperature <= 0.0)[:, None]
    soft = jax.nn.softmax(filtered_logits(logits.astype(jnp.float32), cfg), -1)
    onehot = jax.nn.one_hot(
        jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32
    )
    return jnp.where(greedy, onehot, soft)


def sample(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    cfg: SamplingConfig,
    *,
    greedy_only: bool = False,
    row_offset=0,
) -> jnp.ndarray:
    """Sample one token per row; greedy rows (temperature<=0) take argmax.

    ``greedy_only=True`` (static) skips the vocab-sort machinery entirely —
    the scheduler sets it when every active request is greedy, which is the
    reference's ArgMax fast path (src/ops/argmax.cu) vs Sampling op split.

    Row ``r``'s draw is a pure function of ``(key, row_offset + r, logits)``
    — the key is folded per GLOBAL row, never drawn jointly over the batch —
    so a request's sampled stream is independent of batch composition:
    continuous batching, microbatched PP (which passes its ``row_offset``),
    and the stepwise engines all produce bit-identical tokens for the same
    per-step key.
    """
    if greedy_only:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    greedy = cfg.temperature <= 0.0
    masked = filtered_logits(logits, cfg)
    rows = jnp.arange(logits.shape[0], dtype=jnp.int32) + row_offset
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, rows)
    sampled = jax.vmap(
        lambda kk, lg: jax.random.categorical(kk, lg, axis=-1)
    )(keys, masked)
    return jnp.where(greedy, jnp.argmax(logits, axis=-1), sampled).astype(jnp.int32)


def arg_top_k(logits: jnp.ndarray, k: int, *, return_probs: bool = False):
    """Top-k token ids (and optionally softmax probs) per row.

    Reference: src/ops/arg_topk.cc (``speculative_decoding`` mode emits probs,
    model.h:716-721) — used for beam expansion in the draft model.
    """
    vals, idx = jax.lax.top_k(logits, k)
    if not return_probs:
        return idx
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_probs = jnp.take_along_axis(probs, idx, axis=-1)
    return idx, top_probs
