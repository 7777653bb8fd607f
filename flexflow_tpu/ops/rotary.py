"""Rotary position embeddings (RoPE), including llama3-style scaling.

TPU-native equivalent of the reference's in-kernel RoPE application
(/root/reference/src/ops/inc_multihead_self_attention.cu:666,838 —
``apply_rotary_embedding_*`` including llama3 rope-scaling). Uses the
HF half-split ("GPT-NeoX") layout so that logits match HuggingFace exactly.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from flexflow_tpu.specs import RopeScaling


def compute_inv_freq(head_dim: int, theta: float, scaling: Optional[RopeScaling]):
    """Per-frequency inverse wavelengths, with optional llama3/linear scaling."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling is None:
        return inv_freq
    if scaling.rope_type == "linear":
        return inv_freq / scaling.factor
    if scaling.rope_type == "llama3":
        low_freq_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
        high_freq_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        # Low-frequency (long wavelength) components get fully scaled; high-freq
        # stay; mid-band smoothly interpolates. Mirrors HF _compute_llama3_parameters
        # and reference inc_multihead_self_attention.cu llama3 branch.
        scaled = inv_freq / scaling.factor
        smooth = (
            scaling.original_max_position_embeddings / wavelen - scaling.low_freq_factor
        ) / (scaling.high_freq_factor - scaling.low_freq_factor)
        smoothed = (1 - smooth) * scaled + smooth * inv_freq
        return jnp.where(
            wavelen < high_freq_wavelen,
            inv_freq,
            jnp.where(wavelen > low_freq_wavelen, scaled, smoothed),
        )
    raise ValueError(f"Unsupported rope_type {scaling.rope_type!r}")


def rope_cos_sin(
    positions: jnp.ndarray,  # [...,] int positions
    head_dim: int,
    theta: float,
    scaling: Optional[RopeScaling] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions, shape [..., head_dim]."""
    inv_freq = compute_inv_freq(head_dim, theta, scaling)  # [head_dim//2]
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., hd]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray,  # [..., num_heads, head_dim]
    cos: jnp.ndarray,  # [..., head_dim] (broadcast over heads)
    sin: jnp.ndarray,
) -> jnp.ndarray:
    """Apply rotary embedding; cos/sin broadcast across the heads axis."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = cos[..., None, :]
    s = sin[..., None, :]
    return (xf * c + _rotate_half(xf) * s).astype(dtype)
