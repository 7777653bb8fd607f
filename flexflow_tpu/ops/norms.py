"""Normalization ops.

TPU-native equivalents of the reference's custom norm kernels
(/root/reference/src/ops/kernels/rms_norm_kernels.cu, layer_norm.cu,
residual_rms_norm_kernels.cu, residual_layer_norm.cu,
add_bias_residual_layer_norm.cu). On TPU these are VPU-bound elementwise
reductions that XLA fuses into the surrounding matmuls, so plain jnp is the
right implementation; the fused residual variants exist to mirror the
reference's fused ops (they fuse under XLA anyway).

All norms accumulate in float32 regardless of input dtype (matching the
reference kernels' fp32 accumulation) and cast back to the input dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm (reference: src/ops/kernels/rms_norm_kernels.cu)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y * scale.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    eps: float,
) -> jnp.ndarray:
    """LayerNorm (reference: src/ops/layer_norm.cu)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def residual_rms_norm(
    x: jnp.ndarray, residual: jnp.ndarray, scale: jnp.ndarray, eps: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused residual-add + RMSNorm, returns (residual_out, normed).

    Reference: src/ops/kernels/residual_rms_norm_kernels.cu (two outputs).
    """
    res = x + residual
    return res, rms_norm(res, scale, eps)


def residual_layer_norm(
    x: jnp.ndarray,
    residual: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    eps: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused residual-add + LayerNorm (reference: src/ops/residual_layer_norm.cu)."""
    res = x + residual
    return res, layer_norm(res, scale, bias, eps)
