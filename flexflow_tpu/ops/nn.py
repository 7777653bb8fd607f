"""Classic NN ops: conv2d, pool2d, batch-norm, dropout, embedding, etc.

TPU-native equivalents of the reference's dense/CNN operator kernels
(/root/reference/src/ops/*.cu — conv_2d (cudnn), pool_2d, batch_norm,
dropout, embedding, flat, concat/split/reshape/transpose/reverse, element
unary/binary, batch_matmul, reduce/mean — see SURVEY.md §2.2). Convolutions
lower to ``lax.conv_general_dilated`` which XLA tiles onto the MXU; everything
else is jnp on the VPU. All ops use NCHW layouts to match the reference's
tensors (cudnn default), letting XLA pick the internal layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# conv / pool (NCHW, weights OIHW — the reference's cudnn layout)
# ---------------------------------------------------------------------------


def conv2d(
    x: jnp.ndarray,  # [N, C, H, W]
    w: jnp.ndarray,  # [O, I/groups, KH, KW]
    b: Optional[jnp.ndarray],  # [O]
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    groups: int = 1,
) -> jnp.ndarray:
    """Reference: src/ops/conv_2d.cc + kernels/conv_2d_kernels.cu."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def conv2d_transpose(
    x: jnp.ndarray,  # [N, C, H, W]
    w: jnp.ndarray,  # [I, O, KH, KW] (torch ConvTranspose2d layout)
    b: Optional[jnp.ndarray],  # [O]
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    output_padding: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Fractionally-strided (transposed) convolution, torch semantics:
    out = (in - 1) * stride - 2 * pad + kernel + output_pad.

    Implemented as a regular conv with lhs_dilation=stride over the
    spatially-flipped, IO-swapped kernel — the construction XLA fuses best.
    Extends the reference's conv coverage (its zoo has no deconv op; Keras
    frontend parity requires Conv2DTranspose).
    """
    kh, kw = w.shape[2], w.shape[3]
    w_f = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # [O, I, KH, KW]
    pads = (
        (kh - 1 - padding[0], kh - 1 - padding[0] + output_padding[0]),
        (kw - 1 - padding[1], kw - 1 - padding[1] + output_padding[1]),
    )
    out = jax.lax.conv_general_dilated(
        x, w_f,
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def group_norm(
    x: jnp.ndarray,  # [N, C, *spatial]
    num_groups: int,
    scale: Optional[jnp.ndarray],  # [C]
    bias: Optional[jnp.ndarray],  # [C]
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm (torch nn.GroupNorm / keras GroupNormalization semantics):
    normalize over (C/G, *spatial) within each of G channel groups."""
    n, c = x.shape[0], x.shape[1]
    spatial = x.shape[2:]
    g = num_groups
    xg = x.reshape(n, g, c // g, *spatial).astype(jnp.float32)
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    if scale is not None:
        y = y * scale.reshape(1, c, *([1] * len(spatial)))
    if bias is not None:
        y = y + bias.reshape(1, c, *([1] * len(spatial)))
    return y.astype(x.dtype)


def pool2d(
    x: jnp.ndarray,  # [N, C, H, W]
    kernel: Tuple[int, int],
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    pool_type: str = "max",  # "max" | "avg"
) -> jnp.ndarray:
    """Reference: src/ops/pool_2d.cc (cudnn pooling)."""
    window = (1, 1, kernel[0], kernel[1])
    strides = (1, 1, stride[0], stride[1])
    pads = ((0, 0), (0, 0), (padding[0], padding[0]), (padding[1], padding[1]))
    if pool_type == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window, strides, pads
        )
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    # cudnn avg pooling divides by window size including padding
    return summed / (kernel[0] * kernel[1])


def batch_norm_train(
    x: jnp.ndarray,  # [N, C, H, W] or [N, C]
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    momentum: float = 0.9,
    eps: float = 1e-5,
):
    """Training-mode BN using batch statistics; returns (y, new_mean, new_var).

    Reference: src/ops/batch_norm.cu (cudnn BN fwd training).
    """
    axes = tuple(i for i in range(x.ndim) if i != 1)
    mean = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    shape = [1, -1] + [1] * (x.ndim - 2)
    y = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + eps)
    y = y * scale.reshape(shape) + bias.reshape(shape)
    new_mean = momentum * running_mean + (1 - momentum) * mean
    new_var = momentum * running_var + (1 - momentum) * var
    return y, new_mean, new_var


def batch_norm_infer(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    shape = [1, -1] + [1] * (x.ndim - 2)
    y = (x - running_mean.reshape(shape)) * jax.lax.rsqrt(
        running_var.reshape(shape) + eps
    )
    return y * scale.reshape(shape) + bias.reshape(shape)


def dropout(x: jnp.ndarray, rate: float, rng: jax.Array) -> jnp.ndarray:
    """Reference: src/ops/dropout.cc (cudnn dropout)."""
    if rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def flat(x: jnp.ndarray) -> jnp.ndarray:
    """[N, ...] -> [N, prod(...)] (reference src/ops/flat.cc)."""
    return x.reshape(x.shape[0], -1)


def embedding_lookup(
    ids: jnp.ndarray,  # [N] or [N, T] int
    table: jnp.ndarray,  # [V, D]
    aggr: str = "none",  # "none" | "sum" | "avg"
) -> jnp.ndarray:
    """Reference: src/ops/embedding.cc (aggr modes)."""
    out = jnp.take(table, ids, axis=0)
    if aggr == "sum":
        return jnp.sum(out, axis=-2)
    if aggr == "avg":
        return jnp.mean(out, axis=-2)
    return out


def batch_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference: src/ops/batch_matmul.cc (strided batched GEMM)."""
    return jnp.matmul(a, b)


def reverse(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.flip(x, axis=axis)


def gather(x: jnp.ndarray, index: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.take_along_axis(x, index, axis=axis)
