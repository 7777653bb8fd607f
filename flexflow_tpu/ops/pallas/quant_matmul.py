"""Pallas fused dequant + matmul for INT8/INT4 weight-only quantized weights.

TPU-native replacement for the reference's decompress-then-GEMM path
(/root/reference/src/ops/kernels/decompress_kernels.cu +
linear_kernels.cu INT4/INT8 branches): instead of materializing dequantized
weights in HBM, each [D, BLOCK_F] weight tile is DMA'd to VMEM in its packed
form (1/2 or 1/4 the HBM traffic of bf16), dequantized in-register with its
per-group scales, and fed straight to the MXU. This is the speed-of-light
shape for decode GEMV: HBM traffic ~= packed weight bytes.

Layouts (from flexflow_tpu/quant/weight_only.py):
- INT8: q [D, F] int8, scale [G, F] f32 (symmetric), G = D / group_size.
- INT4: q [D/2, F] uint8 planar-packed (low nibble = row r, high nibble =
  row r + D/2), scale/offset [G, F] f32 (asymmetric).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexflow_tpu.quant.weight_only import QuantizedArray


def _repeat_rows(a: jnp.ndarray, reps: int) -> jnp.ndarray:
    """[G, F] -> [G*reps, F] repeating each row ``reps`` times."""
    g, f = a.shape
    return jnp.broadcast_to(a[:, None, :], (g, reps, f)).reshape(g * reps, f)


def _int8_kernel(x_ref, q_ref, s_ref, o_ref, *, group_size: int):
    x = x_ref[:]  # [B, D]
    q = q_ref[:]  # [D, BF] int8
    s = s_ref[:]  # [G, BF] f32
    # dequant exactly in f32, round once to the compute dtype, one big MXU dot
    # (measured faster than batched per-group dots for small B)
    w = (q.astype(jnp.float32) * _repeat_rows(s, group_size)).astype(x.dtype)
    o_ref[:] = jnp.dot(
        x, w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _int4_kernel(x_ref, q_ref, s_ref, off_ref, o_ref, *, group_size: int):
    x = x_ref[:]  # [B, D]
    # Mosaic has no uint8 casts and no i8 shifts: bitcast to int8 for the
    # low-nibble mask, widen to int32 for the (legal) arithmetic shift.
    packed = pltpu.bitcast(q_ref[:], jnp.int8)  # [D/2, BF] planar
    p32 = packed.astype(jnp.int32)
    lo = (p32 & 0xF).astype(jnp.bfloat16)
    hi = ((p32 >> 4) & 0xF).astype(jnp.bfloat16)
    qv = jnp.concatenate([lo, hi], axis=0)  # [D, BF], values 0..15
    b = x.shape[0]
    g = s_ref.shape[0]
    # per-group dots; scale applied after the dot, offset via group-sums of x:
    # sum_{d in g} x_d * (q_d * s_g + off_g)
    #   = s_g * dot(x_g, q_g) + off_g * sum(x_g)
    qg = qv.reshape(g, group_size, -1)  # [G, gs, BF]
    xg = x.reshape(b, g, group_size).transpose(1, 0, 2)  # [G, B, gs]
    pg = jax.lax.dot_general(
        xg, qg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G, B, BF]
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)  # [G, B]
    out = pg * s_ref[:][:, None, :] + xsum[:, :, None] * off_ref[:][:, None, :]
    o_ref[:] = jnp.sum(out, axis=0).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "block_f", "interpret")
)
def _qmm_2d(
    x: jnp.ndarray,  # [B, D]
    q: jnp.ndarray,
    scale: jnp.ndarray,
    offset: Optional[jnp.ndarray],
    *,
    bits: int,
    group_size: int,
    block_f: int = 512,
    interpret: bool = False,
):
    b, d = x.shape
    f = q.shape[-1]
    g = scale.shape[0]
    bf = min(block_f, f)
    while f % bf:
        bf //= 2
    grid = (f // bf,)

    if bits == 8:
        kernel = functools.partial(_int8_kernel, group_size=group_size)
        in_specs = [
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
        ]
        args = (x, q, scale)
    else:
        kernel = functools.partial(_int4_kernel, group_size=group_size)
        in_specs = [
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d // 2, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
        ]
        args = (x, q, scale, offset)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, bf), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * f,
            bytes_accessed=q.size * q.dtype.itemsize + b * d * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def quant_matmul(
    x: jnp.ndarray,  # [..., D_contract...]
    qa: QuantizedArray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ dequantize(qa) with in-kernel dequant.

    Supports unbatched QuantizedArrays (or scan-sliced per-layer units whose
    leading batch axes are gone). Contraction axes of ``x`` must match the
    unit's contraction shape; output gets the unit's out shape.
    """
    assert qa.q.ndim == 2, "quant_matmul expects an unbatched (per-layer) unit"
    unit = qa.shape[qa.batch_dims:]
    cdims = qa.contract_dims
    d = qa.d_contract
    out_shape = unit[cdims:]
    lead = x.shape[: x.ndim - cdims]
    xb = x.reshape(int(np.prod(lead)) if lead else 1, d)
    out = _qmm_2d(
        xb, qa.q, qa.scale, qa.offset,
        bits=qa.bits, group_size=qa.group_size, interpret=interpret,
    )
    return out.reshape(*lead, *out_shape).astype(x.dtype)
