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
    # Mosaic has no uint8 casts and no i8/i16 shifts: bitcast to int8, widen
    # to int32 for the (legal) ops. The signed-high-nibble storage (see
    # quant/weight_only.py) makes the high half a bare arithmetic shift — no
    # second mask — and the planar halves avoid a concatenate relayout.
    packed = pltpu.bitcast(q_ref[:], jnp.int8)  # [D/2, BF] planar
    p32 = packed.astype(jnp.int32)
    lo = (p32 & 0xF).astype(jnp.bfloat16)  # rows 0..D/2, unsigned [0, 15]
    hi = (p32 >> 4).astype(jnp.bfloat16)  # rows D/2..D, SIGNED [-8, 7]
    b = x.shape[0]
    g = s_ref.shape[0]
    gh = g // 2
    d2 = lo.shape[0]
    s = s_ref[:]
    off = off_ref[:]

    # per-half, per-group dots; scale applied after the dot, offset via
    # group-sums of x: sum_{d in g} x_d * (q_d * s_g + off_g)
    #   = s_g * dot(x_g, q_g) + off_g * sum(x_g)
    def half(qv, xh, sh, oh):
        qg = qv.reshape(gh, group_size, -1)  # [GH, gs, BF]
        xg = xh.reshape(b, gh, group_size).transpose(1, 0, 2)  # [GH, B, gs]
        pg = jax.lax.dot_general(
            xg, qg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [GH, B, BF]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=2)  # [GH, B]
        out = pg * sh[:, None, :] + xsum[:, :, None] * oh[:, None, :]
        return jnp.sum(out, axis=0)  # [B, BF]

    out = half(lo, x[:, :d2], s[:gh], off[:gh]) + half(
        hi, x[:, d2:], s[gh:], off[gh:]
    )
    o_ref[:] = out.astype(o_ref.dtype)


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


def pallas_eligible(qa: QuantizedArray) -> bool:
    """Whether the fused kernel handles this unit's shapes well.

    Small/unaligned units (tiny test models, odd feature counts) either hit
    Mosaic layout limits (lane-dim reshapes need 128-multiples) or simply
    aren't worth a custom kernel — XLA's fused dequant-dot wins there. The
    kernel targets the production shapes (>=1k contraction, 128-aligned).
    """
    d = qa.d_contract
    f = qa.q.shape[-1]
    if d < 1024 or d % 256 or f % 256:
        return False
    if qa.bits == 4:
        # planar halves: x reshape [B, D/2] -> [B, GH, gs] splits the lane
        # dim, legal only at 128-multiples
        if qa.group_size % 128 or (d // 2) % qa.group_size:
            return False
    return True


def quant_matmul(
    x: jnp.ndarray,  # [..., D_contract...]
    qa: QuantizedArray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ dequantize(qa) with in-kernel dequant.

    Supports unbatched QuantizedArrays (or scan-sliced per-layer units whose
    leading batch axes are gone). Contraction axes of ``x`` must match the
    unit's contraction shape; output gets the unit's out shape. Units the
    kernel can't tile well fall back to XLA's dequant-fused dot.
    """
    assert qa.q.ndim == 2, "quant_matmul expects an unbatched (per-layer) unit"
    if not interpret and not pallas_eligible(qa):
        from flexflow_tpu.quant.weight_only import dequantize

        return jnp.tensordot(
            x.reshape(*x.shape[: x.ndim - qa.contract_dims], qa.d_contract),
            dequantize(qa).reshape(qa.d_contract, -1),
            axes=1,
        ).reshape(*x.shape[: x.ndim - qa.contract_dims],
                  *qa.shape[qa.batch_dims + qa.contract_dims:]).astype(x.dtype)
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
