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

An INT4 "group-dot" variant (per-group raw-nibble dots with scales folded
POST-dot, no dequantized weight tile) was built in r4 and DELETED in r5
after on-chip measurement (benchmarks/probe_r5_groupdot.py, 2026-08-22):
it won isolated GEMV micro-benchmarks (69 vs 115 us on the lm_head at b=8)
but LOST end-to-end decode (15.47 vs 14.68 ms/step at 7B INT4 B=8), was
5-10x slower at tree-verify row counts (which the spec-lossless invariant
forces onto the same kernel), and scoped-VMEM OOMed at d=11008 verify
shapes. git history has the kernel; this file keeps the winner only.
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
    x = x_ref[:]  # [BB, D]
    q = q_ref[:]  # [D, BF] int8
    s = s_ref[:]  # [G, BF] f32
    # dequant exactly in f32, round once to the compute dtype, one big MXU dot
    # (measured faster than batched per-group dots for small B)
    w = (q.astype(jnp.float32) * _repeat_rows(s, group_size)).astype(x.dtype)
    o_ref[:] = jnp.dot(
        x, w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _int4_kernel(x_ref, q_ref, s_ref, off_ref, o_ref, *, group_size: int):
    """AND-unpack + full dequant + ONE big MXU dot.

    Measured fastest structure on v5e (35us vs 58us for per-group dots with
    int32 shift unpack, 4096x11008 b=8; SoL 28us): nibble extraction is TWO
    int8 ANDs (no shifts — Mosaic only legalizes int32 shifts; no widening):
      lo   = v & 0x0F   -> unsigned [0, 15]
      hi16 = v & 0xF0   -> 16 * signed hi (two's complement high nibble)
    and the /16 of the high half folds into its per-group scales. Dequant is
    exact f32 FMA with row-repeated scales, rounded once to bf16 for the MXU.
    """
    x = x_ref[:]  # [B, D]
    v = pltpu.bitcast(q_ref[:], jnp.int8)  # [D/2, BF] planar
    lo = (v & jnp.int8(0x0F)).astype(jnp.float32)
    hi16 = (v & jnp.int8(-16)).astype(jnp.float32)
    g = s_ref.shape[0]
    gh = g // 2
    s = s_ref[:]
    off = off_ref[:]
    w_lo = lo * _repeat_rows(s[:gh], group_size) + _repeat_rows(
        off[:gh], group_size
    )
    w_hi = hi16 * _repeat_rows(s[gh:] * 0.0625, group_size) + _repeat_rows(
        off[gh:], group_size
    )
    w = jnp.concatenate([w_lo, w_hi], axis=0).astype(x.dtype)  # [D, BF]
    o_ref[:] = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_f", "interpret",
                     "out_dtype"),
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
    out_dtype=None,
):
    b, d = x.shape
    f = q.shape[-1]
    g = scale.shape[0]
    bf = min(block_f, f)
    while f % bf:
        bf //= 2
    out_dtype = out_dtype or x.dtype

    # VMEM fit for large token batches (prefill / tree verify). Preference
    # order: (1) shrink block_f with b whole — weight bytes still stream
    # exactly once; (2) only past bf=128 tile b (weights re-fetched AND
    # re-dequantized per b tile: measured +2.5x verify time at 200 tokens
    # when b was tiled at 64 with bf=512). The estimate is calibrated on
    # the observed scoped-VMEM datapoint int8 [256,11008] bf=512 -> 17.43M
    # (the dequantized bf16 w tile costs ~0.55x its naive footprint after
    # Mosaic's elementwise fusion).
    bb = b

    def est(bb_, bf_):
        # int8 coefficient from the OOM datapoint ([256,11008] bf=512 ->
        # 17.43M scoped); int4's 0.4 from the FITTING datapoint (b=8,
        # d=11008, bf=512 runs within 16M) so decode shapes keep bf=512
        if bits == 8:
            core = d * bf_ + int(0.55 * d * bf_ * 2) + g * bf_ * 4
        else:
            core = (d // 2) * bf_ + int(0.4 * d * bf_ * 4) + 2 * g * bf_ * 4
        return bb_ * d * 2 + core + bb_ * bf_ * 4

    budget = 15 * 2**20
    while est(bb, bf) > budget and bf > 128:
        bf //= 2
    while est(bb, bf) > budget and bb > 64:
        bb = max(64, bb // 2)
    bpad = (-b) % bb
    if bpad:
        x = jnp.pad(x, ((0, bpad), (0, 0)))
    nb = (b + bpad) // bb
    grid = (f // bf, nb)

    if bits == 8:
        kernel = functools.partial(_int8_kernel, group_size=group_size)
        in_specs = [
            pl.BlockSpec((bb, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bf), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bf), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ]
        args = (x, q, scale)
    else:
        kernel = functools.partial(_int4_kernel, group_size=group_size)
        in_specs = [
            pl.BlockSpec((bb, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d // 2, bf), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bf), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bf), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ]
        args = (x, q, scale, offset)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, bf), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b + bpad, f), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * f,
            bytes_accessed=q.size * q.dtype.itemsize + b * d * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:b] if bpad else out


def _int8_kernel_idx(l_ref, x_ref, q_ref, s_ref, o_ref, *, group_size: int):
    del l_ref  # consumed by the index maps
    x = x_ref[:]
    q = q_ref[0]  # [D, BF] — layer block selected by the index map
    s = s_ref[0]
    w = (q.astype(jnp.float32) * _repeat_rows(s, group_size)).astype(x.dtype)
    o_ref[:] = jnp.dot(
        x, w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _int4_kernel_idx(l_ref, x_ref, q_ref, s_ref, off_ref, o_ref, *,
                     group_size: int):
    del l_ref
    x = x_ref[:]
    v = pltpu.bitcast(q_ref[0], jnp.int8)
    lo = (v & jnp.int8(0x0F)).astype(jnp.float32)
    hi16 = (v & jnp.int8(-16)).astype(jnp.float32)
    g = s_ref.shape[1]
    gh = g // 2
    s = s_ref[0]
    off = off_ref[0]
    w_lo = lo * _repeat_rows(s[:gh], group_size) + _repeat_rows(
        off[:gh], group_size
    )
    w_hi = hi16 * _repeat_rows(s[gh:] * 0.0625, group_size) + _repeat_rows(
        off[gh:], group_size
    )
    w = jnp.concatenate([w_lo, w_hi], axis=0).astype(x.dtype)
    o_ref[:] = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "block_f", "interpret",
                     "out_dtype"),
)
def _qmm_2d_idx(
    x: jnp.ndarray,  # [B, D]
    q: jnp.ndarray,  # [L, ...] stacked packed carrier
    scale: jnp.ndarray,  # [L, G, F]
    offset: Optional[jnp.ndarray],
    lidx: jnp.ndarray,  # [1] int32 layer index
    *,
    bits: int,
    group_size: int,
    block_f: int = 512,
    interpret: bool = False,
    out_dtype=None,
):
    """Layer-indexed fused dequant matmul over STACKED [L, ...] carriers.

    The layer index rides scalar prefetch and selects the weight block in
    the BlockSpec index maps, so each tile DMAs straight from the stacked
    HBM buffer — no per-layer slice copy. Why this exists: the serving
    forward scans over layers, and a ``lax.scan``-sliced operand feeding a
    pallas_call is MATERIALIZED by XLA first (a ~50 MB copy per 7B INT4
    layer = +2x packed-weight traffic; measured ~5 ms of a 14.7 ms decode
    step — benchmarks/probe_r5_decattr.py, 2026-08-22). Same dequant math
    and blocking as _qmm_2d: per-row results are bitwise identical to the
    unstacked kernel at equal block shapes.
    """
    b, d = x.shape
    f = q.shape[-1]
    g = scale.shape[1]
    bf = min(block_f, f)
    while f % bf:
        bf //= 2
    out_dtype = out_dtype or x.dtype
    bb = b

    def est(bb_, bf_):
        if bits == 8:
            core = d * bf_ + int(0.55 * d * bf_ * 2) + g * bf_ * 4
        else:
            core = (d // 2) * bf_ + int(0.4 * d * bf_ * 4) + 2 * g * bf_ * 4
        return bb_ * d * 2 + core + bb_ * bf_ * 4

    budget = 15 * 2**20
    while est(bb, bf) > budget and bf > 128:
        bf //= 2
    while est(bb, bf) > budget and bb > 64:
        bb = max(64, bb // 2)
    bpad = (-b) % bb
    if bpad:
        x = jnp.pad(x, ((0, bpad), (0, 0)))
    nb = (b + bpad) // bb
    grid = (f // bf, nb)

    if bits == 8:
        kernel = functools.partial(_int8_kernel_idx, group_size=group_size)
        in_specs = [
            pl.BlockSpec((bb, d), lambda j, i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, bf), lambda j, i, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, bf), lambda j, i, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ]
        args = (x, q, scale)
    else:
        kernel = functools.partial(_int4_kernel_idx, group_size=group_size)
        in_specs = [
            pl.BlockSpec((bb, d), lambda j, i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d // 2, bf), lambda j, i, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, bf), lambda j, i, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, bf), lambda j, i, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ]
        args = (x, q, scale, offset)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, bf), lambda j, i, l: (i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b + bpad, f), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * f,
            bytes_accessed=(q.size // q.shape[0]) * q.dtype.itemsize
            + b * d * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lidx.astype(jnp.int32).reshape(1), *args)
    return out[:b] if bpad else out


def quant_matmul_indexed(
    x: jnp.ndarray,
    qa: QuantizedArray,  # stacked: batch_dims == 1, carriers [L, ...]
    lidx,
    *,
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """x @ dequantize(qa[lidx]) streaming tiles directly from the stacked
    carriers (see _qmm_2d_idx). Falls back to slice+dequantize when the
    unit isn't kernel-eligible."""
    assert qa.batch_dims == 1 and qa.q.ndim == 3, "expects [L, ...] carriers"
    odt = out_dtype or x.dtype
    if not interpret and not pallas_eligible(qa):
        import jax as _jax

        from flexflow_tpu.quant.weight_only import dequantize

        qa_l = _jax.tree_util.tree_map(lambda a: a[lidx], qa)
        return jnp.tensordot(
            x.reshape(*x.shape[: x.ndim - qa.contract_dims], qa.d_contract),
            dequantize(qa_l).reshape(qa.d_contract, -1),
            axes=1,
            preferred_element_type=jnp.float32,
        ).reshape(*x.shape[: x.ndim - qa.contract_dims],
                  *qa.shape[1 + qa.contract_dims:]).astype(odt)
    unit = qa.shape[1:]
    cdims = qa.contract_dims
    d = qa.d_contract
    out_shape = unit[cdims:]
    lead = x.shape[: x.ndim - cdims]
    xb = x.reshape(int(np.prod(lead)) if lead else 1, d)
    out = _qmm_2d_idx(
        xb, qa.q, qa.scale, qa.offset, jnp.asarray(lidx, jnp.int32),
        bits=qa.bits, group_size=qa.group_size, interpret=interpret,
        out_dtype=odt,
    )
    if qa.rest_pad:
        out = out[:, : qa.d_rest]
    return out.reshape(*lead, *out_shape).astype(odt)


def pallas_eligible(qa: QuantizedArray) -> bool:
    """Whether the fused kernel handles this unit's shapes well.

    Small/unaligned units (tiny test models, odd feature counts) either hit
    Mosaic layout limits or simply aren't worth a custom kernel — XLA's fused
    dequant-dot wins there. The kernel targets the production shapes (>=1k
    contraction, 128-aligned). Block width 512 is the measured sweet spot;
    quantize() pads the out dim to a 512-multiple to keep wide blocks.
    """
    d = qa.d_contract
    f = qa.q.shape[-1]
    # d needs sublane alignment only (64 covers the int8 (32,128) and bf16
    # (16,128) tiles); Falcon-7B's d=4544 (not a 256-multiple) measured
    # EXACT and fast on-chip (596-1462 GB/s packed). f here is the PADDED
    # out dim (quantize pads to a 512-multiple), so %256 keeps wide blocks.
    # d < 1024 stays on XLA: measured r5 — an INT8-quantized 160M draft
    # (d=768) routed through the kernel LOST e2e (626 vs 792 tok/s spec
    # path; small units are latency-bound where XLA fuses better).
    if d < 1024 or d % 64 or f % 256:
        return False
    if qa.bits == 4:
        # planar halves must be whole groups so each group's scale/offset
        # applies within one half
        if (d // 2) % qa.group_size:
            return False
    return True


def quant_matmul(
    x: jnp.ndarray,  # [..., D_contract...]
    qa: QuantizedArray,
    *,
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """x @ dequantize(qa) with in-kernel dequant.

    Supports unbatched QuantizedArrays (or scan-sliced per-layer units whose
    leading batch axes are gone). Contraction axes of ``x`` must match the
    unit's contraction shape; output gets the unit's out shape. Units the
    kernel can't tile well fall back to XLA's dequant-fused dot.
    ``out_dtype``: widen the kernel output (f32 logits head) — the MXU
    accumulates in f32 either way; this skips the round to x.dtype.
    """
    assert qa.q.ndim == 2, "quant_matmul expects an unbatched (per-layer) unit"
    odt = out_dtype or x.dtype
    if not interpret and not pallas_eligible(qa):
        from flexflow_tpu.quant.weight_only import dequantize

        return jnp.tensordot(
            x.reshape(*x.shape[: x.ndim - qa.contract_dims], qa.d_contract),
            dequantize(qa).reshape(qa.d_contract, -1),
            axes=1,
            preferred_element_type=jnp.float32,
        ).reshape(*x.shape[: x.ndim - qa.contract_dims],
                  *qa.shape[qa.batch_dims + qa.contract_dims:]).astype(odt)
    unit = qa.shape[qa.batch_dims:]
    cdims = qa.contract_dims
    d = qa.d_contract
    out_shape = unit[cdims:]
    lead = x.shape[: x.ndim - cdims]
    xb = x.reshape(int(np.prod(lead)) if lead else 1, d)
    out = _qmm_2d(
        xb, qa.q, qa.scale, qa.offset,
        bits=qa.bits, group_size=qa.group_size, interpret=interpret,
        out_dtype=odt,
    )
    if qa.rest_pad:
        out = out[:, : qa.d_rest]
    return out.reshape(*lead, *out_shape).astype(odt)
