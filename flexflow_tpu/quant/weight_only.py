"""Weight-only INT8/INT4 grouped quantization.

TPU-native equivalent of the reference's quantized-weight path:
- group layout semantics from /root/reference/src/ops/kernels/decompress_kernels.cu
  (``decompress_int4_general_weights``/``decompress_int8_general_weights``,
  per-group scale/offset with group size ``INT4_NUM_OF_ELEMENTS_PER_GROUP``)
- quantize-on-load from /root/reference/src/runtime/file_loader.cc:417-670
  (int4/int8 repack at weight-load time)

Scheme: groups of ``group_size`` elements along the contraction (input) axis.
INT8 is symmetric (per-group scale); INT4 is asymmetric (per-group scale +
offset/min, two values packed per byte). Stacked per-layer weights [L, ...]
quantize layer-by-layer (leading ``batch_dims`` axes), matching the
reference's per-weight-file quantization. The jnp dequant here fuses into the
consuming matmul under XLA; Pallas fused dequant-matmul kernels replace it on
the serving hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedArray:
    """Grouped weight-only quantized tensor.

    Logical shape is ``shape`` = batch dims ++ unit shape, where the first
    ``contract_dims`` axes of the unit are the contraction axes (flattened to
    D for grouping). Carriers:

    q:      int8/uint8. INT8: [*B, D, R]. INT4: [*B, D//2, R] planar-packed:
            byte r packs element r (low nibble, UNSIGNED [0,15]) and element
            r + D//2 (high nibble, SIGNED two's complement [-8,7] — stored as
            ``(value+8) ^ 8``). The signed high nibble lets the Pallas kernel
            unpack both halves with int8 ANDs only (lo = v & 0x0F;
            hi16 = v & 0xF0 == 16*hi, the /16 folding into the high-half
            scales) — no shifts (Mosaic only legalizes int32 shifts) and no
            int32 widening. The +8 bias is folded into the high-half groups'
            offsets at quantize time.
    scale:  [*B, D // group_size, R] f32 per-group scale.
    offset: [*B, D // group_size, R] f32 per-group additive term (INT4 only;
            low-half groups: the group minimum; high-half groups: minimum
            + 8 * scale, absorbing the signed-nibble bias).
    """

    q: jnp.ndarray
    scale: jnp.ndarray
    offset: Optional[jnp.ndarray]
    bits: int
    group_size: int
    shape: Tuple[int, ...]
    batch_dims: int
    contract_dims: int
    dtype: Any
    # zero columns appended to the carriers' out dim so the Pallas kernel can
    # tile F in 512-wide blocks (the measured sweet spot); logical shape is
    # unchanged — dequantize()/quant_matmul() slice the pad back off
    rest_pad: int = 0

    def tree_flatten(self):
        children = (self.q, self.scale, self.offset)
        aux = (
            self.bits,
            self.group_size,
            self.shape,
            self.batch_dims,
            self.contract_dims,
            self.dtype,
            self.rest_pad,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def unit_shape(self) -> Tuple[int, ...]:
        return self.shape[self.batch_dims:]

    @property
    def d_contract(self) -> int:
        return int(np.prod(self.unit_shape[: self.contract_dims]))

    @property
    def d_rest(self) -> int:
        u = self.unit_shape[self.contract_dims:]
        return int(np.prod(u)) if u else 1


def _pick_group_size(d: int, group_size: int, bits: int) -> int:
    # INT4 planar packing: groups must not straddle the half-plane boundary,
    # so the group size must divide d // 2.
    span = d // 2 if bits == 4 else d
    g = min(group_size, span)
    while span % g:
        g //= 2
    return max(g, 1)


def quantize(
    w: jnp.ndarray,
    bits: int = 8,
    group_size: int = 128,
    *,
    batch_dims: int = 0,
    contract_dims: int = 1,
    compute_dtype=jnp.bfloat16,
) -> QuantizedArray:
    """Quantize ``w`` along its (flattened) contraction axes with per-group
    scale/offset. Leading ``batch_dims`` axes (stacked layers/experts) are
    quantized independently."""
    assert bits in (4, 8), bits
    shape = tuple(w.shape)
    unit = shape[batch_dims:]
    d = int(np.prod(unit[:contract_dims]))
    rest = int(np.prod(unit[contract_dims:])) if unit[contract_dims:] else 1
    if bits == 4 and d % 2:
        raise ValueError(f"INT4 needs even contraction dim, got {d}")
    g = _pick_group_size(d, group_size, bits)
    b = int(np.prod(shape[:batch_dims])) if batch_dims else 1

    wf = jnp.reshape(w.astype(jnp.float32), (b, d // g, g, rest))
    # pad the out dim to a 512-multiple for Pallas-eligible shapes (wide F
    # blocks are the measured sweet spot; zero columns quantize to q=0)
    rest_pad = (-rest) % 512 if (d >= 1024 and rest >= 512) else 0
    if rest_pad:
        wf = jnp.pad(wf, ((0, 0), (0, 0), (0, 0), (0, rest_pad)))
    restp = rest + rest_pad

    if bits == 8:
        amax = jnp.max(jnp.abs(wf), axis=2, keepdims=True)  # [b, G, 1, restp]
        scale = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        q = q.reshape(shape[:batch_dims] + (d, restp))
        scale = scale[:, :, 0].reshape(shape[:batch_dims] + (d // g, restp))
        offset = None
    else:
        lo = jnp.min(wf, axis=2, keepdims=True)
        hi = jnp.max(wf, axis=2, keepdims=True)
        scale = jnp.maximum((hi - lo) / 15.0, 1e-12)
        qv = jnp.clip(jnp.round((wf - lo) / scale), 0, 15).astype(jnp.uint8)
        qv = qv.reshape(b, d, restp)
        half = d // 2
        # high nibble stored SIGNED (value - 8, two's complement = value ^ 8);
        # the +8*scale bias is folded into the high-half groups' offsets below
        q = (qv[:, :half] | ((qv[:, half:] ^ 8) << 4)).astype(jnp.uint8)
        q = q.reshape(shape[:batch_dims] + (d // 2, restp))
        offset = lo[:, :, 0]
        scale = scale[:, :, 0]
        gh = (d // g) // 2
        offset = offset.at[:, gh:].add(8.0 * scale[:, gh:])
        offset = offset.reshape(shape[:batch_dims] + (d // g, restp))
        scale = scale.reshape(shape[:batch_dims] + (d // g, restp))

    return QuantizedArray(
        q=q,
        scale=scale,
        offset=offset,
        bits=bits,
        group_size=g,
        shape=shape,
        batch_dims=batch_dims,
        contract_dims=contract_dims,
        dtype=compute_dtype,
        rest_pad=rest_pad,
    )


def dequantize(qa: QuantizedArray) -> jnp.ndarray:
    """Full reconstruction (reference decompress_kernels.cu semantics).

    Robust to leading batch axes having been sliced off by ``lax.scan`` over
    stacked layers (the carriers lose axes while the static aux keeps the
    original shape): effective batch dims are inferred from ``q.ndim``.
    """
    d, rest, g = qa.d_contract, qa.d_rest, qa.group_size
    restp = rest + qa.rest_pad
    eff_bd = qa.q.ndim - 2
    sliced = qa.batch_dims - eff_bd
    out_shape = qa.shape[sliced:]
    bshape = out_shape[:eff_bd]
    b = int(np.prod(bshape)) if bshape else 1

    if qa.bits == 8:
        q = qa.q.reshape(b, d // g, g, restp).astype(jnp.float32)
        scale = qa.scale.reshape(b, d // g, 1, restp)
        w = q * scale
    else:
        packed = jax.lax.bitcast_convert_type(
            qa.q.reshape(b, d // 2, restp), jnp.int8
        )
        lo = (packed & 0xF).astype(jnp.float32)  # unsigned [0, 15]
        hi = (packed >> 4).astype(jnp.float32)  # SIGNED [-8, 7] (arith shift)
        qv = jnp.concatenate([lo, hi], axis=1)
        scale = qa.scale.reshape(b, d // g, 1, restp)
        off = qa.offset.reshape(b, d // g, 1, restp)  # hi-half pre-biased
        w = qv.reshape(b, d // g, g, restp) * scale + off
    w = w.reshape(b, d, restp)[:, :, :rest]
    return w.reshape(out_shape).astype(qa.dtype)


def concat_rest(qas, unit_rest_shape) -> QuantizedArray:
    """Concatenate QuantizedArrays along the (flattened) output axis.

    Exact: grouping runs along the contraction axis, so carriers/scales/
    offsets of compatible arrays concatenate column-wise without repacking —
    every output column's dequantized weights are bit-identical to its
    source array's. Used to build fused projection carriers (wq|wk|wv,
    wg|wu) at engine-build time (FFConfig.fuse_qkv). ``unit_rest_shape`` is
    the fused logical output shape after the contraction dims (e.g.
    ``(H + 2*KH, Dh)``)."""
    q0 = qas[0]
    for qa in qas[1:]:
        assert (qa.bits, qa.group_size, qa.batch_dims, qa.contract_dims) == (
            q0.bits, q0.group_size, q0.batch_dims, q0.contract_dims
        ), "incompatible quantization configs"
        assert qa.d_contract == q0.d_contract, "contraction dims differ"
        assert qa.dtype == q0.dtype
    rest = sum(qa.d_rest for qa in qas)
    assert rest == int(np.prod(unit_rest_shape)), (rest, unit_rest_shape)

    def cat(field):
        parts = [getattr(qa, field)[..., : qa.d_rest] for qa in qas]
        return jnp.concatenate(parts, axis=-1)

    d = q0.d_contract
    # same Pallas F-block padding policy as quantize()
    rest_pad = (-rest) % 512 if (d >= 1024 and rest >= 512) else 0
    q, scale = cat("q"), cat("scale")
    offset = cat("offset") if q0.offset is not None else None
    if rest_pad:
        pad = [(0, 0)] * (q.ndim - 1) + [(0, rest_pad)]
        q, scale = jnp.pad(q, pad), jnp.pad(scale, pad)
        offset = jnp.pad(offset, pad) if offset is not None else None
    shape = (q0.shape[: q0.batch_dims]
             + q0.unit_shape[: q0.contract_dims] + tuple(unit_rest_shape))
    return QuantizedArray(
        q=q, scale=scale, offset=offset, bits=q0.bits,
        group_size=q0.group_size, shape=shape, batch_dims=q0.batch_dims,
        contract_dims=q0.contract_dims, dtype=q0.dtype, rest_pad=rest_pad,
    )


def as_array(w) -> jnp.ndarray:
    """Materialize quantized weights; pass plain arrays through."""
    if isinstance(w, QuantizedArray):
        return dequantize(w)
    return w


# Weights to quantize: every matmul weight (the reference quantizes linear +
# attention projections; norms/embeddings/router stay full precision).
_QUANT_2D = {"wg", "wu", "wd"}  # per-layer [L, D, F]
_QUANT_HEADS = {"wq", "wk", "wv"}  # per-layer [L, D, H, Dh] (contract D)


def quantize_params(
    spec,
    params,
    bits: int = 8,
    group_size: int = 128,
    compute_dtype=jnp.bfloat16,
) -> Any:
    """Quantize all matmul weights of a decoder params pytree."""
    del spec

    def quant_leaf(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        name = names[-1]
        in_layers = "layers" in names
        if name == "lm_head":
            return quantize(
                leaf, bits, group_size, compute_dtype=compute_dtype
            )
        if not in_layers:
            return leaf
        if name in _QUANT_HEADS:
            # [L, D, H, Dh]: contract D -> out (H, Dh)
            return quantize(
                leaf, bits, group_size, batch_dims=1, contract_dims=1,
                compute_dtype=compute_dtype,
            )
        if name == "wo":
            # [L, H, Dh, D]: contract (H, Dh) -> out D
            return quantize(
                leaf, bits, group_size, batch_dims=1, contract_dims=2,
                compute_dtype=compute_dtype,
            )
        if name in _QUANT_2D:
            bd = leaf.ndim - 2  # 1 for dense [L,D,F]; 2 for MoE [L,E,D,F]
            return quantize(
                leaf, bits, group_size, batch_dims=bd, contract_dims=1,
                compute_dtype=compute_dtype,
            )
        return leaf

    return jax.tree_util.tree_map_with_path(quant_leaf, params)
