"""Pallas decode attention: one program per request, KV streamed from cache.

TPU-native rebuild of the reference's decode-mode attention kernel
(/root/reference/src/ops/inc_multihead_self_attention.cu:378
``compute_attention_kernel_generation_kernel`` — one CTA per head x request,
KV streamed from the cache with online softmax). Grid (B,): each program
loads one request's [S, KH, D] K/V cache slice into VMEM and attends the GQA
query groups with plain 2D MXU matmuls (q [G, D] x K^T, P x V).

Split-cache form: the cache is READ-ONLY (the decode token's K/V arrive
in-register as ``k_self``/``v_self`` and are folded into the same softmax);
the caller scatters them into the cache afterwards — see
decoder.forward_cached.

Numerics match ops/attention.split_cached_attention for the decode case (T=1,
causal, no alibi/softcap) — asserted in tests and selected at trace time by
the decoder only for exactly that case.

Status: measured on v5e at B=8, S=1024, MHA-12 this kernel streams KV at
~70 GB/s vs XLA's ~180 GB/s (the per-head G=1 query tiles pad to 8 sublanes
and waste the MXU), so the FFConfig gate ``use_pallas_attention`` defaults to
OFF; XLA's fused einsum is the production decode path. The kernel carries the
grouped-query (G>=8) shapes where per-request streaming wins.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(
    q: jnp.ndarray,  # [B, H, D] (single decode token per slot)
    k_cache: jnp.ndarray,  # [B, KH, D, S] committed cache (token NOT written)
    v_cache: jnp.ndarray,  # [B, KH, D, S]
    k_self: jnp.ndarray,  # [B, KH, D] this token's K (cache dtype)
    v_self: jnp.ndarray,  # [B, KH, D]
    cache_lens: jnp.ndarray,  # [B] committed tokens BEFORE this step
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, d = q.shape
    kh, s = k_cache.shape[1], k_cache.shape[3]
    g = h // kh
    scale = 1.0 / math.sqrt(d)
    qg = q.reshape(b, kh, g, d)

    def kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref):
        i = pl.program_id(0)
        l = lens_ref[i]  # committed length (self handled in-register)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (g, s), 1)
        # static loop over KV heads: each iteration is plain 2D MXU work.
        # Cache layout [KH, D, S]: scores = q [G, D] x k [D, S] — D on
        # sublanes, S on lanes (the natural MXU orientation).
        for j in range(kh):
            qb = q_ref[0, j].astype(jnp.float32)  # [G, D]
            kb = k_ref[0, j].astype(jnp.float32)  # [D, S]
            vb = v_ref[0, j].astype(jnp.float32)  # [D, S]
            scores = jnp.dot(
                qb, kb, preferred_element_type=jnp.float32
            ) * scale  # [G, S]
            scores = jnp.where(kv_pos < l, scores, -1e30)
            ks = ks_ref[0, j].astype(jnp.float32)  # [D]
            vs = vs_ref[0, j].astype(jnp.float32)  # [D]
            s_self = jnp.sum(qb * ks[None, :], axis=-1, keepdims=True) * scale
            m = jnp.maximum(
                jnp.max(scores, axis=-1, keepdims=True), s_self
            )
            e = jnp.where(kv_pos < l, jnp.exp(scores - m), 0.0)
            e_self = jnp.exp(s_self - m)  # [G, 1]
            denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
            out = (
                jax.lax.dot_general(
                    e, vb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + e_self * vs[None, :]
            ) / jnp.maximum(denom, 1e-30)
            o_ref[0, j] = out.astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kh, g, d), lambda i, lens: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, d, s), lambda i, lens: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, d, s), lambda i, lens: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, d), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, d), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kh, g, d), lambda i, lens: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kh, g, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * d * s,
            bytes_accessed=2 * b * s * kh * d * k_cache.dtype.itemsize,
            transcendentals=b * h * s,
        ),
        interpret=interpret,
    )(cache_lens.astype(jnp.int32), qg, k_cache, v_cache, k_self, v_self)
    return out.reshape(b, h, d)
