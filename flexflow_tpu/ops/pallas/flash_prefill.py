"""Pallas flash attention for the prompt (prefill) phase.

TPU-native replacement for the reference's prompt-phase attention GEMMs
(/root/reference/src/ops/inc_multihead_self_attention.cu:99
``compute_attention_kernel_prompt`` — cuBLAS S=QK^T, masked softmax, SV),
which materialize the [S, S] score matrix per head. This kernel never
materializes scores in HBM: grid (B, KH, S/BQ), each program holds one query
block [BQ, G, D] (GQA groups folded into MXU rows — no sublane padding even
for MHA) and streams K/V blocks [BK, D] from VMEM with an online softmax.

Causality is exploited by a *dynamic* inner trip count: query block i only
loops over k blocks up to ``ceil(min(len_b, (i+1)*BQ) / BK)`` — padded rows
and future blocks are never touched, so a half-full prompt costs half the
FLOPs (the reference masks but still computes the full GEMM).

Numerics match ops/attention.prefill_attention / the causal+lengths case of
``cached_attention`` (fp32 softmax, bf16 inputs) and are asserted in
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    lens_ref,  # scalar prefetch: [B] int32 valid lengths
    q_ref,  # [1, BQ, G, D] (VMEM; KH dim squeezed by BlockSpec)
    k_ref,  # [1, S, D]
    v_ref,  # [1, S, D]
    o_ref,  # [1, BQ, G, D]
    *,
    block_q: int,
    block_k: int,
    scale: float,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    bq, g, d = q_ref.shape[1:]
    s = k_ref.shape[1]
    rows = bq * g

    length = lens_ref[b]
    # keep MXU multiplicands in the input dtype (bf16 rate is ~8x f32);
    # accumulation and softmax stay f32 — matching the reference kernels'
    # half-in / fp32-accumulate structure
    q = q_ref[0].reshape(rows, d)

    # absolute query position of each MXU row (row = qpos_in_block * G + g)
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (rows, block_k), 0
    ) // g

    # causal + length bound: last k position any row in this block can see
    hi = jnp.minimum((qi + 1) * block_q, length)
    n_blocks = (hi + block_k - 1) // block_k

    def body(j, carry):
        acc, m, l = carry
        k_start = j * block_k
        kb = k_ref[0, pl.ds(k_start, block_k)]  # [BK, D]
        vb = v_ref[0, pl.ds(k_start, block_k)]
        scores = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [rows, BK]
        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 1
        )
        mask = (k_pos <= q_pos) & (k_pos < length)
        scores = jnp.where(mask, scores, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        e = jnp.exp(scores - m_new)
        e = jnp.where(mask, e, 0.0)
        l_new = l * alpha + jnp.sum(e, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            e.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((rows, d), jnp.float32)
    m = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((rows, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc, m, l))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.reshape(bq, g, d).astype(o_ref.dtype)
    del s


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret"),
)
def flash_prefill(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,  # [B, S, KH, D]
    v: jnp.ndarray,  # [B, S, KH, D]
    lengths: jnp.ndarray,  # [B] int32 valid prompt lengths
    *,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal flash self-attention over (padded) prompts. Returns [B, S, H, D].

    Rows past ``lengths`` produce zeros (fully masked). Requires S % block_q
    == 0 and S % block_k == 0 after internal clamping (callers pad S to a
    power-of-two bucket, engine.prefill_bucket).
    """
    b, s, h, d = q.shape
    kh = k.shape[2]
    g = h // kh
    scale = 1.0 / math.sqrt(d)

    bq = min(block_q, s)
    while s % bq:
        bq //= 2
    bk = min(block_k, s)
    while s % bk:
        bk //= 2

    # [B, KH, ...] major layout so squeezed axes stay clear of the minor
    # (8, 128)-tiled dims (Mosaic block constraint)
    qg = q.reshape(b, s, kh, g, d).transpose(0, 2, 1, 3, 4)  # [B, KH, S, G, D]
    kt = k.transpose(0, 2, 1, 3)  # [B, KH, S, D]
    vt = v.transpose(0, 2, 1, 3)

    grid = (b, kh, s // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, block_q=bq, block_k=bk, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, None, bq, g, d),
                    lambda b_, k_, i, lens: (b_, k_, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, None, s, d),
                    lambda b_, k_, i, lens: (b_, k_, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, None, s, d),
                    lambda b_, k_, i, lens: (b_, k_, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, None, bq, g, d),
                lambda b_, k_, i, lens: (b_, k_, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, kh, s, g, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * d * s * s // 2,  # QK + PV, causal half
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + 2 * k.size * k.dtype.itemsize * (s // bq)
            ),
            transcendentals=b * h * s * s // 2,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qg, kt, vt)
    return out.transpose(0, 2, 1, 3, 4).reshape(b, s, h, d)
