"""Ring attention / context parallelism over the mesh "seq" axis.

EXCEEDS the reference: FlexFlow has no sequence/context parallelism — the KV
cache is fully resident per device and context is bounded by
``max_sequence_length`` (SURVEY.md §2.3: "CP / ring attention / Ulysses:
absent; max context bounded by max_sequence_length with per-device full KV
cache", reference include/flexflow/batch_config.h:75-76). On TPU, contexts
longer than one chip's HBM budget shard naturally over an ICI ring:

- **Prefill** (:func:`ring_prefill_attention`): Q, K, V are sharded over the
  ``seq`` mesh axis. Each device computes blockwise attention of its local
  queries against the KV block it currently holds, accumulating with an
  online (flash-style) softmax, then rotates the KV block around the ring
  with ``lax.ppermute``. After ``seq_degree`` steps every query has seen
  every key. Communication (one KV block per step) overlaps with the next
  block's compute under XLA's async collectives.

- **Decode** (:func:`cp_cached_attention`): the KV *cache* S-axis is sharded
  over ``seq``; queries are replicated. Each shard computes a partial
  attention over its cache slice (local max / denominator / weighted values),
  and the shards merge with one ``pmax`` + two ``psum`` — the distributed
  form of flash-decoding's split-K merge. The in-flight (this step's) tokens
  join the softmax in-register on shard 0 only, so they are counted exactly
  once; their K/V are scattered into the owning shard's cache slice by the
  caller afterwards, same contract as ``attention.split_cached_attention``.

All softmax math is float32 (matching the reference kernels' fp32
accumulation); results are exactly the single-device computation up to fp32
reduction order.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flexflow_tpu.ops.attention import NEG_INF, _group_query

# Same literal as parallel.mesh.SEQ_AXIS — kept local because ops/ must not
# import parallel/ (parallel.sharding imports models.decoder imports ops).
SEQ_AXIS = "seq"

_TINY = 1e-30


def _ring_perm(n: int):
    """Send each shard's KV block to the next shard: after t rotations,
    shard i holds block (i - t) mod n."""
    return [(j, (j + 1) % n) for j in range(n)]


def ring_prefill_attention(
    q: jnp.ndarray,  # [S_loc, H, D] local query shard
    k: jnp.ndarray,  # [S_loc, KH, D] local key shard
    v: jnp.ndarray,  # [S_loc, KH, D]
    *,
    length: Optional[jnp.ndarray] = None,  # scalar valid prompt length (global)
    scale: Optional[float] = None,
    axis_name: str = SEQ_AXIS,
) -> jnp.ndarray:
    """Causal ring attention; call INSIDE shard_map with Q/K/V sharded on dim 0.

    Equivalent to ``attention.prefill_attention`` on the gathered sequence.
    GQA/MQA via the same head-group decomposition ([KH, G] query groups).
    """
    s_loc, h, d = q.shape
    kh = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    qg = _group_query(q, kh).astype(jnp.float32)  # [S, KH, G, D]
    # score/accumulator layout [KH, G, S_q, *]: queries stay put all ring steps
    qg = qg.transpose(1, 2, 0, 3)  # [KH, G, S, D]
    q_pos = idx * s_loc + jnp.arange(s_loc, dtype=jnp.int32)  # global positions

    o0 = jnp.zeros((kh, h // kh, s_loc, d), jnp.float32)
    m0 = jnp.full((kh, h // kh, s_loc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((kh, h // kh, s_loc, 1), jnp.float32)

    def step(t, carry):
        o, m, l, k_blk, v_blk = carry
        src = (idx - t) % n  # which global block this shard holds now
        k_pos = src * s_loc + jnp.arange(s_loc, dtype=jnp.int32)
        scores = (
            jnp.einsum("kgqd,skd->kgqs", qg, k_blk.astype(jnp.float32)) * scale
        )
        mask = k_pos[None, :] <= q_pos[:, None]  # [S_q, S_k] causal (global)
        if length is not None:
            mask = mask & (k_pos[None, :] < length)
        scores = jnp.where(mask[None, None], scores, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.where(mask[None, None], jnp.exp(scores - m_new), 0.0)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum("kgqs,skd->kgqd", p, v_blk.astype(jnp.float32))
        k_blk = jax.lax.ppermute(k_blk, axis_name, _ring_perm(n))
        v_blk = jax.lax.ppermute(v_blk, axis_name, _ring_perm(n))
        return o, m_new, l, k_blk, v_blk

    o, _, l, _, _ = jax.lax.fori_loop(0, n, step, (o0, m0, l0, k, v))
    out = o / jnp.maximum(l, _TINY)  # fully-masked rows -> 0
    return out.transpose(2, 0, 1, 3).reshape(s_loc, h, d).astype(q.dtype)


def context_parallel_prefill(
    mesh,
    q: jnp.ndarray,  # [S, H, D] global
    k: jnp.ndarray,  # [S, KH, D]
    v: jnp.ndarray,  # [S, KH, D]
    *,
    length: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """shard_map wrapper: run ring prefill with S sharded over mesh's "seq" axis."""
    spec = P(SEQ_AXIS, None, None)
    in_specs = [spec, spec, spec]
    args = [q, k, v]
    if length is not None:
        in_specs.append(P())
        args.append(jnp.asarray(length, jnp.int32))

    def fn(q_, k_, v_, *rest):
        return ring_prefill_attention(
            q_, k_, v_,
            length=rest[0] if rest else None,
            scale=scale, axis_name=SEQ_AXIS,
        )

    return jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=spec,
        check_vma=False,
    )(*args)


def cp_cached_attention(
    q: jnp.ndarray,  # [B, T, H, D] replicated over "seq"
    k_cache: jnp.ndarray,  # [B, KH, D, S_loc] LOCAL cache shard (read-only)
    v_cache: jnp.ndarray,  # [B, KH, D, S_loc]
    k_new: jnp.ndarray,  # [B, T', KH, D] this step's K (replicated)
    v_new: jnp.ndarray,  # [B, T', KH, D]
    cache_lens: jnp.ndarray,  # [B] committed tokens (GLOBAL count)
    *,
    new_mask: Optional[jnp.ndarray] = None,  # [B, T, T'] bool; None => causal
    scale: Optional[float] = None,
    axis_name: str = SEQ_AXIS,
) -> jnp.ndarray:
    """Decode/verify attention over a seq-sharded KV cache; call INSIDE shard_map.

    Shard i owns global cache slots [i*S_loc, (i+1)*S_loc). Each shard computes
    a partial flash accumulation over its slice; in-flight tokens contribute on
    shard 0 only. Merge: global max via pmax, then psum of rescaled weighted
    values / denominators. Numerics match ``attention.split_cached_attention``
    up to fp32 reduction order.
    """
    b, t, h, d = q.shape
    s_loc = k_cache.shape[3]
    kh = k_cache.shape[1]
    tn = k_new.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    idx = jax.lax.axis_index(axis_name)

    qg = _group_query(q, kh).astype(jnp.float32)  # [B, T, KH, G, D]
    sc = jnp.einsum("btkgd,bkds->bkgts", qg, k_cache.astype(jnp.float32)) * scale
    slot = idx * s_loc + jnp.arange(s_loc, dtype=jnp.int32)  # global slot ids
    kv_mask = jnp.broadcast_to(
        slot[None, None, :] < cache_lens[:, None, None], (b, t, s_loc)
    )
    sc = jnp.where(kv_mask[:, None, None], sc, NEG_INF)

    sn = jnp.einsum("btkgd,bukd->bkgtu", qg, k_new.astype(jnp.float32)) * scale
    if new_mask is None:
        new_mask = jnp.broadcast_to(
            jnp.tril(jnp.ones((t, tn), dtype=bool))[None], (b, t, tn)
        )
    new_mask = new_mask & (idx == 0)  # count in-flight columns exactly once
    sn = jnp.where(new_mask[:, None, None], sn, NEG_INF)

    m_loc = jnp.maximum(
        jnp.max(sc, axis=-1, keepdims=True), jnp.max(sn, axis=-1, keepdims=True)
    )
    m = jax.lax.pmax(m_loc, axis_name)
    ec = jnp.where(kv_mask[:, None, None], jnp.exp(sc - m), 0.0)
    en = jnp.where(new_mask[:, None, None], jnp.exp(sn - m), 0.0)
    l_loc = jnp.sum(ec, axis=-1, keepdims=True) + jnp.sum(en, axis=-1, keepdims=True)
    o_loc = jnp.einsum("bkgts,bkds->bkgtd", ec, v_cache.astype(jnp.float32))
    o_loc = o_loc + jnp.einsum("bkgtu,bukd->bkgtd", en, v_new.astype(jnp.float32))
    l = jax.lax.psum(l_loc, axis_name)  # [B, KH, G, T, 1]
    o = jax.lax.psum(o_loc, axis_name)  # [B, KH, G, T, D]
    out = o / jnp.maximum(l, _TINY)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, t, h, d).astype(q.dtype)


def context_parallel_decode(
    mesh,
    q: jnp.ndarray,  # [B, T, H, D]
    k_cache: jnp.ndarray,  # [B, KH, D, S] global (sharded on S by GSPMD)
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,  # [B, T', KH, D]
    v_new: jnp.ndarray,
    cache_lens: jnp.ndarray,  # [B]
    *,
    new_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """shard_map wrapper: cache S-axis sharded over "seq", output replicated."""
    cache_spec = P(None, None, None, SEQ_AXIS)
    rep4 = P(None, None, None, None)
    in_specs = [rep4, cache_spec, cache_spec, rep4, rep4, P(None)]
    args = [q, k_cache, v_cache, k_new, v_new, cache_lens]
    if new_mask is not None:
        in_specs.append(P(None, None, None))
        args.append(new_mask)

    def fn(q_, kc, vc, kn, vn, lens, *rest):
        nm = rest[0] if rest else None
        return cp_cached_attention(
            q_, kc, vc, kn, vn, lens,
            new_mask=nm, scale=scale, axis_name=SEQ_AXIS,
        )

    return jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=rep4,
        check_vma=False,
    )(*args)
