"""Attention ops: prefill (causal self-attention) and cached decode/tree attention.

TPU-native equivalents of the reference's attention kernels:
- prompt-phase GEMM attention: /root/reference/src/ops/inc_multihead_self_attention.cu:99
  (``compute_attention_kernel_prompt``)
- decode-phase cached attention: inc_multihead_self_attention.cu:378
  (``compute_attention_kernel_generation_kernel`` — one CTA per head x request,
  KV streamed from cache)
- tree-verification attention: /root/reference/src/ops/tree_inc_multihead_self_attention.cu
  (whole speculation tree in one pass, tree-topology causal mask from
  ``BatchConfig::BitMask``)

These are the jnp/XLA reference implementations; the Pallas fast paths live in
``flexflow_tpu/ops/pallas/``. GQA/MQA is expressed by reshaping queries to
[kv_heads, q_per_kv] groups so the contraction batches over KV heads — the same
head-group decomposition the reference uses (``num_q_heads / num_kv_heads``).

All softmax math is float32 (matching the reference kernels' fp32 accumulation).

Dtype policy (TPU-critical): score/value contractions keep their inputs in the
native dtype and request float32 accumulation via ``preferred_element_type`` —
on TPU that is the native bf16×bf16→f32 MXU mode. Casting the multi-GB KV
cache to fp32 *before* the dot (the naive formulation) makes XLA materialize a
2× fp32 copy of the cache every decode step and pushes the matmul onto the
slow fp32 MXU path; measured, that alone cost ~6-8× of the decode-step HBM
floor. Probabilities are cast to the value dtype for the PV contraction (the
same choice as standard TPU flash-attention kernels); when the cache is fp32
(CPU tests) every cast is a no-op and numerics are bit-identical to the
all-fp32 formulation.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _mxu_native() -> bool:
    """True on TPU: keep dot inputs in bf16 with f32 accumulation (MXU
    native). Off-TPU the f32-cast formulation is used instead — XLA:CPU
    lacks the BF16xBF16=F32 dot kernel, and there is no multi-GB cache to
    protect from a cast there anyway."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _dotin(x: jnp.ndarray, like_dtype=None) -> jnp.ndarray:
    """Cast a dot operand for the current backend: native dtype on TPU,
    float32 elsewhere. ``like_dtype`` targets the other operand's dtype on
    the TPU path (e.g. fp32 softmax probs down to the cache dtype)."""
    if _mxu_native():
        return x if like_dtype is None else x.astype(like_dtype)
    return x.astype(jnp.float32)


def alibi_slopes(num_heads: int, alibi_bias_max: float = 8.0) -> jnp.ndarray:
    """Per-head ALiBi slopes (MPT convention, matches HF build_mpt_alibi_tensor)."""
    n_pow2 = 2 ** math.ceil(math.log2(num_heads))
    base = jnp.arange(1, n_pow2 + 1, dtype=jnp.float32) * (alibi_bias_max / n_pow2)
    slopes = 1.0 / jnp.power(2.0, base)
    if n_pow2 != num_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:num_heads]
    return slopes  # [num_heads]


def _group_query(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """[..., H, D] -> [..., KH, G, D] with H = KH * G."""
    *lead, h, d = q.shape
    return q.reshape(*lead, num_kv_heads, h // num_kv_heads, d)


def _softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked fp32 softmax over the last axis; fully-masked rows yield zeros."""
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(m))
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


def prefill_attention(
    q: jnp.ndarray,  # [S, H, D]
    k: jnp.ndarray,  # [S, KH, D]
    v: jnp.ndarray,  # [S, KH, D]
    *,
    length: Optional[jnp.ndarray] = None,  # valid prompt length (masks padding)
    q_positions: Optional[jnp.ndarray] = None,  # [S] absolute positions (alibi)
    slopes: Optional[jnp.ndarray] = None,  # [H] alibi slopes
    logit_softcap: Optional[float] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal self-attention over one (padded) prompt. Returns [S, H, D]."""
    s, h, d = q.shape
    kh = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    qg = _group_query(q, kh)  # [S, KH, G, D]

    # [KH, G, S_q, S_k] — f32 accumulation, backend-appropriate input dtype
    scores = (
        jnp.einsum(
            "qkgd,skd->kgqs", _dotin(qg), _dotin(k),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    if slopes is not None:
        pos = (
            q_positions
            if q_positions is not None
            else jnp.arange(s, dtype=jnp.int32)
        )
        # bias[h, i, j] = -slope_h * (pos_i - pos_j)  (<= 0 in the causal region)
        rel = pos[:, None].astype(jnp.float32) - pos[None, :].astype(jnp.float32)
        scores = scores - slopes.reshape(kh, h // kh)[:, :, None, None] * rel[None, None]
    qi = jnp.arange(s)[:, None]
    ki = jnp.arange(s)[None, :]
    mask = ki <= qi  # causal
    if length is not None:
        mask = mask & (ki < length)
    probs = _softmax(scores, mask[None, None])
    out = jnp.einsum(
        "kgqs,skd->qkgd",
        _dotin(probs, v.dtype),
        _dotin(v),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(s, h, d).astype(q.dtype)


def split_cached_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k_cache: jnp.ndarray,  # [B, KH, D, S] OLD cache (read-only, new tokens NOT written)
    v_cache: jnp.ndarray,  # [B, KH, D, S]
    k_new: jnp.ndarray,  # [B, T', KH, D] in-flight tokens' K (this step)
    v_new: jnp.ndarray,  # [B, T', KH, D]
    cache_lens: jnp.ndarray,  # [B] committed tokens per slot
    *,
    new_mask: Optional[jnp.ndarray] = None,  # [B, T, T'] bool; None => causal
    kv_mask: Optional[jnp.ndarray] = None,  # [B, T, S] mask over cache; None => committed prefix
    q_positions: Optional[jnp.ndarray] = None,  # [B, T] absolute positions
    new_positions: Optional[jnp.ndarray] = None,  # [B, T'] (alibi; default = q_positions)
    slopes: Optional[jnp.ndarray] = None,  # [H]
    logit_softcap: Optional[float] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention of T in-flight tokens against (read-only cache) + (in-register new KV).

    TPU-native restructuring of :func:`cached_attention`: instead of scattering
    the new tokens' K/V into the cache *before* attending (which forces the
    whole cache through the layer scan as a carried, double-buffered value),
    the cache is consumed read-only and the in-flight tokens' K/V join the
    softmax in-register. One joint fp32 softmax over [cache | new] columns —
    numerically the same computation as the reference's fused
    update-then-attend kernels (inc_multihead_self_attention.cu:860,378), with
    the tree/causal structure expressed as the ``new_mask`` block
    (tree_inc_multihead_self_attention.cu's BitMask over in-flight tokens).

    The caller scatters ``k_new/v_new`` into the cache once per step *after*
    the layer scan (see decoder.forward_cached). The cache layout is
    [B, KH, D, S] (decoder.KVCache: zero-padding TPU tiling; D on sublanes /
    S on lanes makes the score contraction MXU-native).
    """
    b, t, h, d = q.shape
    s = k_cache.shape[3]
    tn = k_new.shape[1]
    kh = k_cache.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    # scores in f32 via MXU-native accumulation; the cache is NEVER cast
    # (an fp32 cast of the [B,KH,D,S] cache materializes a 2x copy per step)
    qg = _dotin(_group_query(q, kh), k_cache.dtype)  # [B, T, KH, G, D]
    sc = (
        jnp.einsum(
            "btkgd,bkds->bkgts", qg, _dotin(k_cache),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    sn = (
        jnp.einsum(
            "btkgd,bukd->bkgtu", qg, _dotin(k_new, k_cache.dtype),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    if logit_softcap:
        sc = jnp.tanh(sc / logit_softcap) * logit_softcap
        sn = jnp.tanh(sn / logit_softcap) * logit_softcap
    if slopes is not None:
        if q_positions is None:
            q_positions = cache_lens[:, None] + jnp.arange(t)[None, :]
        if new_positions is None:
            new_positions = q_positions
        kv_pos = jnp.arange(s, dtype=jnp.int32)
        rel_c = q_positions[:, :, None].astype(jnp.float32) - kv_pos[
            None, None, :
        ].astype(jnp.float32)  # [B, T, S]
        rel_n = q_positions[:, :, None].astype(jnp.float32) - new_positions[
            :, None, :
        ].astype(jnp.float32)  # [B, T, T']
        sl = slopes.reshape(kh, h // kh)[None, :, :, None, None]
        sc = sc - sl * rel_c[:, None, None]
        sn = sn - sl * rel_n[:, None, None]

    if kv_mask is None:
        kv_pos = jnp.arange(s)[None, None, :]
        kv_mask = jnp.broadcast_to(
            kv_pos < cache_lens[:, None, None], (b, t, s)
        )
    if new_mask is None:
        new_mask = jnp.broadcast_to(
            jnp.tril(jnp.ones((t, tn), dtype=bool))[None], (b, t, tn)
        )

    # joint masked softmax over [cache | new]
    sc = jnp.where(kv_mask[:, None, None], sc, NEG_INF)
    sn = jnp.where(new_mask[:, None, None], sn, NEG_INF)
    m = jnp.maximum(
        jnp.max(sc, axis=-1, keepdims=True), jnp.max(sn, axis=-1, keepdims=True)
    )
    m = jax.lax.stop_gradient(m)
    ec = jnp.where(kv_mask[:, None, None], jnp.exp(sc - m), 0.0)
    en = jnp.where(new_mask[:, None, None], jnp.exp(sn - m), 0.0)
    denom = jnp.sum(ec, axis=-1, keepdims=True) + jnp.sum(
        en, axis=-1, keepdims=True
    )
    oc = jnp.einsum(
        "bkgts,bkds->btkgd", _dotin(ec, v_cache.dtype), _dotin(v_cache),
        preferred_element_type=jnp.float32,
    )
    on = jnp.einsum(
        "bkgtu,bukd->btkgd", _dotin(en, v_new.dtype), _dotin(v_new),
        preferred_element_type=jnp.float32,
    )
    # denom [B,KH,G,T,1] -> [B,T,KH,G,1] to divide the output layout
    out = (oc + on) / jnp.maximum(denom.transpose(0, 3, 1, 2, 4), 1e-30)
    return out.reshape(b, t, h, d).astype(q.dtype)


def cached_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k_cache: jnp.ndarray,  # [B, S, KH, D] (already containing the new tokens)
    v_cache: jnp.ndarray,  # [B, S, KH, D]
    cache_lens: jnp.ndarray,  # [B] number of committed tokens BEFORE this step
    *,
    tree_mask: Optional[jnp.ndarray] = None,  # [B, T, T] bool; None => causal in T
    kv_mask: Optional[jnp.ndarray] = None,  # [B, T, S] bool full mask override
    q_positions: Optional[jnp.ndarray] = None,  # [B, T] absolute positions (alibi)
    slopes: Optional[jnp.ndarray] = None,  # [H]
    logit_softcap: Optional[float] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention of T in-flight tokens per request against the KV cache.

    The T new tokens' K/V must already be written into the cache at positions
    ``cache_lens[b] + t``. Each query attends to (a) all committed cache
    positions ``< cache_lens[b]`` and (b) in-flight token t' where
    ``tree_mask[b, t, t']`` (tree-topology causal mask; defaults to the
    lower-triangular causal mask — the incremental-decoding case).
    When ``kv_mask`` is given it overrides (a)+(b) entirely — used by the
    speculative draft, whose tree tokens live at caller-chosen cache slots.

    Decode is T == 1; speculative tree verification is T == tree size with the
    BitMask-derived mask (reference batch_config.h:122-136).
    """
    b, t, h, d = q.shape
    s = k_cache.shape[1]
    kh = k_cache.shape[2]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    qg = _dotin(_group_query(q, kh), k_cache.dtype)  # [B, T, KH, G, D]

    scores = (
        jnp.einsum(
            "btkgd,bskd->bkgts", qg, _dotin(k_cache),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [B, KH, G, T, S]
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    if slopes is not None:
        if q_positions is None:
            q_positions = cache_lens[:, None] + jnp.arange(t)[None, :]
        kv_pos = jnp.arange(s, dtype=jnp.int32)
        rel = q_positions[:, :, None].astype(jnp.float32) - kv_pos[None, None, :].astype(
            jnp.float32
        )  # [B, T, S]
        bias = -slopes.reshape(kh, h // kh)[None, :, :, None, None] * rel[:, None, None]
        scores = scores + bias

    if kv_mask is not None:
        mask = kv_mask
    else:
        kv_pos = jnp.arange(s)[None, None, :]  # [1, 1, S]
        committed = kv_pos < cache_lens[:, None, None]  # [B, 1, S]
        committed = jnp.broadcast_to(committed, (b, t, s))

        if tree_mask is None:
            tree_mask = jnp.tril(jnp.ones((t, t), dtype=bool))[None]
            tree_mask = jnp.broadcast_to(tree_mask, (b, t, t))
        # in-flight token t' occupies cache slot cache_lens[b] + t';
        # mask[b, t_q, s] |= exists t' with slot(t') == s and tree_mask[b, t_q, t']
        inflight_slot = cache_lens[:, None] + jnp.arange(t)[None, :]  # [B, T']
        eq = (
            jnp.arange(s)[None, None, :, None] == inflight_slot[:, None, None, :]
        )  # [B,1,S,T']
        inflight = jnp.any(eq & tree_mask[:, :, None, :], axis=-1)  # [B, T, S]
        mask = committed | inflight  # [B, T, S]

    probs = _softmax(scores, mask[:, None, None])  # [B, KH, G, T, S]
    out = jnp.einsum(
        "bkgts,bskd->btkgd", _dotin(probs, v_cache.dtype), _dotin(v_cache),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, h, d).astype(q.dtype)
