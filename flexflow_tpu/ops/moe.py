"""MoE token dispatch: sort-based grouped-GEMM expert computation.

TPU-native equivalent of the reference's GroupBy/Experts/Aggregate op trio
(/root/reference/src/ops/{group_by,experts,aggregate}.cu — scatter tokens to
per-expert buffers with a capacity factor, fused batched expert FFN via
grouped GEMM, weighted gather-combine). Here the dispatch is a sort by expert
id and the grouped GEMM is ``jax.lax.ragged_dot`` (MXU-native ragged matmul),
with NO capacity-factor token dropping — every routed token is computed
(exact, unlike the reference's alpha-capacity drops). This is also the
design answer to the reference's RecompileState-driven adaptive expert
capacity (recompile.h:26-40): with no drops there is nothing to adapt on
the serving path; training flows that DO want mid-run reconfiguration get
the bucketed analog in utils/recompile.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flexflow_tpu.ops import activations as act_lib


def route_topk(router_logits: jnp.ndarray, top_k: int):
    """Softmax -> top-k -> renormalize (reference gate semantics /
    HF Mixtral). Returns (weights [N, K], expert_ids [N, K])."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, top_k)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    return topw, topi


def moe_ffn_ragged(
    x: jnp.ndarray,  # [N, D] flattened tokens
    router_logits: jnp.ndarray,  # [N, E]
    wg: jnp.ndarray,  # [E, D, F] gate (silu path)
    wu: jnp.ndarray,  # [E, D, F] up
    wd: jnp.ndarray,  # [E, F, D] down
    top_k: int,
) -> jnp.ndarray:
    """SwiGLU expert FFN with sort-based dispatch + ragged grouped GEMMs."""
    n, d = x.shape
    e = router_logits.shape[-1]
    topw, topi = route_topk(router_logits, top_k)  # [N, K]

    # expand each token K times, sort by destination expert (GroupBy)
    flat_expert = topi.reshape(-1)  # [N*K]
    flat_weight = topw.reshape(-1)  # [N*K]
    order = jnp.argsort(flat_expert)  # stable dispatch order
    token_idx = jnp.arange(n * top_k, dtype=jnp.int32)[order] // top_k
    x_sorted = x[token_idx]  # [N*K, D]
    group_sizes = jnp.bincount(flat_expert, length=e)  # [E]

    # Experts: grouped GEMMs on the MXU
    gate = jax.lax.ragged_dot(x_sorted, wg, group_sizes)
    up = jax.lax.ragged_dot(x_sorted, wu, group_sizes)
    inner = act_lib.sigmoid_silu_multi(gate, up)
    out_sorted = jax.lax.ragged_dot(inner, wd, group_sizes)  # [N*K, D]

    # Aggregate: unsort + weighted combine back per token
    w_sorted = flat_weight[order].astype(out_sorted.dtype)
    contrib = out_sorted * w_sorted[:, None]
    out = jnp.zeros((n, d), out_sorted.dtype).at[token_idx].add(contrib)
    return out
