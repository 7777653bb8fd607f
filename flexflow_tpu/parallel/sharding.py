"""Sharding rules: parameter / KV-cache / activation PartitionSpecs.

TPU-native replacement for the reference's parallel-op insertion
(/root/reference/src/runtime/model.cc:3472-3614 ``create_operators_from_layers``,
which deterministically inserts Repartition/Replicate/AllReduce/Combine graph
nodes for tensor parallelism). Here the same Megatron-style layout is expressed
as GSPMD shardings and XLA inserts the collectives:

- column-parallel QKV / gate / up projections: output-feature (head) axis on
  ``model`` — the reference's partitioned-weight ``ParallelDim.degree``;
- row-parallel o-proj / down-proj: input-feature axis on ``model``; XLA emits
  the psum that the reference materializes as an AllReduce op
  (model.cc:3526-3551, parallel_ops/kernels/allreduce_kernels.cu:37);
- attention head sharding across TP ranks (``num_q_heads / tp_degree`` per
  shard, reference inc_multihead_self_attention.cc) — here the [H] axes of
  q/k/v/o and of the KV cache carry the ``model`` axis;
- vocab-parallel embedding + lm_head;
- batch (request slots) on ``data``.

Axes whose size doesn't divide the mesh axis (e.g. MQA's single KV head under
TP>1) fall back to replication — the reference handles MQA the same way by
replicating KV heads across shards.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flexflow_tpu.models.decoder import KVCache
from flexflow_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from flexflow_tpu.specs import ModelSpec

# Logical sharding of every parameter leaf: map leaf name -> PartitionSpec
# (leading [L] layer-stack axis is never sharded; "pipe" stage slicing of the
# layer axis is handled by the pipeline executor, not by GSPMD).
_LAYER_RULES: Dict[str, P] = {
    "ln1_scale": P(None, None),
    "ln1_bias": P(None, None),
    "ln2_scale": P(None, None),
    "ln2_bias": P(None, None),
    # attention: column-parallel on heads
    "wq": P(None, None, MODEL_AXIS, None),
    "bq": P(None, MODEL_AXIS, None),
    "wk": P(None, None, MODEL_AXIS, None),
    "bk": P(None, MODEL_AXIS, None),
    "wv": P(None, None, MODEL_AXIS, None),
    "bv": P(None, MODEL_AXIS, None),
    # o-proj: row-parallel on heads (psum inserted by XLA)
    "wo": P(None, MODEL_AXIS, None, None),
    "bo": P(None, None),
    # mlp: column-parallel up/gate, row-parallel down
    "wg": P(None, None, MODEL_AXIS),
    "wu": P(None, None, MODEL_AXIS),
    "bu": P(None, MODEL_AXIS),
    "wd": P(None, MODEL_AXIS, None),
    "bd": P(None, None),
    # MoE (expert weights carry an extra [E] axis; TP within each expert)
    "router": P(None, None, None),
}

_MOE_RULES: Dict[str, P] = {
    "wg": P(None, None, None, MODEL_AXIS),
    "wu": P(None, None, None, MODEL_AXIS),
    "wd": P(None, None, MODEL_AXIS, None),
}

# Expert parallelism: shard the expert axis [L, E, ...] over the model axis
# instead of TP-within-expert (reference EP: GroupBy/Experts/Aggregate place
# expert FFNs on distinct devices, examples/cpp/mixture_of_experts +
# inference/models/mixtral.cc:232-320; GSPMD inserts the token movement).
_MOE_EP_RULES: Dict[str, P] = {
    "wg": P(None, MODEL_AXIS, None, None),
    "wu": P(None, MODEL_AXIS, None, None),
    "wd": P(None, MODEL_AXIS, None, None),
}

_TOP_RULES: Dict[str, P] = {
    "embed_tokens": P(MODEL_AXIS, None),  # vocab-parallel
    "embed_pos": P(None, None),
    "final_norm_scale": P(None),
    "final_norm_bias": P(None),
    "lm_head": P(None, MODEL_AXIS),  # vocab-parallel logits
    "lm_head_bias": P(MODEL_AXIS),
}


def _divisible(shape, spec: P, mesh: Mesh) -> P:
    """Downgrade sharded dims to replicated when size % axis_size != 0."""
    fixed = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            fixed.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        fixed.append(axis if dim % size == 0 and dim >= size else None)
    return P(*fixed)


# QuantizedArray carriers are [L, contract(/2), rest] (q) and
# [L, groups, rest] (scale/offset): the same column/row-parallel layout applies
# to all three (groups follow the contraction axis).
_QUANT_RULES: Dict[str, P] = {
    "wq": P(None, None, MODEL_AXIS),
    "wk": P(None, None, MODEL_AXIS),
    "wv": P(None, None, MODEL_AXIS),
    "wo": P(None, MODEL_AXIS, None),
    "wg": P(None, None, MODEL_AXIS),
    "wu": P(None, None, MODEL_AXIS),
    "wd": P(None, MODEL_AXIS, None),
    "lm_head": P(None, MODEL_AXIS),
}


def param_shardings(
    spec: ModelSpec, params: Any, mesh: Mesh, *,
    expert_parallel: bool = False, hybrid_ffn: bool = False,
) -> Any:
    """Pytree of NamedShardings matching the params pytree (quantized or not).

    ``expert_parallel=True`` shards MoE expert stacks over the model axis
    (EP) instead of TP-within-expert.

    ``hybrid_ffn=True`` is the per-op machine-view hybrid (reference Unity
    searches per-op parallelization degrees, substitution.cc:1920): the FFN
    shards over BOTH ("model", "data") while attention stays on "model"
    alone — the GSPMD expression of "TP degree 2 for attention, 4 for FFN".
    The win case is small-batch serving where attention TP is capped by
    kv_heads but the data axis would otherwise idle (batch not divisible
    -> replicated)."""
    moe = spec.moe is not None
    if hybrid_ffn:
        ffn_ax = (MODEL_AXIS, DATA_AXIS)
        hybrid_layer = {
            "wg": P(None, None, ffn_ax),
            "wu": P(None, None, ffn_ax),
            "bu": P(None, ffn_ax),
            "wd": P(None, ffn_ax, None),
        }
        hybrid_quant = {
            "wg": P(None, None, ffn_ax),
            "wu": P(None, None, ffn_ax),
            "wd": P(None, ffn_ax, None),
        }

    def leaf_spec(path, leaf) -> NamedSharding:
        # string dict keys only: QuantizedArray carriers flatten with
        # FlattenedIndexKey entries whose ``.key`` is an INT — naively taking
        # the last ``.key`` made the rule lookup miss and silently REPLICATE
        # every quantized weight under TP (caught by the 70B HBM-fit test)
        names = [
            p.key for p in path
            if hasattr(p, "key") and isinstance(getattr(p, "key"), str)
        ]
        name = names[-1] if names else ""
        inside_quant = bool(path) and not (
            hasattr(path[-1], "key") and isinstance(path[-1].key, str)
        )
        if inside_quant:
            rules_q = dict(_QUANT_RULES)
            if hybrid_ffn:
                rules_q.update(hybrid_quant)
            ps = rules_q.get(name, P())
            # MoE expert carriers have an extra [E] axis after [L]
            if leaf.ndim == len(ps) + 1 and "layers" in names:
                ps = P(ps[0], None, *tuple(ps)[1:])
            elif name == "lm_head" and leaf.ndim == len(ps):
                pass
        elif "layers" in names:
            rules = dict(_LAYER_RULES)
            if moe:
                rules.update(_MOE_EP_RULES if expert_parallel else _MOE_RULES)
            if hybrid_ffn and not moe:
                rules.update(hybrid_layer)
            ps = rules.get(name, P())
        else:
            ps = _TOP_RULES.get(name, P())
        return NamedSharding(mesh, _divisible(leaf.shape, ps, mesh))

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def kv_cache_sharding(mesh: Mesh, cache: Optional[KVCache] = None):
    """KV cache [L, B, KH, D, S]: slots on "data", KV heads on "model", and
    sequence on "seq" (context parallelism — EXCEEDS the reference, which has
    no CP at all, SURVEY.md §5.7). With seq > 1 GSPMD turns the decode
    attention into a seq-sharded flash-decoding pattern (sharded scores +
    collective softmax reductions); the overlapped ppermute ring for long
    prefill lives in ops/ring_attention.py."""
    from flexflow_tpu.parallel.mesh import SEQ_AXIS

    ps = P(None, DATA_AXIS, MODEL_AXIS, None, SEQ_AXIS)
    if cache is not None:
        ps = _divisible(cache.k.shape, ps, mesh)
    return NamedSharding(mesh, ps)


def batch_sharding(mesh: Mesh, ndim: int = 1):
    """[B, ...] host batch arrays: request slots on the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *(None,) * (ndim - 1)))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(
    spec: ModelSpec, params: Any, mesh: Mesh, *,
    expert_parallel: bool = False, hybrid_ffn: bool = False,
) -> Any:
    """Place a params pytree onto the mesh with TP (or EP) shardings."""
    return jax.device_put(
        params,
        param_shardings(spec, params, mesh, expert_parallel=expert_parallel,
                        hybrid_ffn=hybrid_ffn),
    )
