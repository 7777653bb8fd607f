"""Generic spec-driven decoder-only transformer (TPU-native, functional).

This single module replaces the reference's per-architecture C++ graph builders
(/root/reference/inference/models/{llama,opt,falcon,mpt,starcoder,mixtral}.cc):
every architecture difference is a static field of :class:`ModelSpec`, so one
``jax.lax.scan`` over stacked per-layer parameters covers the whole model zoo.
Scanning over stacked layers keeps the HLO small and compile times flat in
depth — the idiomatic XLA replacement for the reference's per-op Legion task
launches.

Two execution modes:

- **self-attention mode** (``forward``): training forward / full-prompt
  prefill. Causal attention within the [B, T] window; optionally returns the
  per-layer K/V so the serving engine can insert them into the KV cache
  (reference prompt phase: inc_multihead_self_attention.cu:99).
- **cached mode** (``forward_cached``): incremental decode (T=1) and
  speculative tree verification (T=tree size, tree-topology mask). New tokens'
  K/V are scattered into the cache at ``cache_lens[b] + t`` and attention runs
  against the full cache (reference decode kernel:
  inc_multihead_self_attention.cu:378; tree verify:
  tree_inc_multihead_self_attention.cu).

Parameters are a nested dict of arrays; every per-layer leaf is stacked on a
leading ``[num_layers, ...]`` axis (see ``models/params.py``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from flexflow_tpu.ops import activations as act_lib
from flexflow_tpu.ops import attention as attn_lib
from flexflow_tpu.ops import norms
from flexflow_tpu.ops import rotary
from flexflow_tpu.quant.weight_only import as_array
from flexflow_tpu.specs import ModelSpec

Params = Dict[str, Any]

# When set (via manual_tp_axis), row-parallel projections psum over this mesh
# axis — used by code running INSIDE a fully-manual shard_map (the pipeline
# executor), where GSPMD no longer inserts the TP collectives automatically.
# None (the default) leaves reduction to GSPMD. This mirrors the reference's
# explicit AllReduce parallel op (src/parallel_ops/kernels/allreduce_kernels.cu:37)
# vs its implicit Legion data movement.
_MANUAL_TP_AXIS: Any = None


import contextlib


@contextlib.contextmanager
def manual_tp_axis(axis: str):
    global _MANUAL_TP_AXIS
    prev = _MANUAL_TP_AXIS
    _MANUAL_TP_AXIS = axis
    try:
        yield
    finally:
        _MANUAL_TP_AXIS = prev


def _tp_reduce(x):
    if _MANUAL_TP_AXIS is not None:
        return jax.lax.psum(x, _MANUAL_TP_AXIS)
    return x


def _use_pallas_decode_attention() -> bool:
    """Pallas decode kernel gate: enabled by FFConfig and only on real TPU
    (the jnp path is the reference implementation everywhere else)."""
    from flexflow_tpu.config import config

    if not config.use_pallas_attention:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas_prefill() -> bool:
    from flexflow_tpu.config import config

    if not config.use_pallas_prefill:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas_quant_matmul() -> bool:
    from flexflow_tpu.config import config

    if not config.use_pallas_quant_matmul:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class KVCache(NamedTuple):
    """Per-request-slot KV cache, stacked over layers.

    Layout [L, B, KH, D, S] — chosen for TPU memory tiling: the minor dims
    (D, S) align with the (8, 128) tile (head_dim is a multiple of 8, seq a
    multiple of 128), so the multi-GB cache carries ZERO padding. The naive
    [L, B, S, KH, D] layout pads (KH, D) planes up to 2.7x (measured: a
    2.25 GiB cache ballooned to 6 GiB) and forces XLA compress/uncompress
    copies. Decode attention also prefers it: per (request, head) the score
    contraction is q [G, D] x k [D, S] — D on sublanes, S on lanes, exactly
    what the MXU wants.

    Request slots on axis 1 (the reference allocates per-request contiguous
    KV regions inside the attention op's Meta struct,
    inc_multihead_self_attention.cu:1621+); sharded over KH (TP axis) on a mesh.
    """

    k: jnp.ndarray  # [L, B, KH, D, S]
    v: jnp.ndarray  # [L, B, KH, D, S]

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[4]

    @property
    def num_slots(self) -> int:
        return self.k.shape[1]


def init_kv_cache(
    spec: ModelSpec, num_slots: int, max_seq_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (spec.num_layers, num_slots, spec.num_kv_heads, spec.head_dim, max_seq_len)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _norm(spec: ModelSpec, h, scale, bias):
    if spec.norm == "rmsnorm":
        return norms.rms_norm(h, scale, spec.norm_eps)
    return norms.layer_norm(h, scale, bias, spec.norm_eps)


import dataclasses as _dc


@_dc.dataclass
class IndexedQuant:
    """A layer's view into a STACKED [L, ...] QuantizedArray.

    Built inside the layer scan from (closure-captured stacked carriers,
    traced loop index): the Pallas kernel streams the layer's weight tiles
    straight out of the stacked HBM buffer via a scalar-prefetch index map
    (quant_matmul_indexed). A scan-sliced QuantizedArray operand would be
    MATERIALIZED by XLA before the pallas_call — one ~50 MB copy per 7B
    INT4 layer, ~5 ms of a 14.7 ms decode step (probe_r5_decattr,
    2026-08-22). Not a pytree: lives only inside traced layer bodies.
    """

    qa: object  # stacked QuantizedArray (batch_dims == 1)
    idx: jnp.ndarray  # traced scalar layer index

    def slice(self):
        """Per-layer QuantizedArray (dynamic-index fallback paths)."""
        return jax.tree_util.tree_map(lambda a: a[self.idx], self.qa)


def _linear(x, w, b=None):
    """x [..., D] @ w [D, ...out] (+ b). Contracts the last axis of x.

    ``w`` may be a QuantizedArray (INT8/INT4 weight-only): with
    FFConfig.use_pallas_quant_matmul on TPU the Pallas fused dequant-matmul
    kernel runs (packed weights stream HBM->VMEM and dequantize in-register);
    otherwise XLA fuses the dequantize into the dot. An IndexedQuant routes
    to the layer-indexed kernel over the stacked carriers (no slice copy).
    """
    from flexflow_tpu.quant.weight_only import QuantizedArray

    if isinstance(w, IndexedQuant):
        if _use_pallas_quant_matmul():
            from flexflow_tpu.ops.pallas.quant_matmul import (
                quant_matmul_indexed,
            )

            out = quant_matmul_indexed(x, w.qa, w.idx)
        else:
            out = jnp.tensordot(x, as_array(w.slice()), axes=1)
    elif isinstance(w, QuantizedArray) and _use_pallas_quant_matmul():
        from flexflow_tpu.ops.pallas.quant_matmul import quant_matmul

        out = quant_matmul(x, w)
    else:
        out = jnp.tensordot(x, as_array(w), axes=1)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _apply_lora(p: Params, mod: str, x, out):
    """Add a per-request-routed LoRA delta to a projection output.

    Reference: src/ops/lora_linear.cc inference path (xA.B scaled, adapter
    chosen per request via BatchConfig PEFT fields). ``p["_lora"]`` holds the
    per-layer adapter stacks [N, D_in, r]/[N, r, D_out]; ``p["_lora_onehot"]``
    [B, N] routes each request slot to its adapter (all-zero row = no LoRA).
    """
    lora = p.get("_lora")
    if not lora or mod not in lora:
        return out
    a = lora[mod]["a"].astype(jnp.float32)  # [N, D_in, r]
    b = lora[mod]["b"].astype(jnp.float32)  # [N, r, D_out]
    onehot = p["_lora_onehot"].astype(jnp.float32)  # [B, N]
    scale = p["_lora_scale"]
    bsz = onehot.shape[0]
    xf = x.reshape(bsz, -1, a.shape[1]).astype(jnp.float32)  # [B, T, D_in]
    a_sel = jnp.einsum("bn,ndr->bdr", onehot, a)
    b_sel = jnp.einsum("bn,nrf->brf", onehot, b)
    delta = jnp.einsum("btr,brf->btf", jnp.einsum("btd,bdr->btr", xf, a_sel), b_sel)
    return out + (delta * scale).reshape(out.shape).astype(out.dtype)


def _qkv(spec: ModelSpec, p: Params, h):
    """Project h [B,T,D] -> q [B,T,H,Dh], k/v [B,T,KH,Dh].

    With a fused ``wqkv`` carrier (FFConfig.fuse_qkv, built by
    :func:`fuse_qkv_params`) the three projections run as ONE matmul /
    quant-matmul kernel call over [D, H+2KH, Dh] and split after — the
    reference fuses the same three GEMMs into one qkv_proj launch
    (inc_multihead_self_attention.cu:1112 computes QKV in a single
    cublas call). Per-module LoRA deltas still route on the slices."""
    if "wqkv" in p:
        out = _linear(h, p["wqkv"], p.get("bqkv"))
        hh, kh = spec.num_heads, spec.num_kv_heads
        q, k, v = jnp.split(out, [hh, hh + kh], axis=-2)
        return (
            _apply_lora(p, "wq", h, q),
            _apply_lora(p, "wk", h, k),
            _apply_lora(p, "wv", h, v),
        )
    q = _apply_lora(p, "wq", h, _linear(h, p["wq"], p.get("bq")))
    k = _apply_lora(p, "wk", h, _linear(h, p["wk"], p.get("bk")))
    v = _apply_lora(p, "wv", h, _linear(h, p["wv"], p.get("bv")))
    return q, k, v


def fuse_qkv_params(spec: ModelSpec, params: Params) -> Params:
    """Build fused projection carriers for the serving path.

    Concatenates wq|wk|wv into ``wqkv`` [L, D, H+2KH, Dh] (and wg|wu into
    ``wgu`` [L, D, 2F] for gated-act dense FFNs) so decode pays one kernel
    call per group instead of three/two. Column-exact: each output column's
    weights (quantized groups included — weight_only.concat_rest) are
    bit-identical to the unfused carrier's; only the matmul's fp accumulation
    blocking may differ, which is why engines flip the WHOLE model at build
    time rather than per-call. Single-mesh engines only: TP would shard the
    fused head axis obliviously to the q/k/v block boundaries.
    MoE FFNs (expert-stacked wg/wu) and partially-biased projections are
    left unfused."""
    from flexflow_tpu.quant.weight_only import QuantizedArray, concat_rest

    layers = dict(params["layers"])
    hh, kh, dh = spec.num_heads, spec.num_kv_heads, spec.head_dim

    def _fusable(names):
        ws = [layers.get(n) for n in names]
        if any(w is None for w in ws):
            return None
        if all(isinstance(w, QuantizedArray) for w in ws):
            # full concat_rest compatibility set (ADVICE r4): mismatched
            # dtype/batch/contract dims fall back to split carriers instead
            # of tripping concat_rest's assertions at engine build
            if len({(w.bits, w.group_size, w.dtype, w.batch_dims,
                     w.contract_dims, w.d_contract) for w in ws}) == 1:
                return ws
            return None
        if not any(isinstance(w, QuantizedArray) for w in ws):
            return ws
        return None  # mixed quantized/plain: keep split carriers

    ws = _fusable(["wq", "wk", "wv"])
    biases = [layers.get(n) for n in ("bq", "bk", "bv")]
    bias_ok = all(b is None for b in biases) or all(
        b is not None for b in biases)
    if ws is not None and bias_ok:
        if isinstance(ws[0], QuantizedArray):
            layers["wqkv"] = concat_rest(ws, (hh + 2 * kh, dh))
        else:
            layers["wqkv"] = jnp.concatenate(ws, axis=2)
        if biases[0] is not None:
            layers["bqkv"] = jnp.concatenate(biases, axis=1)
        for n in ("wq", "wk", "wv", "bq", "bk", "bv"):
            layers.pop(n, None)

    if spec.moe is None and spec.act == "silu_gate":
        ws = _fusable(["wg", "wu"])
        if ws is not None and layers.get("bu") is None:
            f = spec.intermediate_size
            if isinstance(ws[0], QuantizedArray):
                layers["wgu"] = concat_rest(ws, (2 * f,))
            else:
                layers["wgu"] = jnp.concatenate(ws, axis=-1)
            for n in ("wg", "wu"):
                layers.pop(n, None)

    return {**params, "layers": layers}


def _mlp(spec: ModelSpec, p: Params, h):
    if spec.moe is not None:
        return _moe_mlp(spec, p, h)
    if spec.act == "silu_gate":
        if "wgu" in p:
            # fused gate|up carrier (FFConfig.fuse_qkv): one kernel call
            gu = _linear(h, p["wgu"])
            gate, up = jnp.split(gu, 2, axis=-1)
            gate = _apply_lora(p, "wg", h, gate)
            up = _apply_lora(p, "wu", h, up)
        else:
            gate = _apply_lora(p, "wg", h, _linear(h, p["wg"]))
            up = _apply_lora(p, "wu", h, _linear(h, p["wu"]))
        inner = act_lib.sigmoid_silu_multi(gate, up)
    else:
        inner = act_lib.get_activation(spec.act)(
            _apply_lora(p, "wu", h, _linear(h, p["wu"], p.get("bu")))
        )
    # down-proj is row-parallel under TP: reduce partials before the bias.
    # Route through _linear so a quantized wd hits the Pallas fused dequant
    # kernel — the as_array path left wd on XLA's int4 unpack (measured
    # 22 GB/s packed vs 478 for the kernel: ~1 ms/layer, the single largest
    # chunk of the round-3 "INT4 slower than INT8" decode regression)
    out = _tp_reduce(_linear(inner, p["wd"]))
    if p.get("bd") is not None:
        out = out + p["bd"]
    return _apply_lora(p, "wd", inner, out.astype(h.dtype))


def _moe_mlp(spec: ModelSpec, p: Params, h):
    """Mixtral-style sparse MoE FFN.

    Mirrors reference inference/models/mixtral.cc:232-300 (gate -> softmax ->
    top-k -> renormalize -> per-expert SwiGLU -> weighted combine) and the
    GroupBy/Experts/Aggregate op trio (src/ops/{group_by,experts,aggregate}.cu).

    v1 computes all experts densely and combines with routing weights (exact,
    E/top_k x FLOP overhead); the ragged-dot token-dispatch fast path replaces
    this on the serving path.
    """
    moe = spec.moe
    router_logits = jnp.tensordot(
        h.astype(jnp.float32), p["router"].astype(jnp.float32), axes=1
    )  # [B, T, E]
    if moe.impl == "ragged":
        from flexflow_tpu.ops.moe import moe_ffn_ragged

        b, t, d = h.shape
        out = moe_ffn_ragged(
            h.reshape(b * t, d),
            router_logits.reshape(b * t, -1),
            as_array(p["wg"]), as_array(p["wu"]), as_array(p["wd"]),
            moe.top_k,
        )
        return _tp_reduce(out.reshape(b, t, d)).astype(h.dtype)
    probs = jax.nn.softmax(router_logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, moe.top_k)  # [B, T, K]
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    # dense per-expert weights: [B, T, E]
    combine = jnp.sum(
        jax.nn.one_hot(topi, moe.num_experts, dtype=jnp.float32)
        * topw[..., None],
        axis=-2,
    )
    gate = jnp.einsum("btd,edf->btef", h, as_array(p["wg"]))
    up = jnp.einsum("btd,edf->btef", h, as_array(p["wu"]))
    inner = act_lib.sigmoid_silu_multi(gate, up)
    out = _tp_reduce(jnp.einsum("btef,efd->bted", inner, as_array(p["wd"])))
    return jnp.sum(out * combine[..., None].astype(out.dtype), axis=-2)


def _attn_out(spec: ModelSpec, p: Params, a):
    """a [B,T,H,Dh] -> [B,T,D] via wo [H,Dh,D] (row-parallel under TP)."""
    from flexflow_tpu.quant.weight_only import QuantizedArray

    wo = p["wo"]
    if isinstance(wo, IndexedQuant):
        if _use_pallas_quant_matmul():
            from flexflow_tpu.ops.pallas.quant_matmul import (
                quant_matmul_indexed,
            )

            out = _tp_reduce(quant_matmul_indexed(a, wo.qa, wo.idx))
            if p.get("bo") is not None:
                out = out + p["bo"]
            return _apply_lora(p, "wo", a, out.astype(a.dtype))
        wo = wo.slice()
    if isinstance(wo, QuantizedArray) and _use_pallas_quant_matmul():
        # fused dequant kernel (contract_dims=2 flattens [H, Dh]); the
        # einsum path dequantized wo through XLA's slow int4 unpack
        from flexflow_tpu.ops.pallas.quant_matmul import quant_matmul

        out = _tp_reduce(quant_matmul(a, wo))
    else:
        out = _tp_reduce(jnp.einsum(
            "bthd,hdo->bto", a, as_array(wo).reshape(
                a.shape[-2], a.shape[-1], -1)))
    if p.get("bo") is not None:
        out = out + p["bo"]
    return _apply_lora(p, "wo", a, out.astype(a.dtype))


def _split_indexed_quant(spec: ModelSpec, layers: Params, offload: bool):
    """Split a stacked layers dict into (scan-sliced rest, closure-captured
    quantized carriers) for the layer-indexed kernel path.

    Quantized [L, ...] leaves are kept WHOLE and consumed via IndexedQuant
    inside the scan body — a scan-sliced operand feeding a pallas_call is
    materialized by XLA first (~50 MB copy per 7B INT4 layer; see
    IndexedQuant). Offload keeps everything in xs (weights stream per layer
    by design); MoE expert stacks (batch_dims == 2) stay scan-sliced.
    On non-Pallas backends the IndexedQuant fallback dynamic-indexes inside
    the body — numerically identical to scan slicing.
    """
    from flexflow_tpu.quant.weight_only import QuantizedArray

    if offload or not isinstance(layers, dict):
        return layers, {}
    quant = {
        k: v for k, v in layers.items()
        if isinstance(v, QuantizedArray) and v.batch_dims == 1
        and v.q.ndim == 3 and v.q.shape[0] == spec.num_layers
    }
    if not quant:
        return layers, {}
    rest = {k: v for k, v in layers.items() if k not in quant}
    return rest, quant


def _layer(spec: ModelSpec, p: Params, h, attend):
    """One decoder layer; ``attend(q, k, v) -> (attn_out, aux)`` is injected."""
    if spec.parallel_attn:
        ln_attn = _norm(spec, h, p["ln1_scale"], p.get("ln1_bias"))
        if spec.num_ln_in_parallel_attn == 2:
            ln_mlp = _norm(spec, h, p["ln2_scale"], p.get("ln2_bias"))
        else:
            ln_mlp = ln_attn
        a, aux = attend(*_qkv(spec, p, ln_attn))
        out = h + _attn_out(spec, p, a) + _mlp(spec, p, ln_mlp)
        return out, aux
    if spec.pre_norm:
        ln1 = _norm(spec, h, p["ln1_scale"], p.get("ln1_bias"))
        a, aux = attend(*_qkv(spec, p, ln1))
        h = h + _attn_out(spec, p, a)
        ln2 = _norm(spec, h, p["ln2_scale"], p.get("ln2_bias"))
        return h + _mlp(spec, p, ln2), aux
    # post-LN (OPT with do_layer_norm_before=False)
    a, aux = attend(*_qkv(spec, p, h))
    h = _norm(spec, h + _attn_out(spec, p, a), p["ln1_scale"], p.get("ln1_bias"))
    return _norm(spec, h + _mlp(spec, p, h), p["ln2_scale"], p.get("ln2_bias")), aux


def _embed(spec: ModelSpec, params: Params, tokens, positions):
    h = jnp.take(params["embed_tokens"], tokens, axis=0)
    if spec.embed_scale != 1.0:
        h = h * spec.embed_scale
    if spec.pos == "learned":
        h = h + jnp.take(
            params["embed_pos"], positions + spec.learned_pos_offset, axis=0
        )
    return h


def _unembed(spec: ModelSpec, params: Params, h):
    from flexflow_tpu.quant.weight_only import QuantizedArray

    if spec.final_norm:
        h = _norm(spec, h, params["final_norm_scale"], params.get("final_norm_bias"))
    w = params.get("lm_head")
    if isinstance(w, QuantizedArray) and _use_pallas_quant_matmul():
        # fused dequant kernel with f32 logits out (skips the XLA int4
        # unpack that cost ~3.4 ms/step at 7B — 42x the packed-bytes floor)
        from flexflow_tpu.ops.pallas.quant_matmul import quant_matmul

        logits = quant_matmul(h, w, out_dtype=jnp.float32)
    else:
        w = params["embed_tokens"].T if w is None else as_array(w)  # tied
        # f32 logits via MXU-native accumulation; casting w to fp32 first
        # would materialize an fp32 copy of the [D, V] head every decode
        # step (on non-TPU backends _dotin falls back to the f32-cast form)
        logits = jnp.tensordot(
            attn_lib._dotin(h), attn_lib._dotin(w, h.dtype), axes=1,
            preferred_element_type=jnp.float32,
        )
    if params.get("lm_head_bias") is not None:
        logits = logits + params["lm_head_bias"].astype(jnp.float32)
    return logits


def _stream_in(layer_params, shardings=None):
    """Host->device transfer of one layer's params (CPU offload).

    Reference --offload (config.h:189, file_loader.cc offload paths): weights
    resident in host RAM, paged per-op onto the device. TPU-native form:
    stacked layer params live in ``pinned_host`` memory and each scan
    iteration streams its slice in with a memory-kind transfer, which XLA's
    latency-hiding scheduler overlaps with the previous layer's compute.

    ``shardings``: per-leaf device-memory NamedShardings for the SLICED
    layer (mesh + offload — the round-3 jaxlib RET_CHECK in
    spmd_partitioner is fixed on this version); None = single device.
    """
    if shardings is not None:
        return jax.device_put(layer_params, shardings)
    dev = jax.sharding.SingleDeviceSharding(
        jax.devices()[0], memory_kind="device"
    )
    return jax.tree.map(lambda a: jax.device_put(a, dev), layer_params)


def _alibi_slopes(spec: ModelSpec):
    if spec.pos != "alibi":
        return None
    return attn_lib.alibi_slopes(spec.num_heads, spec.alibi_max_bias)


def _maybe_rope(spec: ModelSpec, q, k, positions):
    if spec.pos != "rope":
        return q, k
    cos, sin = rotary.rope_cos_sin(
        positions, spec.head_dim, spec.rope_theta, spec.rope_scaling
    )
    return rotary.apply_rope(q, cos, sin), rotary.apply_rope(k, cos, sin)


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------


def forward(
    spec: ModelSpec,
    params: Params,
    tokens: jnp.ndarray,  # [B, T] int32
    positions: jnp.ndarray,  # [B, T] int32 absolute positions
    *,
    lengths: Optional[jnp.ndarray] = None,  # [B] valid lengths (mask padding)
    return_kv: bool = False,
    lora: Optional[Params] = None,  # {mod: {"a": [L,N,Din,r], "b": [L,N,r,Dout]}}
    adapter_onehot: Optional[jnp.ndarray] = None,  # [B, N]
    lora_scale: float = 1.0,
    flash: bool = False,  # caller asserts positions == arange (prefill path)
    offload: bool = False,  # params["layers"] resident in pinned_host memory
    offload_shardings=None,  # per-layer-slice device shardings (mesh offload)
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Self-attention forward (training / prefill).

    Returns ``(logits [B, T, V] fp32, kv)`` where ``kv`` is
    ``(k [L, B, T, KH, D], v [L, B, T, KH, D])`` when ``return_kv`` else None.

    ``flash=True`` routes attention through the Pallas flash-prefill kernel
    (ops/pallas/flash_prefill.py) when eligible. Only valid when positions
    are the standard ``arange(T)`` causal layout (the serving prefill path —
    the caller vouches); ineligible specs (alibi, softcap) or backends fall
    back to the XLA path transparently. Inference-only (no VJP).
    """
    b, t = tokens.shape
    slopes = _alibi_slopes(spec)
    h = _embed(spec, params, tokens, positions)

    use_flash = (
        flash
        and slopes is None
        and spec.attn_logit_softcap is None
        # B=1 admission crossover vs XLA is ~S=512 on v5e (smaller buckets
        # are fixed-overhead-dominated); batched/longer prefill wins up to 60x
        and t >= 512
        and _use_pallas_prefill()
    )

    qi = positions[:, :, None]  # [B, T, 1]
    ki = positions[:, None, :]  # [B, 1, T]
    mask = ki <= qi
    if lengths is not None:
        mask = mask & (jnp.arange(t)[None, None, :] < lengths[:, None, None])

    def attend(q, k, v):
        q, k = _maybe_rope(spec, q, k, positions)
        if use_flash:
            from flexflow_tpu.ops.pallas.flash_prefill import flash_prefill

            flens = (
                lengths
                if lengths is not None
                else jnp.full((b,), t, jnp.int32)
            )
            out = flash_prefill(q, k, v.astype(q.dtype), flens)
            return out, ((k, v) if return_kv else 0)
        out = attn_lib.cached_attention(
            q,
            k,
            v,
            cache_lens=jnp.zeros((b,), jnp.int32),
            tree_mask=mask,
            q_positions=positions,
            slopes=slopes,
            logit_softcap=spec.attn_logit_softcap,
        )
        return out, ((k, v) if return_kv else 0)

    rest_layers, quant_stacked = _split_indexed_quant(
        spec, params["layers"], offload)

    def body(h, xs):
        if lora is not None:
            idx, layer_params, lora_layer = xs
            if offload:
                layer_params = _stream_in(layer_params, offload_shardings)
            layer_params = {
                **layer_params,
                "_lora": lora_layer,
                "_lora_onehot": adapter_onehot,
                "_lora_scale": lora_scale,
            }
        else:
            idx, layer_params = xs
            if offload:
                layer_params = _stream_in(layer_params, offload_shardings)
        if quant_stacked:
            layer_params = {
                **layer_params,
                **{k: IndexedQuant(v, idx) for k, v in quant_stacked.items()},
            }
        h, aux = _layer(spec, layer_params, h, attend)
        return h, aux

    idxs = jnp.arange(spec.num_layers, dtype=jnp.int32)
    xs = (idxs, rest_layers) if lora is None else (idxs, rest_layers, lora)
    h, kv = jax.lax.scan(body, h, xs)
    logits = _unembed(spec, params, h)
    return logits, (kv if return_kv else None)


def forward_cached(
    spec: ModelSpec,
    params: Params,
    tokens: jnp.ndarray,  # [B, T] int32 (T=1 for decode, T=tree for verify)
    cache: KVCache,
    cache_lens: jnp.ndarray,  # [B] committed tokens per slot
    *,
    positions: Optional[jnp.ndarray] = None,  # [B, T]; default lens + arange(T)
    tree_mask: Optional[jnp.ndarray] = None,  # [B, T, T] mask among in-flight tokens
    kv_mask: Optional[jnp.ndarray] = None,  # [B, T, S] mask over the EXISTING cache
    write_start: Optional[jnp.ndarray] = None,  # [B] cache window start (default lens)
    write_cache: bool = True,  # False: return the new KV instead of writing it
    extra_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # [L,B,E,KH,D] x2
    extra_mask: Optional[jnp.ndarray] = None,  # [B, T, E] mask over extra_kv
    extra_positions: Optional[jnp.ndarray] = None,  # [B, E] abs pos (alibi)
    lora: Optional[Params] = None,
    adapter_onehot: Optional[jnp.ndarray] = None,  # [B, N]
    lora_scale: float = 1.0,
    offload: bool = False,  # params["layers"] resident in pinned_host memory
    offload_shardings=None,  # per-layer-slice device shardings (mesh offload)
    attn_window: Optional[int] = None,  # static: attend only cache[..., :w]
):
    """Cached decode / tree-verify forward. Returns (logits [B,T,V] fp32, cache).

    ``attn_window`` (static, host-chosen bucket >= max(cache_lens)): attention
    reads only the first ``attn_window`` cache positions instead of the full
    allocated [S] window — the length-aware analog of the reference sizing its
    attention kernel launch to BatchConfig's per-request ``num_tokens``
    (inc_multihead_self_attention.cu:378 streams only committed entries).
    Bit-exact: positions >= cache_lens are where-masked to exactly-zero
    softmax contributions either way, so any window covering every row's
    committed prefix yields identical outputs while skipping the HBM read of
    the dead tail. Cache WRITES (commit windows) always target the full cache.

    ``write_cache=False`` skips the cache update and instead returns
    ``(logits, (k_new, v_new))`` with the new tokens' per-layer KV stacked
    [L, B, T, KH, D] — the in-register tree-KV flow of the fused speculative
    iteration (tree KV never touches the multi-GB cache until acceptance).
    ``extra_kv``/``extra_mask`` append additional in-register KV columns to
    the attention (earlier tree depths during draft expansion).

    TPU-native memory structure: the KV cache is consumed READ-ONLY inside the
    layer scan (sliced per layer as scan xs — no carried copy, so XLA never
    double-buffers the multi-GB cache), attention runs against
    (cache | in-register new KV) via :func:`attn_lib.split_cached_attention`,
    and the new tokens' K/V for all layers are scattered into the cache in ONE
    donated update after the scan. This replaces the reference's
    update-then-attend kernel pair (inc_multihead_self_attention.cu:860,378)
    without materializing a second cache copy.

    Masks (reference BatchConfig::BitMask semantics, batch_config.h:122-136):
    - ``tree_mask`` [B, T, T]: which in-flight tokens each in-flight token
      attends (default: causal — the incremental-decode / chunked-prefill case;
      identity for draft beams; ancestor matrix for tree verification).
    - ``kv_mask`` [B, T, S]: which cache positions are visible (default: the
      committed prefix ``< cache_lens``; the speculative draft adds
      earlier-depth tree slots).
    """
    b, t = tokens.shape
    slopes = _alibi_slopes(spec)
    if positions is None:
        positions = cache_lens[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    h = _embed(spec, params, tokens, positions)

    if write_start is None:
        write_start = cache_lens
    # out-of-range window columns simply drop (commit_kv_windows writes only
    # in-range positions); clipping the start would shift the window onto
    # earlier committed positions instead
    write_start = jnp.clip(write_start.astype(jnp.int32), 0, cache.max_seq_len)

    if (
        attn_window is not None
        and kv_mask is not None
        and kv_mask.shape[-1] > attn_window
    ):
        # kv_mask columns beyond the window are over never-visible positions
        kv_mask = kv_mask[..., :attn_window]

    # explicit joint mask over [extra | in-flight] when extra KV is appended
    if extra_kv is not None:
        base_mask = (
            tree_mask
            if tree_mask is not None
            else jnp.broadcast_to(
                jnp.tril(jnp.ones((t, t), dtype=bool))[None], (b, t, t)
            )
        )
        assert extra_mask is not None, "extra_kv requires extra_mask"
        joint_mask = jnp.concatenate([extra_mask, base_mask], axis=-1)
        if slopes is not None:
            # ALiBi: extra columns must carry their OWN absolute positions —
            # defaulting them to the query position zeroes their distance
            # bias (horizon steps / tree slots sat at rel=0; wrong tokens)
            assert extra_positions is not None, (
                "extra_kv under alibi requires extra_positions"
            )
            joint_positions = jnp.concatenate(
                [extra_positions.astype(jnp.int32), positions], axis=1
            )
        else:
            joint_positions = None
    else:
        joint_mask = tree_mask
        joint_positions = None

    rest_layers, quant_stacked = _split_indexed_quant(
        spec, params["layers"], offload)

    def body(h, xs):
        if lora is not None:
            idx, layer_params, ck_l, cv_l, ex, lora_layer = xs
            if offload:
                layer_params = _stream_in(layer_params, offload_shardings)
            layer_params = {
                **layer_params,
                "_lora": lora_layer,
                "_lora_onehot": adapter_onehot,
                "_lora_scale": lora_scale,
            }
        else:
            idx, layer_params, ck_l, cv_l, ex = xs
            if offload:
                layer_params = _stream_in(layer_params, offload_shardings)
        if quant_stacked:
            layer_params = {
                **layer_params,
                **{k: IndexedQuant(v, idx) for k, v in quant_stacked.items()},
            }

        def attend(q, k, v):
            q, k = _maybe_rope(spec, q, k, positions)
            # cast once to the cache dtype so in-register scores match a
            # write-then-read of the cache bit-for-bit
            kc = k.astype(ck_l.dtype)
            vc = v.astype(cv_l.dtype)
            if attn_window is not None and attn_window < ck_l.shape[-1]:
                # static trailing-axis slice fuses into the attention read:
                # HBM traffic for the cache drops to the window fraction
                ck_a = ck_l[..., :attn_window]
                cv_a = cv_l[..., :attn_window]
            else:
                ck_a, cv_a = ck_l, cv_l
            if (
                t == 1
                and tree_mask is None
                and kv_mask is None
                and extra_kv is None
                and slopes is None
                and spec.attn_logit_softcap is None
                # measured regime gate (benchmarks/bench_gqa_decode.py,
                # on-chip 2026-08-21): the kernel wins G>=8 at moderate S
                # (llama3-70B-class G=8 S=1024: 1.46x over XLA, ~990 GB/s
                # KV); it LOSES G<8 (0.5x) and MQA-short (0.18x), and the
                # whole-[KH,D,S]-slice load overflows scoped VMEM at
                # S=4096. XLA stays the path everywhere else.
                and spec.num_heads // max(spec.num_kv_heads, 1) >= 8
                and cache_lens is not None
                and ck_a.shape[-1] <= 2048
                and _use_pallas_decode_attention()
            ):
                from flexflow_tpu.ops.pallas.decode_attention import (
                    decode_attention,
                )

                out = decode_attention(
                    q[:, 0], ck_a, cv_a, kc[:, 0], vc[:, 0], cache_lens
                )[:, None]
                return out, (kc, vc)
            if ex is not None:
                ek_l, ev_l = ex  # [B, E, KH, D]
                kn = jnp.concatenate([ek_l, kc], axis=1)
                vn = jnp.concatenate([ev_l, vc], axis=1)
            else:
                kn, vn = kc, vc
            out = attn_lib.split_cached_attention(
                q,
                ck_a,
                cv_a,
                kn,
                vn,
                cache_lens,
                new_mask=joint_mask,
                kv_mask=kv_mask,
                q_positions=positions,
                new_positions=joint_positions,
                slopes=slopes,
                logit_softcap=spec.attn_logit_softcap,
            )
            return out, (kc, vc)

        h, (kc, vc) = _layer(spec, layer_params, h, attend)
        return h, (kc, vc)

    ex_xs = extra_kv if extra_kv is not None else None
    idxs = jnp.arange(spec.num_layers, dtype=jnp.int32)
    xs = (
        (idxs, rest_layers, cache.k, cache.v, ex_xs)
        if lora is None
        else (idxs, rest_layers, cache.k, cache.v, ex_xs, lora)
    )
    h, (k_new, v_new) = jax.lax.scan(body, h, xs)
    if not write_cache:
        # in-register tree flow: hand the [L, B, T, KH, D] new KV back to the
        # caller (fused speculative iteration commits accepted columns only)
        return _unembed(spec, params, h), (k_new, v_new)
    upd_k = k_new.transpose(0, 1, 3, 4, 2).astype(cache.k.dtype)  # [L,B,KH,D,T]
    upd_v = v_new.transpose(0, 1, 3, 4, 2).astype(cache.v.dtype)
    ck, cv = commit_kv_windows(cache.k, cache.v, upd_k, upd_v, write_start)
    logits = _unembed(spec, params, h)
    return logits, KVCache(k=ck, v=cv)


def commit_kv_windows(
    ck: jnp.ndarray,  # [L, B, KH, D, S] cache K (donated by the caller's jit)
    cv: jnp.ndarray,  # [L, B, KH, D, S]
    upd_k: jnp.ndarray,  # [L, NB, KH, D, T] per-row update windows
    upd_v: jnp.ndarray,  # [L, NB, KH, D, T]
    starts: jnp.ndarray,  # [NB] seq offset per row
    slot_idx: Optional[jnp.ndarray] = None,  # [NB] cache row per update; -1 = skip row
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write per-request KV windows into the cache — ALL slots in one pass.

    Replaces the reference's ``update_kv_cache_kernel``
    (inc_multihead_self_attention.cu:860). Update row i lands at
    ``cache[:, slot_idx[i], :, :, starts[i]:starts[i]+T]``.

    TPU formulation (measured alternatives, in order of failure):

    - ``lax.scatter``: XLA materializes the whole cache in a padded internal
      layout (2.7x — a 2.25 GiB cache gained a 6 GiB temp copy; OOM source).
    - per-slot ``dynamic_update_slice`` at a *dynamic lane offset* (S is the
      minor/lane axis): XLA cannot prove tile locality, so EVERY slot's DUS
      rewrites the full cache — B x full-cache traffic (measured 1.5 ms per
      DUS on a 0.6 GB cache = 25 ms/step at B=8, whether unrolled or inside
      a ``fori_loop``). Unrolled it also blows up compile time linearly in
      batch (>13 minutes at B=128).
    - THIS: one shift-one-hot einsum + select over the whole cache. The
      windows are placed by contracting the update's T axis against a
      [B, T, S] position one-hot (an MXU matmul — exact: each output column
      sums exactly one 0/1-weighted term, and a bf16->f32->bf16 roundtrip of
      a bf16 value is the identity), then a single ``where`` keeps old
      columns outside each row's window. Exactly 2x cache traffic per
      commit regardless of batch, compile O(1) in batch, no scatter.
      Amortized over an n-step decode horizon: 2/n cache passes per token.

    Rows with ``slot_idx[i] == -1`` write nothing (used by batched-admission
    padding rows). At most one row may target a given live slot. A window
    extending past the cache end writes only its in-range columns (the
    position one-hot simply has no match beyond S-1) — clipping the START
    instead would shift the whole window and overwrite earlier positions
    (round-3 review: the chunked-prefill final partial window hit this).
    """
    l, b, kh, d, s = ck.shape
    t = upd_k.shape[4]
    starts = jnp.clip(starts.astype(jnp.int32), 0, s)
    # Exactness: bf16 values survive the one-hot matmul bit-for-bit at any
    # precision (0/1 weights; bf16->f32->bf16 roundtrip is identity). For
    # wider dtypes the TPU's default one-pass bf16 MXU decomposition WOULD
    # truncate the cache values, so force the exact multi-pass mode there.
    prec = (
        None if upd_k.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    )
    if slot_idx is not None:
        # gather update rows into slot order (row2slot is 0/1, exact)
        row2slot = (
            slot_idx.astype(jnp.int32)[:, None] == jnp.arange(b)[None, :]
        )  # [R, B]
        sel = row2slot.astype(upd_k.dtype)
        upd_k = jnp.einsum(
            "lrkdt,rb->lbkdt", upd_k, sel,
            preferred_element_type=upd_k.dtype, precision=prec,
        )
        upd_v = jnp.einsum(
            "lrkdt,rb->lbkdt", upd_v, sel,
            preferred_element_type=upd_v.dtype, precision=prec,
        )
        written = jnp.any(row2slot, axis=0)  # [B] slot receives a window
        slot_starts = jnp.sum(jnp.where(row2slot, starts[:, None], 0), axis=0)
    else:
        written = None
        slot_starts = starts

    pos = jnp.arange(s, dtype=jnp.int32)[None, None, :]  # [1, 1, S]
    # [B, T, S] one-hot: column s holds update element t iff s == start_b + t
    onehot = pos == (slot_starts[:, None] + jnp.arange(t)[None, :])[:, :, None]
    covered = jnp.any(onehot, axis=1)  # [B, S]
    if written is not None:
        covered = covered & written[:, None]
    oh = onehot.astype(upd_k.dtype)
    shifted_k = jnp.einsum(
        "lbkdt,bts->lbkds", upd_k, oh,
        preferred_element_type=upd_k.dtype, precision=prec,
    )
    shifted_v = jnp.einsum(
        "lbkdt,bts->lbkds", upd_v, oh,
        preferred_element_type=upd_v.dtype, precision=prec,
    )
    cmask = covered[None, :, None, None, :]
    return (
        jnp.where(cmask, shifted_k.astype(ck.dtype), ck),
        jnp.where(cmask, shifted_v.astype(cv.dtype), cv),
    )


def insert_kv(
    cache: KVCache,
    k_new: jnp.ndarray,  # [L, T, KH, D] (single request prefill output)
    v_new: jnp.ndarray,
    slot: jnp.ndarray,  # scalar int32 request slot
    length: jnp.ndarray,  # scalar int32 valid token count (<= T)
) -> KVCache:
    """Insert a prefill's per-layer KV into a request slot at positions [0, T).

    Padding beyond ``length`` is written too (harmless — masked by cache_lens).
    Mirrors the reference's prompt-phase ``update_kv_cache_kernel``
    (inc_multihead_self_attention.cu:860).
    """
    del length
    zero = jnp.int32(0)
    # [L, T, KH, D] -> [L, 1, KH, D, T] (cache layout [L, B, KH, D, S])
    k_t = k_new.transpose(0, 2, 3, 1)[:, None].astype(cache.k.dtype)
    v_t = v_new.transpose(0, 2, 3, 1)[:, None].astype(cache.v.dtype)
    k = jax.lax.dynamic_update_slice(cache.k, k_t, (zero, slot, zero, zero, zero))
    v = jax.lax.dynamic_update_slice(cache.v, v_t, (zero, slot, zero, zero, zero))
    return KVCache(k=k, v=v)
