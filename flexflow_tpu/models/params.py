"""Parameter pytree construction: random init + HuggingFace state-dict import.

TPU-native replacement for the reference's FileDataLoader
(/root/reference/src/runtime/file_loader.cc) and the per-model
``convert_hf_model`` weight-name mappings
(/root/reference/python/flexflow/serve/models/llama.py:274-285 etc.).
Instead of converting HF checkpoints to per-tensor binary files and loading
them with one Legion task per weight, we map HF tensors directly into the
stacked-layer pytree consumed by ``models/decoder.py`` (every per-layer leaf
stacked on a leading [num_layers, ...] axis so the model can ``lax.scan``).

Weight layout notes: torch ``nn.Linear.weight`` is [out, in]; our layout is
[in, ...out] (contraction on the leading axis) so imports transpose once.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.specs import ModelSpec

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# random init (Glorot for matmuls, like reference src/runtime/initializer.cc)
# ---------------------------------------------------------------------------


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-initialized parameter pytree (for tests and benches)."""
    keys = iter(jax.random.split(key, 64))

    def glorot(shape, fan_in, fan_out):
        scale = np.sqrt(2.0 / (fan_in + fan_out))
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    d, hh, kh, dh, f, ll = (
        spec.hidden_size,
        spec.num_heads,
        spec.num_kv_heads,
        spec.head_dim,
        spec.intermediate_size,
        spec.num_layers,
    )
    layers: Params = {
        "ln1_scale": jnp.ones((ll, d), dtype),
        "ln2_scale": jnp.ones((ll, d), dtype),
        "wq": glorot((ll, d, hh, dh), d, hh * dh),
        "wk": glorot((ll, d, kh, dh), d, kh * dh),
        "wv": glorot((ll, d, kh, dh), d, kh * dh),
        "wo": glorot((ll, hh, dh, d), hh * dh, d),
    }
    if spec.norm == "layernorm" and spec.norm_bias:
        layers["ln1_bias"] = jnp.zeros((ll, d), dtype)
        layers["ln2_bias"] = jnp.zeros((ll, d), dtype)
    if spec.qkv_bias:
        layers["bq"] = jnp.zeros((ll, hh, dh), dtype)
        layers["bk"] = jnp.zeros((ll, kh, dh), dtype)
        layers["bv"] = jnp.zeros((ll, kh, dh), dtype)
    if spec.attn_out_bias:
        layers["bo"] = jnp.zeros((ll, d), dtype)
    if spec.moe is not None:
        e = spec.moe.num_experts
        layers["router"] = glorot((ll, d, e), d, e)
        layers["wg"] = glorot((ll, e, d, f), d, f)
        layers["wu"] = glorot((ll, e, d, f), d, f)
        layers["wd"] = glorot((ll, e, f, d), f, d)
    else:
        if spec.act == "silu_gate":
            layers["wg"] = glorot((ll, d, f), d, f)
        layers["wu"] = glorot((ll, d, f), d, f)
        layers["wd"] = glorot((ll, f, d), f, d)
        if spec.mlp_bias:
            layers["bu"] = jnp.zeros((ll, f), dtype)
            layers["bd"] = jnp.zeros((ll, d), dtype)

    params: Params = {
        "embed_tokens": glorot((spec.vocab_size, d), spec.vocab_size, d),
        "layers": layers,
        "final_norm_scale": jnp.ones((d,), dtype),
    }
    if spec.norm == "layernorm" and spec.norm_bias:
        params["final_norm_bias"] = jnp.zeros((d,), dtype)
    if spec.pos == "learned":
        params["embed_pos"] = glorot(
            (spec.max_position_embeddings + spec.learned_pos_offset, d),
            spec.max_position_embeddings,
            d,
        )
    if not spec.tie_word_embeddings:
        params["lm_head"] = glorot((d, spec.vocab_size), d, spec.vocab_size)
    return params


# ---------------------------------------------------------------------------
# HF state-dict import
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


class _SD:
    """State-dict accessor tolerating presence/absence of prefixes."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = sd

    def __contains__(self, name: str) -> bool:
        return name in self.sd

    def get(self, name: str) -> np.ndarray:
        return _np(self.sd[name])

    def opt(self, name: str) -> Optional[np.ndarray]:
        return _np(self.sd[name]) if name in self.sd else None


def _stack(per_layer: list) -> Params:
    """List of per-layer dicts -> dict of stacked arrays (shared keys only)."""
    keys = per_layer[0].keys()
    out = {}
    for k in keys:
        if per_layer[0][k] is None:
            continue
        out[k] = np.stack([p[k] for p in per_layer])
    return out


def _lin(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> ours [in, out]."""
    return np.ascontiguousarray(w.T)


def _heads(w: np.ndarray, n: int, dh: int) -> np.ndarray:
    """torch proj weight [n*dh, in] -> ours [in, n, dh]."""
    return np.ascontiguousarray(w.reshape(n, dh, -1).transpose(2, 0, 1))


def convert_hf_state_dict(
    spec: ModelSpec, sd: Mapping[str, Any], dtype=jnp.float32
) -> Params:
    """Convert a HuggingFace state dict into the decoder's parameter pytree."""
    s = _SD(sd)
    conv = {
        "LlamaForCausalLM": _convert_llama,
        "MixtralForCausalLM": _convert_mixtral,
        "OPTForCausalLM": _convert_opt,
        "FalconForCausalLM": _convert_falcon,
        "MPTForCausalLM": _convert_mpt,
        "GPTBigCodeForCausalLM": _convert_gptbigcode,
    }[spec.arch]
    params = conv(spec, s)
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def _convert_llama(spec: ModelSpec, s: _SD) -> Params:
    d, hh, kh, dh = spec.hidden_size, spec.num_heads, spec.num_kv_heads, spec.head_dim
    layers = []
    for i in range(spec.num_layers):
        p = f"model.layers.{i}."
        layer = {
            "ln1_scale": s.get(p + "input_layernorm.weight"),
            "ln2_scale": s.get(p + "post_attention_layernorm.weight"),
            "wq": _heads(s.get(p + "self_attn.q_proj.weight"), hh, dh),
            "wk": _heads(s.get(p + "self_attn.k_proj.weight"), kh, dh),
            "wv": _heads(s.get(p + "self_attn.v_proj.weight"), kh, dh),
            "wo": s.get(p + "self_attn.o_proj.weight").T.reshape(hh, dh, d),
            "wg": _lin(s.get(p + "mlp.gate_proj.weight")),
            "wu": _lin(s.get(p + "mlp.up_proj.weight")),
            "wd": _lin(s.get(p + "mlp.down_proj.weight")),
        }
        if spec.qkv_bias:
            layer["bq"] = s.get(p + "self_attn.q_proj.bias").reshape(hh, dh)
            layer["bk"] = s.get(p + "self_attn.k_proj.bias").reshape(kh, dh)
            layer["bv"] = s.get(p + "self_attn.v_proj.bias").reshape(kh, dh)
        layers.append(layer)
    params: Params = {
        "embed_tokens": s.get("model.embed_tokens.weight"),
        "layers": _stack(layers),
        "final_norm_scale": s.get("model.norm.weight"),
    }
    if not spec.tie_word_embeddings and "lm_head.weight" in s:
        params["lm_head"] = _lin(s.get("lm_head.weight"))
    return params


def _convert_mixtral(spec: ModelSpec, s: _SD) -> Params:
    d, hh, kh, dh = spec.hidden_size, spec.num_heads, spec.num_kv_heads, spec.head_dim
    e = spec.moe.num_experts
    layers = []
    for i in range(spec.num_layers):
        p = f"model.layers.{i}."
        m = p + "block_sparse_moe."
        layers.append(
            {
                "ln1_scale": s.get(p + "input_layernorm.weight"),
                "ln2_scale": s.get(p + "post_attention_layernorm.weight"),
                "wq": _heads(s.get(p + "self_attn.q_proj.weight"), hh, dh),
                "wk": _heads(s.get(p + "self_attn.k_proj.weight"), kh, dh),
                "wv": _heads(s.get(p + "self_attn.v_proj.weight"), kh, dh),
                "wo": s.get(p + "self_attn.o_proj.weight").T.reshape(hh, dh, d),
                "router": _lin(s.get(m + "gate.weight")),
                "wg": np.stack([_lin(s.get(m + f"experts.{j}.w1.weight")) for j in range(e)]),
                "wd": np.stack([_lin(s.get(m + f"experts.{j}.w2.weight")) for j in range(e)]),
                "wu": np.stack([_lin(s.get(m + f"experts.{j}.w3.weight")) for j in range(e)]),
            }
        )
    params: Params = {
        "embed_tokens": s.get("model.embed_tokens.weight"),
        "layers": _stack(layers),
        "final_norm_scale": s.get("model.norm.weight"),
    }
    if not spec.tie_word_embeddings and "lm_head.weight" in s:
        params["lm_head"] = _lin(s.get("lm_head.weight"))
    return params


def _convert_opt(spec: ModelSpec, s: _SD) -> Params:
    d, hh, dh = spec.hidden_size, spec.num_heads, spec.head_dim
    layers = []
    for i in range(spec.num_layers):
        p = f"model.decoder.layers.{i}."
        layers.append(
            {
                "ln1_scale": s.get(p + "self_attn_layer_norm.weight"),
                "ln1_bias": s.get(p + "self_attn_layer_norm.bias"),
                "ln2_scale": s.get(p + "final_layer_norm.weight"),
                "ln2_bias": s.get(p + "final_layer_norm.bias"),
                "wq": _heads(s.get(p + "self_attn.q_proj.weight"), hh, dh),
                "bq": s.get(p + "self_attn.q_proj.bias").reshape(hh, dh),
                "wk": _heads(s.get(p + "self_attn.k_proj.weight"), hh, dh),
                "bk": s.get(p + "self_attn.k_proj.bias").reshape(hh, dh),
                "wv": _heads(s.get(p + "self_attn.v_proj.weight"), hh, dh),
                "bv": s.get(p + "self_attn.v_proj.bias").reshape(hh, dh),
                "wo": s.get(p + "self_attn.out_proj.weight").T.reshape(hh, dh, d),
                "bo": s.get(p + "self_attn.out_proj.bias"),
                "wu": _lin(s.get(p + "fc1.weight")),
                "bu": s.get(p + "fc1.bias"),
                "wd": _lin(s.get(p + "fc2.weight")),
                "bd": s.get(p + "fc2.bias"),
            }
        )
    params: Params = {
        "embed_tokens": s.get("model.decoder.embed_tokens.weight"),
        "embed_pos": s.get("model.decoder.embed_positions.weight"),
        "layers": _stack(layers),
    }
    if "model.decoder.final_layer_norm.weight" in s:
        params["final_norm_scale"] = s.get("model.decoder.final_layer_norm.weight")
        params["final_norm_bias"] = s.get("model.decoder.final_layer_norm.bias")
    if not spec.tie_word_embeddings and "lm_head.weight" in s:
        params["lm_head"] = _lin(s.get("lm_head.weight"))
    return params


def _convert_falcon(spec: ModelSpec, s: _SD) -> Params:
    d, hh, kh, dh = spec.hidden_size, spec.num_heads, spec.num_kv_heads, spec.head_dim
    new_arch = spec.num_ln_in_parallel_attn == 2
    layers = []
    for i in range(spec.num_layers):
        p = f"transformer.h.{i}."
        qkv = s.get(p + "self_attention.query_key_value.weight")  # [(..), d]
        if new_arch:
            # interleaved per kv-group: [KH, q_per_kv + 2, Dh, d]
            g = spec.q_per_kv
            w = qkv.reshape(kh, g + 2, dh, d)
            wq = w[:, :g].reshape(kh * g, dh, d)
            wk = w[:, g]
            wv = w[:, g + 1]
        elif kh == 1:
            wq = qkv[: hh * dh].reshape(hh, dh, d)
            wk = qkv[hh * dh : (hh + 1) * dh].reshape(1, dh, d)
            wv = qkv[(hh + 1) * dh :].reshape(1, dh, d)
        else:
            w = qkv.reshape(hh, 3, dh, d)
            wq, wk, wv = w[:, 0], w[:, 1], w[:, 2]
        layer = {
            "wq": np.ascontiguousarray(wq.transpose(2, 0, 1)),
            "wk": np.ascontiguousarray(wk.transpose(2, 0, 1)),
            "wv": np.ascontiguousarray(wv.transpose(2, 0, 1)),
            "wo": s.get(p + "self_attention.dense.weight").T.reshape(hh, dh, d),
            "wu": _lin(s.get(p + "mlp.dense_h_to_4h.weight")),
            "wd": _lin(s.get(p + "mlp.dense_4h_to_h.weight")),
        }
        if new_arch:
            layer["ln1_scale"] = s.get(p + "ln_attn.weight")
            layer["ln1_bias"] = s.get(p + "ln_attn.bias")
            layer["ln2_scale"] = s.get(p + "ln_mlp.weight")
            layer["ln2_bias"] = s.get(p + "ln_mlp.bias")
        else:
            layer["ln1_scale"] = s.get(p + "input_layernorm.weight")
            layer["ln1_bias"] = s.get(p + "input_layernorm.bias")
        layers.append(layer)
    params: Params = {
        "embed_tokens": s.get("transformer.word_embeddings.weight"),
        "layers": _stack(layers),
        "final_norm_scale": s.get("transformer.ln_f.weight"),
        "final_norm_bias": s.get("transformer.ln_f.bias"),
    }
    if "lm_head.weight" in s:
        params["lm_head"] = _lin(s.get("lm_head.weight"))
    return params


def _convert_mpt(spec: ModelSpec, s: _SD) -> Params:
    d, hh, dh = spec.hidden_size, spec.num_heads, spec.head_dim
    layers = []
    for i in range(spec.num_layers):
        p = f"transformer.blocks.{i}."
        qkv = s.get(p + "attn.Wqkv.weight")  # [3d, d] fused q|k|v
        layers.append(
            {
                "ln1_scale": s.get(p + "norm_1.weight"),
                "ln2_scale": s.get(p + "norm_2.weight"),
                "wq": qkv[:d].reshape(hh, dh, d).transpose(2, 0, 1),
                "wk": qkv[d : 2 * d].reshape(hh, dh, d).transpose(2, 0, 1),
                "wv": qkv[2 * d :].reshape(hh, dh, d).transpose(2, 0, 1),
                "wo": s.get(p + "attn.out_proj.weight").T.reshape(hh, dh, d),
                "wu": _lin(s.get(p + "ffn.up_proj.weight")),
                "wd": _lin(s.get(p + "ffn.down_proj.weight")),
            }
        )
    return {
        "embed_tokens": s.get("transformer.wte.weight"),
        "layers": _stack(layers),
        "final_norm_scale": s.get("transformer.norm_f.weight"),
    }


def _convert_gptbigcode(spec: ModelSpec, s: _SD) -> Params:
    d, hh, kh, dh = spec.hidden_size, spec.num_heads, spec.num_kv_heads, spec.head_dim
    layers = []
    for i in range(spec.num_layers):
        p = f"transformer.h.{i}."
        cattn_w = s.get(p + "attn.c_attn.weight")  # [d + 2*kh*dh, d]
        cattn_b = s.get(p + "attn.c_attn.bias")
        layers.append(
            {
                "ln1_scale": s.get(p + "ln_1.weight"),
                "ln1_bias": s.get(p + "ln_1.bias"),
                "ln2_scale": s.get(p + "ln_2.weight"),
                "ln2_bias": s.get(p + "ln_2.bias"),
                "wq": cattn_w[:d].reshape(hh, dh, d).transpose(2, 0, 1),
                "bq": cattn_b[:d].reshape(hh, dh),
                "wk": cattn_w[d : d + kh * dh].reshape(kh, dh, d).transpose(2, 0, 1),
                "bk": cattn_b[d : d + kh * dh].reshape(kh, dh),
                "wv": cattn_w[d + kh * dh :].reshape(kh, dh, d).transpose(2, 0, 1),
                "bv": cattn_b[d + kh * dh :].reshape(kh, dh),
                "wo": s.get(p + "attn.c_proj.weight").T.reshape(hh, dh, d),
                "bo": s.get(p + "attn.c_proj.bias"),
                "wu": _lin(s.get(p + "mlp.c_fc.weight")),
                "bu": s.get(p + "mlp.c_fc.bias"),
                "wd": _lin(s.get(p + "mlp.c_proj.weight")),
                "bd": s.get(p + "mlp.c_proj.bias"),
            }
        )
    return {
        "embed_tokens": s.get("transformer.wte.weight"),
        "embed_pos": s.get("transformer.wpe.weight"),
        "layers": _stack(layers),
        "final_norm_scale": s.get("transformer.ln_f.weight"),
        "final_norm_bias": s.get("transformer.ln_f.bias"),
    }
