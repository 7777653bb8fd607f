"""Model architecture specifications.

A :class:`ModelSpec` is the single source of truth describing a decoder-only
transformer family. One generic TPU-native decoder (``models/decoder.py``)
consumes the spec; per-architecture differences (norm type, position encoding,
attention variant, activation, MoE) are static fields so everything stays
shape-static under ``jax.jit``.

Capability parity with the reference model zoo
(/root/reference/inference/models/{llama,opt,falcon,mpt,starcoder,mixtral}.cc):
each ``from_hf_config`` branch mirrors the corresponding ``create_*_model``
graph builder, but the architecture here is a spec-driven functional model
rather than a per-arch C++ graph construction.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional


@dataclasses.dataclass(frozen=True)
class MoESpec:
    """Mixture-of-experts routing configuration (Mixtral).

    Mirrors reference inference/models/mixtral.cc:232-300 (gate -> softmax ->
    top-k -> per-expert SwiGLU -> weighted combine).
    """

    num_experts: int
    top_k: int
    # Router logits are computed in fp32 for numerical parity with HF.
    router_fp32: bool = True
    # "dense": all-experts einsum masked by routing weights (exact, E/k x FLOPs)
    # "ragged": sort-based dispatch + lax.ragged_dot grouped GEMMs (serving path)
    impl: str = "dense"


@dataclasses.dataclass(frozen=True)
class RopeScaling:
    """Llama3-style rope scaling (reference inc_multihead_self_attention.cu:666)."""

    rope_type: str  # "linear" | "llama3" | "dynamic"
    factor: float
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static description of a decoder-only transformer architecture."""

    arch: str  # HF architecture string, e.g. "LlamaForCausalLM"
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    max_position_embeddings: int = 2048

    # --- normalization ---
    norm: str = "rmsnorm"  # "rmsnorm" | "layernorm"
    norm_eps: float = 1e-5
    norm_bias: bool = False  # layernorm bias
    # OPT: do_layer_norm_before=False puts LN after the block (post-LN).
    pre_norm: bool = True
    # Final norm applied before lm_head.
    final_norm: bool = True

    # --- position encoding ---
    pos: str = "rope"  # "rope" | "learned" | "alibi" | "none"
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None
    # OPT's learned position embedding starts at offset 2.
    learned_pos_offset: int = 0
    alibi_max_bias: float = 8.0  # MPT alibi_bias_max

    # --- attention ---
    qkv_bias: bool = False
    attn_out_bias: bool = False
    # Falcon-style: attention and MLP read the same normed input and their
    # outputs are summed into one residual add.
    parallel_attn: bool = False
    # Falcon parallel-attn models with a single input layernorm.
    num_ln_in_parallel_attn: int = 1
    qk_layernorm: bool = False
    attn_logit_softcap: Optional[float] = None

    # --- mlp ---
    act: str = "silu_gate"  # "silu_gate" | "gelu" | "gelu_new" | "relu"
    mlp_bias: bool = False
    moe: Optional[MoESpec] = None

    # --- embeddings / head ---
    tie_word_embeddings: bool = False
    embed_scale: float = 1.0
    # OPT projects word embeddings to a different hidden dim (word_embed_proj_dim);
    # unsupported dims are rejected in from_hf_config (uncommon in served models).
    lm_head_bias: bool = False

    bos_token_id: Optional[int] = None
    eos_token_id: Any = None  # int or list

    @property
    def q_per_kv(self) -> int:
        return self.num_heads // self.num_kv_heads

    def eos_ids(self) -> tuple:
        if self.eos_token_id is None:
            return ()
        if isinstance(self.eos_token_id, (list, tuple)):
            return tuple(self.eos_token_id)
        return (self.eos_token_id,)


def _rope_scaling_from_hf(d: Optional[dict]) -> Optional[RopeScaling]:
    if not d:
        return None
    rope_type = d.get("rope_type", d.get("type", "linear"))
    if rope_type == "default":
        return None
    return RopeScaling(
        rope_type=rope_type,
        factor=float(d.get("factor", 1.0)),
        low_freq_factor=float(d.get("low_freq_factor", 1.0)),
        high_freq_factor=float(d.get("high_freq_factor", 4.0)),
        original_max_position_embeddings=int(
            d.get("original_max_position_embeddings", 8192)
        ),
    )


def from_hf_config(cfg: dict) -> ModelSpec:
    """Build a ModelSpec from a HuggingFace ``config.json`` dict.

    Architecture detection mirrors the reference CLI
    (/root/reference/inference/incr_decoding/incr_decoding.cc:181-201).
    """
    archs = cfg.get("architectures") or []
    arch = archs[0] if archs else cfg.get("model_type", "")

    if arch in ("LlamaForCausalLM", "LLaMAForCausalLM", "MistralForCausalLM"):
        n_heads = cfg["num_attention_heads"]
        n_kv = cfg.get("num_key_value_heads", n_heads)
        hidden = cfg["hidden_size"]
        return ModelSpec(
            arch="LlamaForCausalLM",
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=n_kv,
            head_dim=cfg.get("head_dim") or hidden // n_heads,
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            norm="rmsnorm",
            norm_eps=cfg.get("rms_norm_eps", 1e-6),
            pos="rope",
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=_rope_scaling_from_hf(cfg.get("rope_scaling")),
            act="silu_gate",
            qkv_bias=cfg.get("attention_bias", False),
            attn_out_bias=cfg.get("attention_bias", False),
            mlp_bias=cfg.get("mlp_bias", False),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_id=cfg.get("eos_token_id"),
        )

    if arch == "MixtralForCausalLM":
        n_heads = cfg["num_attention_heads"]
        n_kv = cfg.get("num_key_value_heads", n_heads)
        hidden = cfg["hidden_size"]
        return ModelSpec(
            arch=arch,
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=n_kv,
            head_dim=cfg.get("head_dim") or hidden // n_heads,
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            norm="rmsnorm",
            norm_eps=cfg.get("rms_norm_eps", 1e-5),
            pos="rope",
            rope_theta=cfg.get("rope_theta", 1e6),
            act="silu_gate",
            moe=MoESpec(
                num_experts=cfg.get("num_local_experts", 8),
                top_k=cfg.get("num_experts_per_tok", 2),
            ),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_id=cfg.get("eos_token_id"),
        )

    if arch == "OPTForCausalLM":
        hidden = cfg["hidden_size"]
        n_heads = cfg["num_attention_heads"]
        if cfg.get("word_embed_proj_dim", hidden) != hidden:
            raise ValueError("OPT word_embed_proj_dim != hidden_size unsupported")
        return ModelSpec(
            arch=arch,
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=n_heads,
            head_dim=hidden // n_heads,
            intermediate_size=cfg["ffn_dim"],
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            norm="layernorm",
            norm_eps=1e-5,
            norm_bias=True,
            pre_norm=cfg.get("do_layer_norm_before", True),
            # post-LN OPT variants (350m) have no final decoder layernorm
            final_norm=cfg.get("do_layer_norm_before", True),
            pos="learned",
            learned_pos_offset=2,
            act={"relu": "relu", "gelu": "gelu"}.get(
                cfg.get("activation_function", "relu"), "relu"
            ),
            qkv_bias=cfg.get("enable_bias", True),
            attn_out_bias=cfg.get("enable_bias", True),
            mlp_bias=cfg.get("enable_bias", True),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_id=cfg.get("eos_token_id"),
        )

    if arch in ("FalconForCausalLM", "RWForCausalLM"):
        hidden = cfg["hidden_size"]
        n_heads = cfg.get("num_attention_heads", cfg.get("n_head"))
        if cfg.get("new_decoder_architecture", False):
            n_kv = cfg.get("num_kv_heads", n_heads)
        elif cfg.get("multi_query", True):
            n_kv = 1
        else:
            n_kv = n_heads
        n_layers = cfg.get("num_hidden_layers", cfg.get("n_layer"))
        return ModelSpec(
            arch="FalconForCausalLM",
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            num_layers=n_layers,
            num_heads=n_heads,
            num_kv_heads=n_kv,
            head_dim=hidden // n_heads,
            intermediate_size=cfg.get("ffn_hidden_size", 4 * hidden),
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            norm="layernorm",
            norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            norm_bias=True,
            pos="rope",
            rope_theta=cfg.get("rope_theta", 10000.0),
            parallel_attn=cfg.get("parallel_attn", True),
            num_ln_in_parallel_attn=2
            if cfg.get("new_decoder_architecture", False)
            else 1,
            qkv_bias=cfg.get("bias", False),
            attn_out_bias=cfg.get("bias", False),
            mlp_bias=cfg.get("bias", False),
            act="gelu",
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_id=cfg.get("eos_token_id"),
        )

    if arch in ("MPTForCausalLM", "MptForCausalLM"):
        hidden = cfg.get("d_model", cfg.get("hidden_size"))
        n_heads = cfg.get("n_heads", cfg.get("num_attention_heads"))
        attn_cfg = cfg.get("attn_config", {}) or {}
        return ModelSpec(
            arch="MPTForCausalLM",
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            num_layers=cfg.get("n_layers", cfg.get("num_hidden_layers")),
            num_heads=n_heads,
            num_kv_heads=n_heads,
            head_dim=hidden // n_heads,
            intermediate_size=cfg.get("expansion_ratio", 4) * hidden,
            max_position_embeddings=cfg.get("max_seq_len", 2048),
            norm="layernorm",
            norm_eps=1e-5,
            norm_bias=False,
            pos="alibi",
            alibi_max_bias=float(attn_cfg.get("alibi_bias_max", 8)),
            qkv_bias=not cfg.get("no_bias", True),
            attn_out_bias=not cfg.get("no_bias", True),
            mlp_bias=not cfg.get("no_bias", True),
            act="gelu",
            tie_word_embeddings=True,
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_id=cfg.get("eos_token_id"),
        )

    if arch == "GPTBigCodeForCausalLM":  # StarCoder
        hidden = cfg["n_embd"]
        n_heads = cfg["n_head"]
        return ModelSpec(
            arch=arch,
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            num_layers=cfg["n_layer"],
            num_heads=n_heads,
            num_kv_heads=1 if cfg.get("multi_query", True) else n_heads,
            head_dim=hidden // n_heads,
            intermediate_size=cfg.get("n_inner") or 4 * hidden,
            max_position_embeddings=cfg.get("n_positions", 2048),
            norm="layernorm",
            norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            norm_bias=True,
            pos="learned",
            act="gelu_new",
            qkv_bias=True,
            attn_out_bias=True,
            mlp_bias=True,
            tie_word_embeddings=True,
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_id=cfg.get("eos_token_id"),
        )

    raise ValueError(f"Unsupported architecture: {arch!r}")


def from_hf_config_file(path: str) -> ModelSpec:
    with open(path) as f:
        return from_hf_config(json.load(f))


def load_spec(model_name_or_path: str, cache_dir: Optional[str] = None) -> ModelSpec:
    """Load a spec from a local HF model directory or cached config."""
    candidates = [os.path.join(model_name_or_path, "config.json")]
    if cache_dir:
        candidates.append(
            os.path.join(cache_dir, "configs", model_name_or_path.replace("/", "_"), "config.json")
        )
    for c in candidates:
        if os.path.exists(c):
            return from_hf_config_file(c)
    raise FileNotFoundError(f"No config.json found for {model_name_or_path}")
