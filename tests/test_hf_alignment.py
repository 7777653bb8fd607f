"""Numeric alignment vs HuggingFace — the reference's test oracle.

Mirrors /root/reference/tests/align/ (op/model alignment vs torch) and
tests/inference/huggingface_inference.py (HF ground truth): we build tiny
randomly-initialized HF models per architecture, import their state dicts, and
require fp32 logit agreement and greedy-token equality.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


def _hf_logits(model, tokens: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = model(input_ids=torch.tensor(tokens, dtype=torch.long))
    return out.logits.float().numpy()


def _align(hf_cfg, tokens=None, atol=2e-4):
    torch.manual_seed(0)
    model_cls = getattr(transformers, hf_cfg.architectures[0])
    model = model_cls(hf_cfg).eval()
    cfg_dict = hf_cfg.to_dict()
    cfg_dict["architectures"] = hf_cfg.architectures
    spec = specs.from_hf_config(cfg_dict)
    params = params_lib.convert_hf_state_dict(spec, model.state_dict())

    rng = np.random.RandomState(0)
    if tokens is None:
        tokens = rng.randint(0, spec.vocab_size, size=(2, 12))
    ref = _hf_logits(model, tokens)

    positions = np.broadcast_to(np.arange(tokens.shape[1]), tokens.shape)
    got, _ = decoder.forward(
        spec, params, jnp.asarray(tokens), jnp.asarray(positions)
    )
    got = np.asarray(got)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)
    # greedy-token equality (the reference's inference gate,
    # cpp_inference_tests.sh:249-255)
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        architectures=["LlamaForCausalLM"],
    )
    cfg.architectures = ["LlamaForCausalLM"]
    _align(cfg)


def test_llama_gqa():
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    _align(cfg)


def test_llama_rope_scaling_llama3():
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
    )
    cfg.architectures = ["LlamaForCausalLM"]
    _align(cfg)


def test_opt():
    cfg = transformers.OPTConfig(
        vocab_size=256,
        hidden_size=64,
        ffn_dim=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=64,
        do_layer_norm_before=True,
        word_embed_proj_dim=64,
    )
    cfg.architectures = ["OPTForCausalLM"]
    _align(cfg)


def test_opt_post_ln():
    cfg = transformers.OPTConfig(
        vocab_size=128,
        hidden_size=32,
        ffn_dim=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=64,
        do_layer_norm_before=False,
        word_embed_proj_dim=32,
    )
    cfg.architectures = ["OPTForCausalLM"]
    _align(cfg)


def test_falcon_mqa():
    cfg = transformers.FalconConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        multi_query=True,
        parallel_attn=True,
        new_decoder_architecture=False,
        bias=False,
        alibi=False,
    )
    cfg.architectures = ["FalconForCausalLM"]
    _align(cfg)


def test_falcon_new_arch():
    cfg = transformers.FalconConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_kv_heads=2,
        multi_query=False,
        parallel_attn=True,
        new_decoder_architecture=True,
        bias=False,
        alibi=False,
    )
    cfg.architectures = ["FalconForCausalLM"]
    _align(cfg)


def test_mpt_alibi():
    cfg = transformers.MptConfig(
        vocab_size=256,
        d_model=64,
        n_layers=2,
        n_heads=4,
        expansion_ratio=2,
        max_seq_len=64,
    )
    cfg.architectures = ["MptForCausalLM"]
    _align(cfg)


def test_starcoder_mqa():
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=256,
        n_embd=64,
        n_layer=2,
        n_head=4,
        n_positions=64,
        multi_query=True,
    )
    cfg.architectures = ["GPTBigCodeForCausalLM"]
    _align(cfg)


def test_mixtral():
    cfg = transformers.MixtralConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
    )
    cfg.architectures = ["MixtralForCausalLM"]
    _align(cfg, atol=5e-4)


def test_mixtral_ragged_matches_dense():
    """Sort+ragged_dot MoE dispatch must equal the dense masked compute."""
    import dataclasses as _dc

    import jax as _jax
    from flexflow_tpu.models import decoder as _dec
    from flexflow_tpu.models import params as _params

    dense_spec = specs.ModelSpec(
        arch="MixtralForCausalLM",
        vocab_size=128,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        intermediate_size=128,
        max_position_embeddings=64,
        norm_eps=1e-6,
        moe=specs.MoESpec(num_experts=4, top_k=2, impl="dense"),
    )
    ragged_spec = _dc.replace(
        dense_spec, moe=specs.MoESpec(num_experts=4, top_k=2, impl="ragged")
    )
    params = _params.init_params(dense_spec, _jax.random.PRNGKey(0))
    tokens = jnp.asarray([[3, 17, 91, 5, 8, 13]], jnp.int32)
    pos = jnp.arange(6, dtype=jnp.int32)[None]
    want, _ = _dec.forward(dense_spec, params, tokens, pos)
    got, _ = _dec.forward(ragged_spec, params, tokens, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
