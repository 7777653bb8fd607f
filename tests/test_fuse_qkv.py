"""Fused projection carriers (FFConfig.fuse_qkv / decoder.fuse_qkv_params).

The reference computes Q,K,V with ONE GEMM launch over a packed qkv weight
(inc_multihead_self_attention.cu:1112); the TPU analog concatenates the
wq/wk/wv (and wg/wu) carriers at engine build so decode pays one
quant-matmul kernel call per projection group. Gates:

- concat is column-exact for quantized carriers (grouping runs along the
  contraction axis, so no repacking): dequantize(concat) == concat(dequantize)
  bitwise
- a fused engine's greedy outputs equal incremental decoding on an unfused
  engine (fp32)
- the fused speculative path stays lossless vs its own incremental
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.config import config as ffconfig
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.quant.weight_only import (
    QuantizedArray, concat_rest, dequantize, quantize,
)
from flexflow_tpu.serving import (
    GenerationConfig, InferenceEngine, RequestManager,
)
from flexflow_tpu.serving.spec_manager import SpecRequestManager
from flexflow_tpu.serving.speculative import SpecEngine

LLM = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=128, hidden_size=64, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=96,
    max_position_embeddings=256, norm_eps=1e-6)
SSM = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=128, hidden_size=32, num_layers=1,
    num_heads=2, num_kv_heads=2, head_dim=16, intermediate_size=64,
    max_position_embeddings=256, norm_eps=1e-6)
OPT = specs.ModelSpec(
    arch="OPTForCausalLM", vocab_size=128, hidden_size=64, num_layers=2,
    num_heads=4, num_kv_heads=4, head_dim=16, intermediate_size=96,
    max_position_embeddings=256, norm_eps=1e-5, qkv_bias=True,
    attn_out_bias=True)


@pytest.fixture
def fuse_on():
    prev = ffconfig.fuse_qkv
    ffconfig.fuse_qkv = True
    yield
    ffconfig.fuse_qkv = prev


def _gen(spec, params, prompts, n=10):
    eng = InferenceEngine(spec, params, max_requests_per_batch=4,
                          max_seq_len=128, cache_dtype=jnp.float32)
    rm = RequestManager(eng)
    return [r.output_tokens
            for r in rm.generate(prompts, GenerationConfig(max_new_tokens=n))]


@pytest.mark.parametrize("bits", [4, 8])
def test_concat_rest_bitexact(bits):
    key = jax.random.PRNGKey(0)
    l, d, hh, kh, dh = 2, 64, 4, 2, 16
    ks = jax.random.split(key, 3)
    wq = jax.random.normal(ks[0], (l, d, hh, dh), jnp.float32)
    wk = jax.random.normal(ks[1], (l, d, kh, dh), jnp.float32)
    wv = jax.random.normal(ks[2], (l, d, kh, dh), jnp.float32)
    qas = [quantize(w, bits, 16, batch_dims=1, contract_dims=1)
           for w in (wq, wk, wv)]
    fused = concat_rest(qas, (hh + 2 * kh, dh))
    assert fused.shape == (l, d, hh + 2 * kh, dh)
    want = jnp.concatenate([dequantize(qa) for qa in qas], axis=2)
    np.testing.assert_array_equal(np.asarray(dequantize(fused)),
                                  np.asarray(want))


def test_fuse_params_structure(fuse_on):
    params = params_lib.init_params(LLM, jax.random.PRNGKey(0), jnp.float32)
    fused = decoder.fuse_qkv_params(LLM, params)
    lay = fused["layers"]
    assert "wqkv" in lay and "wgu" in lay
    for n in ("wq", "wk", "wv", "wg", "wu"):
        assert n not in lay
    assert lay["wqkv"].shape == (2, 64, 4 + 2 * 2, 16)
    assert lay["wgu"].shape == (2, 64, 2 * 96)
    # wd / wo / norms untouched
    assert "wd" in lay and "wo" in lay


def test_fused_engine_matches_unfused(fuse_on):
    params = params_lib.init_params(LLM, jax.random.PRNGKey(1), jnp.float32)
    prompts = [[3, 17, 91, 5], [8, 13, 21]]
    prev = ffconfig.fuse_qkv
    ffconfig.fuse_qkv = False
    want = _gen(LLM, params, prompts)
    ffconfig.fuse_qkv = prev
    got = _gen(LLM, params, prompts)
    assert got == want


def test_fused_engine_with_biases(fuse_on):
    """OPT-style projections carry bq/bk/bv -> fused bqkv."""
    params = params_lib.init_params(OPT, jax.random.PRNGKey(2), jnp.float32)
    # nonzero biases so the bqkv path is actually exercised
    lay = dict(params["layers"])
    for i, n in enumerate(("bq", "bk", "bv")):
        lay[n] = lay[n] + 0.01 * (i + 1)
    params = {**params, "layers": lay}
    fused = decoder.fuse_qkv_params(OPT, params)
    assert "bqkv" in fused["layers"]
    prompts = [[3, 17, 91, 5]]
    prev = ffconfig.fuse_qkv
    ffconfig.fuse_qkv = False
    want = _gen(OPT, params, prompts)
    ffconfig.fuse_qkv = prev
    got = _gen(OPT, params, prompts)
    assert got == want


def test_fused_spec_lossless(fuse_on):
    """Speculative serving with fused carriers (draft + verifier both fused)
    stays bit-lossless vs its own incremental decoding."""
    llm_params = params_lib.init_params(LLM, jax.random.PRNGKey(3),
                                        jnp.float32)
    ssm_params = params_lib.init_params(SSM, jax.random.PRNGKey(4),
                                        jnp.float32)
    prompts = [[3, 17, 91, 5], [8, 13, 21]]
    want = _gen(LLM, llm_params, prompts, n=12)
    eng = SpecEngine(LLM, llm_params, SSM, ssm_params, beam_width=2,
                     beam_depth=3, max_requests_per_batch=2, max_seq_len=128,
                     cache_dtype=jnp.float32)
    assert "wqkv" in eng.llm_params["layers"]
    rm = SpecRequestManager(eng, fused=True)
    got = [r.output_tokens
           for r in rm.generate(prompts, GenerationConfig(max_new_tokens=12))]
    assert got == want
