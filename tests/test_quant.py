"""Quantization tests: roundtrip error bounds, packing, end-to-end quantized
generation, and sharded quantized params (reference analog: int4/int8 weight
paths in file_loader.cc + decompress_kernels.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.parallel import make_mesh, shard_params
from flexflow_tpu.quant import QuantizedArray, dequantize, quantize, quantize_params
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=128,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=4,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=128,
    norm_eps=1e-6,
)


@pytest.fixture(scope="module")
def tiny_params():
    return params_lib.init_params(TINY, jax.random.PRNGKey(0))


def test_int8_roundtrip_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 64))
    qa = quantize(w, bits=8, group_size=64, compute_dtype=jnp.float32)
    deq = dequantize(qa)
    # |err| <= scale/2 per element (round-to-nearest), scale broadcast per group
    scale = np.repeat(np.asarray(qa.scale), qa.group_size, axis=0)
    assert (np.abs(np.asarray(deq) - np.asarray(w)) <= scale / 2 + 1e-6).all()


def test_int4_roundtrip_bound():
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 32))
    qa = quantize(w, bits=4, group_size=64, compute_dtype=jnp.float32)
    assert qa.q.shape == (128, 32)  # packed two per byte
    deq = dequantize(qa)
    scale = np.repeat(np.asarray(qa.scale), qa.group_size, axis=0)
    assert (np.abs(np.asarray(deq) - np.asarray(w)) <= scale / 2 + 1e-6).all()


def test_stacked_batch_dims():
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 64, 16))  # [L, D, F]
    qa = quantize(w, bits=8, group_size=32, batch_dims=1, compute_dtype=jnp.float32)
    deq = dequantize(qa)
    assert deq.shape == w.shape
    # per-layer quantization equals independent quantization
    qa0 = quantize(w[0], bits=8, group_size=32, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(deq[0]), np.asarray(dequantize(qa0)))


def test_contract_dims_wo_layout():
    w = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 16, 64))  # [L,H,Dh,D]
    qa = quantize(
        w, bits=8, group_size=32, batch_dims=1, contract_dims=2,
        compute_dtype=jnp.float32,
    )
    assert dequantize(qa).shape == w.shape


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_generation_runs(tiny_params, bits):
    qparams = quantize_params(
        TINY, tiny_params, bits=bits, group_size=32, compute_dtype=jnp.float32
    )
    assert isinstance(qparams["layers"]["wq"], QuantizedArray)
    engine = InferenceEngine(
        TINY, qparams, max_requests_per_batch=2, max_seq_len=64,
        cache_dtype=jnp.float32,
    )
    rm = RequestManager(engine)
    [req] = rm.generate([[3, 17, 91, 5]], GenerationConfig(max_new_tokens=6))
    assert len(req.output_tokens) == 6

    # INT8 should track the full-precision model closely on logits
    if bits == 8:
        tokens = jnp.asarray([[3, 17, 91, 5]], jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)[None]
        full, _ = decoder.forward(TINY, tiny_params, tokens, pos)
        quant, _ = decoder.forward(TINY, qparams, tokens, pos)
        err = np.abs(np.asarray(full) - np.asarray(quant))
        assert err.max() < 0.15, err.max()


def test_quantized_sharded_matches_unsharded(tiny_params):
    qparams = quantize_params(
        TINY, tiny_params, bits=8, group_size=32, compute_dtype=jnp.float32
    )
    tokens = jnp.asarray([[3, 17, 91, 5, 8, 13, 21, 34]], jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    want, _ = decoder.forward(TINY, qparams, tokens, pos)

    mesh = make_mesh(data=1, pipe=1, model=4)
    sharded = shard_params(TINY, qparams, mesh)
    got, _ = decoder.forward(TINY, sharded, tokens, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
