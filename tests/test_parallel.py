"""Parallelism tests on the virtual 8-device CPU mesh.

The reference gates TP-vs-PP output consistency across parallelism configs
(cpp_inference_tests.sh:205-215); here we gate sharded-vs-unsharded exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.parallel import make_mesh, param_shardings, shard_params
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

MQA = specs.ModelSpec(
    arch="FalconForCausalLM",
    vocab_size=128,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=1,
    head_dim=16,
    intermediate_size=128,
    norm="layernorm",
    norm_bias=True,
    parallel_attn=True,
    act="gelu",
    tie_word_embeddings=True,
)


@pytest.fixture(scope="module")
def tiny_params():
    return params_lib.init_params(TINY, jax.random.PRNGKey(0))


def test_eight_devices():
    assert len(jax.devices()) == 8


def _logits(spec, params):
    tokens = jnp.asarray([[3, 17, 91, 5, 8, 13, 21, 34]], jnp.int32)
    positions = jnp.arange(8, dtype=jnp.int32)[None]
    logits, _ = decoder.forward(spec, params, tokens, positions)
    return np.asarray(logits)


def test_tp_matches_single(tiny_params):
    want = _logits(TINY, tiny_params)
    mesh = make_mesh(data=1, pipe=1, model=4)
    sharded = shard_params(TINY, tiny_params, mesh)
    got = _logits(TINY, sharded)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_tp_mqa_replicates_kv():
    params = params_lib.init_params(MQA, jax.random.PRNGKey(1))
    want = _logits(MQA, params)
    mesh = make_mesh(data=1, pipe=1, model=4)
    shardings = param_shardings(MQA, params, mesh)
    # single KV head cannot shard over model=4 -> replicated
    wk = shardings["layers"]["wk"].spec
    assert wk[2] is None
    sharded = jax.device_put(params, shardings)
    got = _logits(MQA, sharded)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_dp_tp_generation_matches(tiny_params):
    prompts = [[3, 17, 91], [5, 8, 13, 21], [2, 9], [40, 41, 42]]

    def run(mesh):
        engine = InferenceEngine(
            TINY, tiny_params, max_requests_per_batch=4, max_seq_len=64,
            cache_dtype=jnp.float32,
        )
        if mesh is not None:
            engine.params = shard_params(TINY, tiny_params, mesh)
        rm = RequestManager(engine)
        return [
            r.output_tokens
            for r in rm.generate(prompts, GenerationConfig(max_new_tokens=8))
        ]

    base = run(None)
    tp = run(make_mesh(data=1, pipe=1, model=4))
    dp_tp = run(make_mesh(data=2, pipe=1, model=2))
    assert tp == base
    assert dp_tp == base


def test_expert_parallel_moe():
    moe_spec = specs.ModelSpec(
        arch="MixtralForCausalLM",
        vocab_size=128,
        hidden_size=64,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        intermediate_size=128,
        norm_eps=1e-6,
        moe=specs.MoESpec(num_experts=4, top_k=2),
    )
    params = params_lib.init_params(moe_spec, jax.random.PRNGKey(2))
    want = _logits(moe_spec, params)

    from flexflow_tpu.parallel.sharding import shard_params as sp

    mesh = make_mesh(data=1, pipe=1, model=4)
    ep = sp(moe_spec, params, mesh, expert_parallel=True)
    shardings = param_shardings(moe_spec, params, mesh, expert_parallel=True)
    assert shardings["layers"]["wg"].spec[1] == "model"  # expert axis sharded
    got = _logits(moe_spec, ep)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
