"""Multi-chip serving through the REAL engine/scheduler (virtual 8-CPU mesh).

The reference's headline deployment is TP/PP serving driven by the
RequestManager (inference_manager.cc MachineView assignment + AllReduce ops);
here the same Megatron layout comes from GSPMD shardings plumbed through
InferenceEngine/SpecEngine (mesh= kwarg). These tests gate that the sharded
engines produce the SAME tokens as the single-device engines — the TP-vs-PP
output-consistency check of the reference test suite
(tests/inference/cpp_inference_tests.sh:205-215).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.parallel import make_mesh
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager
from flexflow_tpu.serving.spec_manager import SpecRequestManager
from flexflow_tpu.serving.speculative import SpecEngine

import pytest


@pytest.fixture(autouse=True)
def _unfused_carriers():
    """Pin fuse_qkv OFF: the mesh-vs-single parity gates assert exact token
    equality, and mesh engines keep split carriers while single-device
    engines fuse by default (ADVICE r4 — fusion preserves outputs only up
    to fp reassociation)."""
    from flexflow_tpu.config import config as ffconfig

    prev = ffconfig.fuse_qkv
    ffconfig.fuse_qkv = False
    yield
    ffconfig.fuse_qkv = prev


SPEC = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=256, hidden_size=64, num_layers=2,
    num_heads=8, num_kv_heads=8, head_dim=8, intermediate_size=128,
    max_position_embeddings=256, norm_eps=1e-6,
)


def _prompts(n=5):
    rng = np.random.RandomState(0)
    return [rng.randint(1, 256, size=rng.randint(4, 20)).tolist()
            for _ in range(n)]


def _gen(engine, prompts, **rm_kw):
    rm = RequestManager(engine, **rm_kw)
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=24))
    return [r.output_tokens for r in reqs]


def test_tp_dp_serving_matches_single_device():
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(0), jnp.float32)
    prompts = _prompts()
    ref = _gen(
        InferenceEngine(SPEC, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32),
        prompts,
    )
    mesh = make_mesh(data=2, model=4)
    out = _gen(
        InferenceEngine(SPEC, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32, mesh=mesh),
        prompts,
    )
    assert out == ref


def test_tp_serving_pipelined_horizon():
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(1), jnp.float32)
    prompts = _prompts(6)
    ref = _gen(
        InferenceEngine(SPEC, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32),
        prompts, decode_horizon=8, pipelined=True,
    )
    mesh = make_mesh(model=8)
    out = _gen(
        InferenceEngine(SPEC, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32, mesh=mesh),
        prompts, decode_horizon=8, pipelined=True,
    )
    assert out == ref


def test_tp_spec_serving_matches_single_device():
    llm = params_lib.init_params(SPEC, jax.random.PRNGKey(2), jnp.float32)
    ssm = params_lib.init_params(SPEC, jax.random.PRNGKey(3), jnp.float32)
    prompts = _prompts(3)

    def run(mesh):
        eng = SpecEngine(SPEC, llm, SPEC, ssm, beam_width=2, beam_depth=3,
                         max_requests_per_batch=4, max_seq_len=128,
                         cache_dtype=jnp.float32, mesh=mesh)
        srm = SpecRequestManager(eng, fused=True)
        reqs = srm.generate(prompts, GenerationConfig(max_new_tokens=16))
        return [r.output_tokens for r in reqs]

    assert run(make_mesh(data=2, model=4)) == run(None)


def test_cp_serving_matches_single_device():
    """Context-parallel serving (seq axis on the KV cache) through the real
    engine — EXCEEDS the reference (no CP there, SURVEY.md §5.7)."""
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(4), jnp.float32)
    prompts = _prompts(4)
    ref = _gen(
        InferenceEngine(SPEC, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32),
        prompts, decode_horizon=4,
    )
    mesh = make_mesh(model=2, seq=4)
    out = _gen(
        InferenceEngine(SPEC, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32, mesh=mesh),
        prompts, decode_horizon=4,
    )
    assert out == ref
