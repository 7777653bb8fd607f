"""Cached incremental decoding must match full recomputation for EVERY model
family (learned positions, alibi, parallel-attn, MoE exercise different code
in the cached path than LLaMA's rope/rmsnorm)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager

ZOO = {
    "opt": specs.ModelSpec(
        arch="OPTForCausalLM", vocab_size=96, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, intermediate_size=128,
        max_position_embeddings=128, norm="layernorm", norm_bias=True,
        pos="learned", learned_pos_offset=2, act="relu", qkv_bias=True,
        attn_out_bias=True, mlp_bias=True, tie_word_embeddings=True,
    ),
    "falcon_mqa": specs.ModelSpec(
        arch="FalconForCausalLM", vocab_size=96, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=1, head_dim=16, intermediate_size=128,
        norm="layernorm", norm_bias=True, parallel_attn=True, act="gelu",
        tie_word_embeddings=True,
    ),
    "mpt_alibi": specs.ModelSpec(
        arch="MPTForCausalLM", vocab_size=96, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, intermediate_size=128,
        norm="layernorm", norm_bias=False, pos="alibi", act="gelu",
        tie_word_embeddings=True,
    ),
    "starcoder_mqa": specs.ModelSpec(
        arch="GPTBigCodeForCausalLM", vocab_size=96, hidden_size=64,
        num_layers=2, num_heads=4, num_kv_heads=1, head_dim=16,
        intermediate_size=128, max_position_embeddings=128, norm="layernorm",
        norm_bias=True, pos="learned", act="gelu_new", qkv_bias=True,
        attn_out_bias=True, mlp_bias=True, tie_word_embeddings=True,
    ),
    "mixtral": specs.ModelSpec(
        arch="MixtralForCausalLM", vocab_size=96, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        norm_eps=1e-6, moe=specs.MoESpec(num_experts=4, top_k=2),
    ),
}


def greedy_reference(spec, params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        t = jnp.asarray([toks], jnp.int32)
        pos = jnp.arange(len(toks), dtype=jnp.int32)[None]
        logits, _ = decoder.forward(spec, params, t, pos)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


@pytest.mark.parametrize("name", sorted(ZOO))
def test_cached_decode_matches_recompute(name):
    spec = ZOO[name]
    params = params_lib.init_params(spec, jax.random.PRNGKey(0))
    prompt = [3, 17, 91, 5, 8]
    want = greedy_reference(spec, params, prompt, 8)

    engine = InferenceEngine(
        spec, params, max_requests_per_batch=2, max_seq_len=64,
        cache_dtype=jnp.float32,
    )
    rm = RequestManager(engine)
    [req] = rm.generate([prompt], GenerationConfig(max_new_tokens=8))
    assert req.output_tokens == want, name


@pytest.mark.parametrize("name", sorted(ZOO))
def test_pp_serving_matches_base_for_zoo(name):
    """PP serving (incl. the software-pipelined horizon) must match the
    base engine for EVERY model family — learned positions, post-LN
    biases, parallel-attn MQA, ALiBi, GQA and MoE all exercise different
    stage-body code than LLaMA's rope/rmsnorm (the reference's TP-vs-PP
    consistency matrix, cpp_inference_tests.sh:205-215, per family)."""
    from flexflow_tpu.parallel import make_mesh
    from flexflow_tpu.serving.pp_engine import PipelineInferenceEngine

    spec = ZOO[name]
    params = params_lib.init_params(spec, jax.random.PRNGKey(1), jnp.float32)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 96, size=rng.randint(3, 12)).tolist()
               for _ in range(4)]

    def gen(engine):
        rm = RequestManager(engine, decode_horizon=6, pipelined=True)
        reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=12))
        return [r.output_tokens for r in reqs]

    base = gen(InferenceEngine(
        spec, params, max_requests_per_batch=4, max_seq_len=64,
        cache_dtype=jnp.float32))
    pp = gen(PipelineInferenceEngine(
        spec, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
        max_seq_len=64, cache_dtype=jnp.float32))
    assert pp == base
