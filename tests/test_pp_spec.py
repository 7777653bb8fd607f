"""Tree-speculative serving under pipeline parallelism (virtual 8-CPU mesh).

Reference: spec_infer runs under PP as the flagship CI config
(/root/reference/tests/inference/cpp_inference_tests.sh:12-100), with the
lossless gate (spec == incremental, :185-186) and the TP-vs-PP consistency
matrix (:205-215). Gates here compose all three: PP spec output must equal
the single-device spec output, which equals incremental greedy decoding;
verifier weights must be genuinely stage-resident.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.parallel import make_mesh
from flexflow_tpu.parallel.mesh import PIPE_AXIS
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager
from flexflow_tpu.serving.pp_spec import PipelineSpecEngine
from flexflow_tpu.serving.spec_manager import SpecRequestManager
from flexflow_tpu.serving.speculative import SpecEngine

@pytest.fixture(autouse=True)
def _unfused_carriers():
    """Pin fuse_qkv OFF for cross-engine bit-identity gates: mesh/PP engines
    keep split carriers, so a fused single-device reference would compare
    different fp accumulation blockings (ADVICE r4 — the gates here assert
    BIT identity, which fusion only preserves up to fp reassociation)."""
    from flexflow_tpu.config import config as ffconfig

    prev = ffconfig.fuse_qkv
    ffconfig.fuse_qkv = False
    yield
    ffconfig.fuse_qkv = prev


LLM_SPEC = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=256, hidden_size=64, num_layers=4,
    num_heads=8, num_kv_heads=8, head_dim=8, intermediate_size=128,
    max_position_embeddings=256, norm_eps=1e-6,
)
SSM_SPEC = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=256, hidden_size=32, num_layers=2,
    num_heads=4, num_kv_heads=4, head_dim=8, intermediate_size=64,
    max_position_embeddings=256, norm_eps=1e-6,
)


def _params():
    """Correlated (verifier, draft) pair via the embedded construction
    (benchmarks/spec_pair.py) so draft acceptance is genuinely > 1/step."""
    from benchmarks.spec_pair import embed_draft_in_verifier, perturb_params

    dparams = params_lib.init_params(
        SSM_SPEC, jax.random.PRNGKey(0), jnp.float32)
    llm = embed_draft_in_verifier(SSM_SPEC, dparams, LLM_SPEC, jnp.float32)
    ssm = perturb_params(dparams, 0.05, jax.random.PRNGKey(42))
    return llm, ssm


def _prompts(n=4):
    rng = np.random.RandomState(0)
    return [rng.randint(1, 256, size=rng.randint(4, 16)).tolist()
            for _ in range(n)]


def _spec_gen(engine, prompts, **mgr_kw):
    rm = SpecRequestManager(engine, fused=True, **mgr_kw)
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=20))
    return [r.output_tokens for r in reqs], rm


def _pp_spec_engine(llm, ssm, mesh, **kw):
    return PipelineSpecEngine(
        LLM_SPEC, llm, SSM_SPEC, ssm, mesh=mesh,
        beam_width=2, beam_depth=3, max_requests_per_batch=4,
        max_seq_len=160, cache_dtype=jnp.float32, **kw,
    )


def test_pp_spec_matches_single_device_and_incremental():
    llm, ssm = _params()
    prompts = _prompts()

    # incremental greedy reference (losslessness anchor)
    incr = RequestManager(
        InferenceEngine(LLM_SPEC, llm, max_requests_per_batch=4,
                        max_seq_len=160, cache_dtype=jnp.float32)
    ).generate(prompts, GenerationConfig(max_new_tokens=20))
    incr_out = [r.output_tokens for r in incr]

    single = SpecEngine(
        LLM_SPEC, llm, SSM_SPEC, ssm, beam_width=2, beam_depth=3,
        max_requests_per_batch=4, max_seq_len=160, cache_dtype=jnp.float32,
    )
    single_out, _ = _spec_gen(single, prompts)
    assert single_out == incr_out  # lossless (existing gate, re-anchored)

    pp_out, rm = _spec_gen(_pp_spec_engine(llm, ssm, make_mesh(pipe=2)),
                           prompts)
    assert pp_out == incr_out
    assert rm.mean_verified_tokens_per_step > 1.0  # speculation is active


def test_pp_spec_tp_composition():
    llm, ssm = _params()
    prompts = _prompts(4)
    single = SpecEngine(
        LLM_SPEC, llm, SSM_SPEC, ssm, beam_width=2, beam_depth=3,
        max_requests_per_batch=4, max_seq_len=160, cache_dtype=jnp.float32,
    )
    ref, _ = _spec_gen(single, prompts)
    out, _ = _spec_gen(
        _pp_spec_engine(llm, ssm, make_mesh(pipe=2, model=2)), prompts)
    assert out == ref


def test_pp_spec_verifier_stage_resident():
    llm, ssm = _params()
    eng = _pp_spec_engine(llm, ssm, make_mesh(pipe=4))
    wq = eng.llm_params["layers"]["wq"]
    assert wq.sharding.spec[0] == PIPE_AXIS
    assert wq.addressable_shards[0].data.shape[0] == 1
    ck = eng.llm_cache.k
    assert ck.sharding.spec[0] == PIPE_AXIS
    assert ck.addressable_shards[0].data.shape[0] == 1


def test_pp_spec_horizon_matches():
    llm, ssm = _params()
    prompts = _prompts(4)
    single = SpecEngine(
        LLM_SPEC, llm, SSM_SPEC, ssm, beam_width=2, beam_depth=3,
        max_requests_per_batch=4, max_seq_len=160, cache_dtype=jnp.float32,
    )
    ref, _ = _spec_gen(single, prompts)
    out, _ = _spec_gen(
        _pp_spec_engine(llm, ssm, make_mesh(pipe=2)), prompts,
        spec_horizon=2)
    assert out == ref


def test_pp_spec_via_llm_api():
    """LLM.compile with ssms + pipeline_parallelism_degree routes to the
    stage-resident PipelineSpecEngine (round-2: silent replication)."""
    import flexflow_tpu.serve as serve_mod

    llm_p, ssm_p = _params()

    llm = serve_mod.LLM.__new__(serve_mod.LLM)
    llm.model_dir = "<llm>"
    llm.dtype = jnp.float32
    llm.quant_bits = None
    llm.output_file = None
    llm.spec = LLM_SPEC
    llm.params = None
    llm.tokenizer = object()
    llm.rm = None
    llm._peft = []
    llm.lora = None
    llm.lora_config = None

    ssm = serve_mod.SSM.__new__(serve_mod.SSM)
    ssm.model_dir = "<ssm>"
    ssm.dtype = jnp.float32
    ssm.quant_bits = None
    llm._ssms = [ssm]

    def fake_load(model_dir, spec=None, **kw):
        if model_dir == "<llm>":
            return LLM_SPEC, llm_p
        return SSM_SPEC, ssm_p

    orig_load = serve_mod.hf_weights.load_params
    orig_tok = serve_mod.LLM._load_tokenizer
    serve_mod.hf_weights.load_params = fake_load
    serve_mod.LLM._load_tokenizer = lambda self: None
    try:
        llm.compile(
            max_requests_per_batch=4, max_seq_length=160,
            pipeline_parallelism_degree=2, beam_width=2, beam_depth=3,
        )
    finally:
        serve_mod.hf_weights.load_params = orig_load
        serve_mod.LLM._load_tokenizer = orig_tok
    eng = llm.rm.engine
    assert isinstance(eng, PipelineSpecEngine)
    assert eng.llm_params["layers"]["wq"].sharding.spec[0] == PIPE_AXIS


def test_pp_spec_sampling_requests_complete():
    """Stochastic verification through the PP spec engine: sampled requests
    complete with plausible outputs (exactness is a greedy-only property;
    the sampling walk is gated distributionally in test_spec_sampling)."""
    llm, ssm = _params()
    eng = _pp_spec_engine(llm, ssm, make_mesh(pipe=2))
    rm = SpecRequestManager(eng, fused=True)
    reqs = rm.generate(
        _prompts(3),
        GenerationConfig(max_new_tokens=12, temperature=0.8, top_p=0.9),
    )
    for r in reqs:
        assert len(r.output_tokens) == 12
        assert all(0 <= t < 256 for t in r.output_tokens)


@pytest.mark.parametrize("family", ["opt", "falcon_mqa", "mpt_alibi"])
def test_pp_spec_zoo_families(family):
    """PP spec serving must stay lossless for non-LLaMA verifier families
    (learned positions, parallel-attn MQA, ALiBi): PP spec == single-device
    spec == incremental greedy. Draft and verifier are independent random
    models (acceptance ~0 — the bonus-token path — which still gates the
    full verify/commit machinery)."""
    from tests.test_serving_zoo import ZOO

    vspec = ZOO[family]
    import dataclasses
    dspec = dataclasses.replace(vspec, num_layers=1)
    vparams = params_lib.init_params(vspec, jax.random.PRNGKey(0),
                                    jnp.float32)
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(1),
                                     jnp.float32)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 96, size=rng.randint(3, 10)).tolist()
               for _ in range(3)]

    incr = RequestManager(
        InferenceEngine(vspec, vparams, max_requests_per_batch=4,
                        max_seq_len=160, cache_dtype=jnp.float32)
    ).generate(prompts, GenerationConfig(max_new_tokens=10))
    incr_out = [r.output_tokens for r in incr]

    single = SpecEngine(
        vspec, vparams, dspec, dparams, beam_width=2, beam_depth=3,
        max_requests_per_batch=4, max_seq_len=160, cache_dtype=jnp.float32,
    )
    single_out, _ = _spec_gen_n(single, prompts, 10)
    assert single_out == incr_out

    pp = PipelineSpecEngine(
        vspec, vparams, dspec, dparams, mesh=make_mesh(pipe=2),
        beam_width=2, beam_depth=3, max_requests_per_batch=4,
        max_seq_len=160, cache_dtype=jnp.float32,
    )
    pp_out, _ = _spec_gen_n(pp, prompts, 10)
    assert pp_out == incr_out


def _spec_gen_n(engine, prompts, n):
    rm = SpecRequestManager(engine, fused=True)
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=n))
    return [r.output_tokens for r in reqs], rm


def test_pp_multi_ssm_rotation_matches_incremental():
    """Multi-SSM rotation under PP (ROADMAP r4 #2, reference
    register_ssm_model loop + PP flagship config): two drafts rotating
    against ONE staged verifier (shared_pp) must stay lossless vs
    incremental greedy AND match the single-device multi-SSM rotation."""
    from flexflow_tpu.serving.spec_manager import MultiSSMSpecManager

    llm, ssm = _params()
    ssm2 = params_lib.init_params(SSM_SPEC, jax.random.PRNGKey(7),
                                  jnp.float32)
    prompts = _prompts()
    cfg = GenerationConfig(max_new_tokens=16)

    incr = RequestManager(
        InferenceEngine(LLM_SPEC, llm, max_requests_per_batch=4,
                        max_seq_len=160, cache_dtype=jnp.float32)
    ).generate(prompts, cfg)
    want = [r.output_tokens for r in incr]

    # single-device rotation reference
    engines_sd = [
        SpecEngine(LLM_SPEC, llm, SSM_SPEC, p, beam_width=2, beam_depth=3,
                   max_requests_per_batch=4, max_seq_len=160,
                   cache_dtype=jnp.float32)
        for p in (ssm, ssm2)
    ]
    sd = [r.output_tokens for r in MultiSSMSpecManager(
        engines_sd, fused=True).generate(prompts, cfg)]
    assert sd == want

    mesh = make_mesh(pipe=2)
    first = _pp_spec_engine(llm, ssm, mesh)
    second = _pp_spec_engine(llm, ssm2, mesh, shared_pp=first._pp)
    rm = MultiSSMSpecManager([first, second], fused=True)
    got = [r.output_tokens for r in rm.generate(prompts, cfg)]
    assert got == want
    # both drafts actually took turns
    assert rm.total_decoding_steps >= 2
