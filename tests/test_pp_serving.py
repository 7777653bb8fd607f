"""Pipeline-parallel SERVING through the real engine (virtual 8-CPU mesh).

Reference: layers binned into PP stages with per-stage device placement
(/root/reference/src/runtime/inference_manager.cc:87-130) and the TP-vs-PP
output-consistency gate (tests/inference/cpp_inference_tests.sh:205-215).

Gates:
- PP=2/PP=4 serving produces EXACTLY the single-device tokens;
- TP x PP composition matches too (the reference consistency matrix);
- weights are genuinely stage-resident: each device holds 1/P of the layer
  stack (the round-1 replicate-over-pipe fallback is the bug this guards).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.parallel import make_mesh
from flexflow_tpu.parallel.mesh import PIPE_AXIS
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager
from flexflow_tpu.serving.pp_engine import PipelineInferenceEngine

SPEC = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=256, hidden_size=64, num_layers=4,
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


def _single_device_ref(params, prompts, **rm_kw):
    return _gen(
        InferenceEngine(SPEC, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32),
        prompts, **rm_kw,
    )


def _pp_engine(params, mesh, **kw):
    return PipelineInferenceEngine(
        SPEC, params, mesh=mesh, max_requests_per_batch=4,
        max_seq_len=128, cache_dtype=jnp.float32, **kw,
    )


def test_pp_serving_matches_single_device():
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(0), jnp.float32)
    prompts = _prompts()
    ref = _single_device_ref(params, prompts)
    out = _gen(_pp_engine(params, make_mesh(pipe=2)), prompts)
    assert out == ref
    out4 = _gen(_pp_engine(params, make_mesh(pipe=4)), prompts)
    assert out4 == ref


def test_pp_weights_are_stage_resident():
    """Each device must hold only its stage's layer slice — NOT a replica."""
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(0), jnp.float32)
    mesh = make_mesh(pipe=4)
    eng = _pp_engine(params, mesh)
    wq = eng.params["layers"]["wq"]  # [P=4, L/P=1, D, H, Dh]
    assert wq.sharding.spec[0] == PIPE_AXIS
    shard = wq.addressable_shards[0]
    assert shard.data.shape[0] == 1  # one stage per device
    # cache too
    ck = eng.cache.k
    assert ck.sharding.spec[0] == PIPE_AXIS
    assert ck.addressable_shards[0].data.shape[0] == 1


def test_tp_pp_composition_consistency():
    """Reference TP-vs-PP matrix: (TP=2,PP=2) == (PP=4) == (TP=4) == single."""
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(5), jnp.float32)
    prompts = _prompts(4)
    ref = _single_device_ref(params, prompts)
    tp4 = _gen(
        InferenceEngine(SPEC, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32,
                        mesh=make_mesh(model=4)),
        prompts,
    )
    pp2tp2 = _gen(_pp_engine(params, make_mesh(pipe=2, model=2)), prompts)
    assert tp4 == ref
    assert pp2tp2 == ref


def test_pp_serving_alibi_matches_single_device():
    """ALiBi (MPT-class) under PP and TPxPP must match the base engine —
    round-2 ADVICE: slopes were silently dropped in the PP stage body."""
    import dataclasses

    aspec = dataclasses.replace(SPEC, pos="alibi")
    params = params_lib.init_params(aspec, jax.random.PRNGKey(3), jnp.float32)
    prompts = _prompts(4)
    ref = _gen(
        InferenceEngine(aspec, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32),
        prompts,
    )
    out = _gen(
        PipelineInferenceEngine(
            aspec, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
            max_seq_len=128, cache_dtype=jnp.float32,
        ),
        prompts,
    )
    assert out == ref
    out_tp = _gen(
        PipelineInferenceEngine(
            aspec, params, mesh=make_mesh(pipe=2, model=2),
            max_requests_per_batch=4, max_seq_len=128,
            cache_dtype=jnp.float32,
        ),
        prompts,
    )
    assert out_tp == ref


def test_pp_horizon_decoding_matches():
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(7), jnp.float32)
    prompts = _prompts(6)
    ref = _single_device_ref(params, prompts, decode_horizon=8, pipelined=True)
    out = _gen(_pp_engine(params, make_mesh(pipe=2)), prompts,
               decode_horizon=8, pipelined=True)
    assert out == ref


def test_pp_overlapped_horizon_matches_stepwise_and_fills_pipeline():
    """The software-pipelined horizon (one bubble per horizon) must produce
    the stepwise path's exact tokens, in fewer ticks: n*M+P-1 < n*(M+P-1)
    (reference analog: 4 in-flight batches fill the pipeline,
    request_manager.cc:3122-3137)."""
    import numpy as np
    from flexflow_tpu.ops.sampling import SamplingConfig

    params = params_lib.init_params(SPEC, jax.random.PRNGKey(9), jnp.float32)
    eng = _pp_engine(params, make_mesh(pipe=2))
    n = 6
    assert eng.horizon_ticks(n) == n * eng.num_microbatches + eng.pp - 1
    assert eng.horizon_ticks(n) < n * (eng.num_microbatches + eng.pp - 1)

    # seed both paths with identical cache state via one prefill admission
    key = jax.random.PRNGKey(0)
    scfg = SamplingConfig.greedy(4)
    prompts = [[5, 6, 7], [8, 9], [10, 11, 12, 13], [3]]
    first = eng.fetch(eng.prefill_batch_to_slots_async(
        prompts, [0, 1, 2, 3], key, scfg))
    lens = np.array([len(p) for p in prompts], np.int32)
    toks = np.asarray(first, np.int32)

    # stepwise on a fresh engine with the same state
    eng2 = _pp_engine(params, make_mesh(pipe=2))
    eng2.prefill_batch_to_slots_async(prompts, [0, 1, 2, 3], key, scfg)

    out_overlap, eng.cache = eng._decode_n(
        eng.params, eng.cache, eng._h(lens), eng._h(toks),
        eng._h(key), eng._htree(scfg), n, greedy_only=True)
    out_step, eng2.cache = eng2._decode_n_stepwise(
        eng2.params, eng2.cache, eng2._h(lens), eng2._h(toks),
        eng2._h(key), eng2._htree(scfg), n, greedy_only=True)
    assert np.array_equal(eng.fetch(out_overlap), eng2.fetch(out_step))

    # caches agree after the horizon commit (up to fp reduction-order ulps:
    # the overlapped path splits the softmax sum as [cache | staged] where
    # the stepwise path has everything committed)
    np.testing.assert_allclose(
        eng.fetch(eng.cache.k), eng2.fetch(eng2.cache.k),
        rtol=1e-5, atol=1e-5)


def test_pp_overlapped_horizon_alibi():
    """ALiBi composes with the overlapped horizon (new_positions plumbing)."""
    import dataclasses

    aspec = dataclasses.replace(SPEC, pos="alibi")
    params = params_lib.init_params(aspec, jax.random.PRNGKey(4), jnp.float32)
    prompts = _prompts(4)
    ref = _gen(
        InferenceEngine(aspec, params, max_requests_per_batch=4,
                        max_seq_len=128, cache_dtype=jnp.float32),
        prompts, decode_horizon=8, pipelined=True,
    )
    out = _gen(
        PipelineInferenceEngine(
            aspec, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
            max_seq_len=128, cache_dtype=jnp.float32,
        ),
        prompts, decode_horizon=8, pipelined=True,
    )
    assert out == ref


def test_pp_chunked_prefill_matches():
    """max_tokens_per_batch under PP: prompts above the budget admit through
    chunked piped passes (reference token-budget prompt phase,
    request_manager.cc:860-940) with exact outputs vs whole-prompt
    admission — round 2 silently zeroed the flag."""
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(2), jnp.float32)
    prompts = [list(range(2, 30)), [7, 8, 9], list(range(40, 60)), [5]]
    ref = _gen(_pp_engine(params, make_mesh(pipe=2)), prompts)
    eng = PipelineInferenceEngine(
        SPEC, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
        max_seq_len=128, max_tokens_per_batch=8, cache_dtype=jnp.float32,
    )
    assert eng.max_tokens_per_batch == 8
    out = _gen(eng, prompts)
    assert out == ref
    # TP composes with the chunked path too
    eng_tp = PipelineInferenceEngine(
        SPEC, params, mesh=make_mesh(pipe=2, model=2),
        max_requests_per_batch=4, max_seq_len=128, max_tokens_per_batch=8,
        cache_dtype=jnp.float32,
    )
    assert _gen(eng_tp, prompts) == ref


def test_pp_via_llm_api_cli_flag_not_silently_replicated():
    """`LLM.compile(pipeline_parallelism_degree=N)` must route to the
    stage-resident engine (round-1: it silently replicated weights)."""
    import flexflow_tpu.serve as serve_mod

    # exercise engine selection without real HF weights: monkeypatch loaders
    spec = SPEC
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)

    llm = serve_mod.LLM.__new__(serve_mod.LLM)
    llm.model_dir = "<dummy>"
    llm.dtype = jnp.float32
    llm.quant_bits = None
    llm.output_file = None
    llm.spec = spec
    llm.params = None
    llm.tokenizer = object()
    llm.rm = None
    llm._ssms = []
    llm._peft = []
    llm.lora = None
    llm.lora_config = None

    orig_load = serve_mod.hf_weights.load_params
    orig_tok = serve_mod.LLM._load_tokenizer
    serve_mod.hf_weights.load_params = (
        lambda *a, **k: (spec, params)
    )
    serve_mod.LLM._load_tokenizer = lambda self: None
    try:
        llm.compile(
            max_requests_per_batch=4, max_seq_length=128,
            pipeline_parallelism_degree=2,
        )
    finally:
        serve_mod.hf_weights.load_params = orig_load
        serve_mod.LLM._load_tokenizer = orig_tok
    eng = llm.rm.engine
    assert isinstance(eng, PipelineInferenceEngine)
    assert eng.params["layers"]["wq"].sharding.spec[0] == PIPE_AXIS


def test_pp_serving_with_lora_matches_base_engine():
    """LoRA adapters under PP (tp=1): per-request-routed outputs must match
    the base engine exactly, including mixed adapter/base batches and the
    horizon path (round 2 rejected this config loudly; the reference
    serves PEFT under its normal parallel layouts)."""
    from flexflow_tpu.peft import LoraConfig, init_lora_params
    from flexflow_tpu.serving import GenerationConfig

    cfg = LoraConfig(rank=4, alpha=8.0, target_modules=("wq", "wv", "wd"))
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(0), jnp.float32)
    lora = init_lora_params(SPEC, cfg, 2, jax.random.PRNGKey(1))
    keys = jax.random.split(jax.random.PRNGKey(2), len(lora))
    lora = {
        mod: {"a": ab["a"],
              "b": jax.random.normal(k, ab["b"].shape, jnp.float32) * 0.05}
        for k, (mod, ab) in zip(keys, lora.items())
    }

    prompts = [[5, 6, 7], [8, 9, 10], [11, 12], [3, 4]]
    adapters = [0, 1, -1, 0]

    def run(engine):
        # generate() takes one config, so vary adapter_id per request
        rm = RequestManager(engine, decode_horizon=4, pipelined=True)
        outs = []
        for p, a in zip(prompts, adapters):
            [r] = rm.generate(
                [p], GenerationConfig(max_new_tokens=12, adapter_id=a))
            outs.append(r.output_tokens)
        return outs

    base = InferenceEngine(
        SPEC, params, max_requests_per_batch=4, max_seq_len=128,
        cache_dtype=jnp.float32, lora=lora, lora_config=cfg,
    )
    want = run(base)

    pp = PipelineInferenceEngine(
        SPEC, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
        max_seq_len=128, cache_dtype=jnp.float32, lora=lora, lora_config=cfg,
    )
    got = run(pp)
    assert got == want

    # adapter rows genuinely differ from base rows (LoRA is active)
    assert want[0] != want[2] or want[1] != want[2]


def test_pp_lora_rejects_tp():
    from flexflow_tpu.peft import LoraConfig, init_lora_params

    cfg = LoraConfig(rank=4, alpha=8.0, target_modules=("wq",))
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(0), jnp.float32)
    lora = init_lora_params(SPEC, cfg, 1, jax.random.PRNGKey(1))
    try:
        PipelineInferenceEngine(
            SPEC, params, mesh=make_mesh(pipe=2, model=2),
            max_requests_per_batch=4, max_seq_len=128,
            cache_dtype=jnp.float32, lora=lora, lora_config=cfg,
        )
        assert False, "LoRA + TP under PP must raise"
    except NotImplementedError:
        pass


def test_pp_overlapped_horizon_token_banking_m_gt_p():
    """num_microbatches > pipe stages: the feedback token arrives EARLY and
    must be banked per microbatch until its next step starts."""
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(0), jnp.float32)
    prompts = _prompts(4)
    ref = _single_device_ref(params, prompts, decode_horizon=8,
                             pipelined=True)
    eng = PipelineInferenceEngine(
        SPEC, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
        max_seq_len=128, cache_dtype=jnp.float32, num_microbatches=4,
    )
    assert eng.horizon_ticks(8) == 8 * 4 + 1
    out = _gen(eng, prompts, decode_horizon=8, pipelined=True)
    assert out == ref


def test_pp_chunked_prefill_final_partial_window():
    """Regression (round-3 review): PP chunk windows crossing the cache end
    must not shift onto earlier positions (see base-engine twin test)."""
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(2), jnp.float32)
    prompt = list(range(2, 52))  # 50 tokens
    ref = _gen(_pp_engine(params, make_mesh(pipe=2)), [prompt])[0][:6]
    eng = PipelineInferenceEngine(
        SPEC, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
        max_seq_len=128, max_tokens_per_batch=24, cache_dtype=jnp.float32,
    )
    # use a seq len where the final window overflows: 50 + 24 > 64
    eng64 = PipelineInferenceEngine(
        SPEC, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
        max_seq_len=64, max_tokens_per_batch=24, cache_dtype=jnp.float32,
    )
    ref64 = _gen(
        PipelineInferenceEngine(
            SPEC, params, mesh=make_mesh(pipe=2), max_requests_per_batch=4,
            max_seq_len=64, cache_dtype=jnp.float32,
        ),
        [prompt],
    )[0][:6]
    got = _gen(eng64, [prompt])[0][:6]
    assert got == ref64
    assert _gen(eng, [prompt])[0][:6] == ref


def test_pp_overlapped_horizon_sampling_bit_equal():
    """ROADMAP r3 #9: with per-row draw keying (sample() keys each row by
    (key, row_offset + r)), the overlapped horizon's SAMPLED tokens must be
    BIT-EQUAL to the stepwise path at temperature > 0 — not just
    distributionally correct."""
    import numpy as np
    from flexflow_tpu.ops.sampling import SamplingConfig

    params = params_lib.init_params(SPEC, jax.random.PRNGKey(9), jnp.float32)
    eng = _pp_engine(params, make_mesh(pipe=2))
    eng2 = _pp_engine(params, make_mesh(pipe=2))
    n = 5
    key = jax.random.PRNGKey(3)
    scfg = SamplingConfig(
        temperature=np.array([0.8, 1.2, 0.7, 1.0], np.float32),
        top_p=np.array([0.95, 1.0, 0.9, 1.0], np.float32),
        top_k=np.array([0, 8, 0, 16], np.int32),
    )
    prompts = [[5, 6, 7], [8, 9], [10, 11, 12, 13], [3]]
    first = eng.fetch(eng.prefill_batch_to_slots_async(
        prompts, [0, 1, 2, 3], key, scfg))
    eng2.prefill_batch_to_slots_async(prompts, [0, 1, 2, 3], key, scfg)
    lens = np.array([len(p) for p in prompts], np.int32)
    toks = np.asarray(first, np.int32)

    out_overlap, eng.cache = eng._decode_n(
        eng.params, eng.cache, eng._h(lens), eng._h(toks),
        eng._h(key), eng._htree(scfg), n, greedy_only=False)
    out_step, eng2.cache = eng2._decode_n_stepwise(
        eng2.params, eng2.cache, eng2._h(lens), eng2._h(toks),
        eng2._h(key), eng2._htree(scfg), n, greedy_only=False)
    assert np.array_equal(eng.fetch(out_overlap), eng2.fetch(out_step))
