"""Speculative decoding tests.

Key gate (mirrors reference cpp_inference_tests.sh:185-186): tree-speculative
output must EXACTLY equal incremental-decoding output (lossless greedy
verification), and decoding steps must shrink when the draft is accurate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager
from flexflow_tpu.serving.spec_manager import SpecRequestManager
from flexflow_tpu.serving.speculative import SpecEngine

LLM = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=96,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=256,
    norm_eps=1e-6,
)

SSM = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=96,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=64,
    max_position_embeddings=256,
    norm_eps=1e-6,
)


@pytest.fixture(scope="module")
def llm_params():
    return params_lib.init_params(LLM, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def ssm_params():
    return params_lib.init_params(SSM, jax.random.PRNGKey(1))


def incr_outputs(llm_params, prompts, max_new):
    engine = InferenceEngine(
        LLM, llm_params, max_requests_per_batch=4, max_seq_len=128,
        cache_dtype=jnp.float32,
    )
    rm = RequestManager(engine)
    return [
        r.output_tokens
        for r in rm.generate(prompts, GenerationConfig(max_new_tokens=max_new))
    ]


def spec_outputs(llm_params, draft_spec, draft_params, prompts, max_new, **kw):
    engine = SpecEngine(
        LLM, llm_params, draft_spec, draft_params,
        beam_width=kw.pop("beam_width", 2),
        beam_depth=kw.pop("beam_depth", 3),
        max_requests_per_batch=4,
        max_seq_len=128,
        cache_dtype=jnp.float32,
    )
    rm = SpecRequestManager(engine)
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=max_new))
    return [r.output_tokens for r in reqs], rm


def test_spec_equals_incremental(llm_params, ssm_params):
    prompts = [[3, 17, 91, 5], [8, 13, 21], [2, 40, 41, 42, 43]]
    want = incr_outputs(llm_params, prompts, 12)
    got, rm = spec_outputs(llm_params, SSM, ssm_params, prompts, 12)
    assert got == want
    assert rm.mean_verified_tokens_per_step >= 1.0


def test_perfect_draft_accepts_tree_depth(llm_params):
    """Draft == LLM: every speculated token verifies, so steps collapse to
    ~max_new / (depth + 1) (the reference's decoding-steps speed gate,
    cpp_inference_tests.sh:155-183)."""
    prompts = [[3, 17, 91, 5]]
    want = incr_outputs(llm_params, prompts, 12)
    got, rm = spec_outputs(
        llm_params, LLM, llm_params, prompts, 12, beam_width=2, beam_depth=3
    )
    assert got == want
    # 12 tokens: prefill produces 1, each spec step accepts depth+1 = 4
    # -> ceil(11/4) = 3 steps
    assert rm.total_decoding_steps <= 4
    assert rm.mean_verified_tokens_per_step >= 3.0


def test_spec_continuous_batching(llm_params, ssm_params):
    prompts = [[i + 1, i + 2, i + 3] for i in range(7)]  # > 4 slots
    want = incr_outputs(llm_params, prompts, 8)
    got, rm = spec_outputs(llm_params, SSM, ssm_params, prompts, 8)
    assert got == want
    assert rm.num_processed_requests == 7


def test_spec_eos(llm_params, ssm_params):
    prompts = [[3, 17, 91, 5]]
    [full] = incr_outputs(llm_params, prompts, 12)
    # pick an EOS token at its FIRST occurrence so truncation point is defined
    first_idx = {}
    for i, t in enumerate(full):
        first_idx.setdefault(t, i)
    eos, cut = max(first_idx.items(), key=lambda kv: kv[1])
    engine = SpecEngine(
        LLM, llm_params, SSM, ssm_params,
        beam_width=2, beam_depth=3, max_requests_per_batch=2, max_seq_len=128,
        cache_dtype=jnp.float32,
    )
    rm = SpecRequestManager(engine, eos_token_ids=[eos])
    [req] = rm.generate(prompts, GenerationConfig(max_new_tokens=12))
    assert req.output_tokens == full[: cut + 1]


def test_fused_spec_equals_incremental(llm_params, ssm_params):
    prompts = [[3, 17, 91, 5], [8, 13, 21], [2, 40, 41, 42, 43]]
    want = incr_outputs(llm_params, prompts, 12)
    engine = SpecEngine(
        LLM, llm_params, SSM, ssm_params,
        beam_width=2, beam_depth=3, max_requests_per_batch=4,
        max_seq_len=128, cache_dtype=jnp.float32,
    )
    rm = SpecRequestManager(engine, fused=True)
    got = [r.output_tokens
           for r in rm.generate(prompts, GenerationConfig(max_new_tokens=12))]
    assert got == want
    assert rm.mean_verified_tokens_per_step >= 1.0


def test_fused_perfect_draft(llm_params):
    prompts = [[3, 17, 91, 5]]
    want = incr_outputs(llm_params, prompts, 12)
    engine = SpecEngine(
        LLM, llm_params, LLM, llm_params,
        beam_width=2, beam_depth=3, max_requests_per_batch=2,
        max_seq_len=128, cache_dtype=jnp.float32,
    )
    rm = SpecRequestManager(engine, fused=True)
    got = [r.output_tokens
           for r in rm.generate(prompts, GenerationConfig(max_new_tokens=12))]
    assert got == want
    assert rm.total_decoding_steps <= 4


def test_fused_spec_horizon(llm_params, ssm_params):
    prompts = [[3, 17, 91, 5], [8, 13, 21]]
    want = incr_outputs(llm_params, prompts, 12)
    engine = SpecEngine(
        LLM, llm_params, SSM, ssm_params,
        beam_width=2, beam_depth=3, max_requests_per_batch=2,
        max_seq_len=200, cache_dtype=jnp.float32,
    )
    rm = SpecRequestManager(engine, fused=True, spec_horizon=3)
    got = [r.output_tokens
           for r in rm.generate(prompts, GenerationConfig(max_new_tokens=12))]
    assert got == want


def test_pipelined_spec_equals_incremental(llm_params, ssm_params):
    """Pipelined dispatch (horizon k+1 issued before fetching k) is lossless:
    outputs equal incremental greedy, including continuous batching churn."""
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]  # > 2 slots: churn
    want = incr_outputs(llm_params, prompts, 10)
    engine = SpecEngine(
        LLM, llm_params, SSM, ssm_params,
        beam_width=2, beam_depth=3, max_requests_per_batch=2,
        max_seq_len=200, cache_dtype=jnp.float32,
    )
    rm = SpecRequestManager(engine, fused=True, spec_horizon=2, pipelined=True)
    got = [r.output_tokens
           for r in rm.generate(prompts, GenerationConfig(max_new_tokens=10))]
    assert got == want
    assert rm.num_processed_requests == 5


def test_pipelined_spec_round_down_equals_incremental(llm_params, ssm_params):
    """horizon_round="down" (largest pow2 bucket BELOW the projected
    remaining-iteration estimate, trailing small dispatches for the rest)
    is lossless: outputs equal incremental greedy. The mode only changes
    which tail horizons get dispatched, never what they produce."""
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
    want = incr_outputs(llm_params, prompts, 10)
    engine = SpecEngine(
        LLM, llm_params, SSM, ssm_params,
        beam_width=2, beam_depth=3, max_requests_per_batch=2,
        max_seq_len=200, cache_dtype=jnp.float32,
    )
    rm = SpecRequestManager(engine, fused=True, spec_horizon=4, pipelined=True)
    rm.horizon_round = "down"
    got = [r.output_tokens
           for r in rm.generate(prompts, GenerationConfig(max_new_tokens=10))]
    assert got == want
    assert rm.num_processed_requests == 5


def test_pipelined_spec_eos(llm_params, ssm_params):
    prompts = [[3, 17, 91, 5]]
    [full] = incr_outputs(llm_params, prompts, 12)
    first_idx = {}
    for i, t in enumerate(full):
        first_idx.setdefault(t, i)
    eos, cut = max(first_idx.items(), key=lambda kv: kv[1])
    engine = SpecEngine(
        LLM, llm_params, SSM, ssm_params,
        beam_width=2, beam_depth=3, max_requests_per_batch=2,
        max_seq_len=200, cache_dtype=jnp.float32,
    )
    rm = SpecRequestManager(
        engine, eos_token_ids=[eos], fused=True, pipelined=True)
    [req] = rm.generate(prompts, GenerationConfig(max_new_tokens=12))
    assert req.output_tokens == full[: cut + 1]


def test_multi_ssm_rotation(llm_params, ssm_params):
    from flexflow_tpu.serving.spec_manager import MultiSSMSpecManager

    prompts = [[3, 17, 91, 5], [8, 13, 21]]
    want = incr_outputs(llm_params, prompts, 14)

    ssm2_params = params_lib.init_params(SSM, jax.random.PRNGKey(7))
    engines = [
        SpecEngine(LLM, llm_params, SSM, p,
                   beam_width=2, beam_depth=3, max_requests_per_batch=2,
                   max_seq_len=160, cache_dtype=jnp.float32)
        for p in (ssm_params, ssm2_params)
    ]
    rm = MultiSSMSpecManager(engines, fused=True)
    got = [r.output_tokens
           for r in rm.generate(prompts, GenerationConfig(max_new_tokens=14))]
    assert got == want
    assert rm.num_processed_requests == 2


def test_fused_spec_window_bit_exact(llm_params, ssm_params):
    """Length-aware cache-read window in the fused spec horizon is bit-exact
    vs the full-window read (ROADMAP r4 #1 applied to draft + verify)."""
    def make():
        return SpecEngine(
            LLM, llm_params, SSM, ssm_params,
            beam_width=2, beam_depth=3, max_requests_per_batch=2,
            max_seq_len=256, cache_dtype=jnp.float32,
        )

    prompts = [[3, 17, 91, 5], [8, 13, 21]]
    e_w, e_f = make(), make()
    for e in (e_w, e_f):
        for s, p in enumerate(prompts):
            e.prefill_both(np.asarray(p, np.int32), s)
    lens = np.asarray([len(p) for p in prompts], np.int32)
    roots = np.asarray([7, 9], np.int32)
    pw, aw = e_w.fused_step_n(lens, roots, 4, window=32)
    pf, af = e_f.fused_step_n(lens, roots, 4, window=None)
    assert np.array_equal(pw, pf) and np.array_equal(aw, af)
    assert jnp.array_equal(e_w.llm_cache.k, e_f.llm_cache.k)
    assert jnp.array_equal(e_w.ssm_cache.k, e_f.ssm_cache.k)


def test_pipelined_spec_windowed_equals_incremental(llm_params, ssm_params):
    """End-to-end: pipelined spec serving with real (non-None) window buckets
    still exactly equals incremental greedy. max_seq_len 512 with short
    prompts forces the 128-bucket path through the scheduler."""
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
    want = incr_outputs(llm_params, prompts, 10)
    engine = SpecEngine(
        LLM, llm_params, SSM, ssm_params,
        beam_width=2, beam_depth=3, max_requests_per_batch=2,
        max_seq_len=512, cache_dtype=jnp.float32,
    )
    assert engine.attn_window_bucket(10) == 128  # the run really windows
    rm = SpecRequestManager(engine, fused=True, spec_horizon=2, pipelined=True)
    got = [r.output_tokens
           for r in rm.generate(prompts, GenerationConfig(max_new_tokens=10))]
    assert got == want


def test_pipelined_seq_room_cap_prevents_overflow(llm_params, ssm_params):
    """Pipeline-depth > 1 safety (r5): in-flight horizons can commit up to
    depth+1 tokens/iteration on device before the host observes them. The
    dispatch cap must keep even WORST-CASE acceptance inside the cache, and
    the run must stay lossless right up against the sequence limit."""
    from flexflow_tpu.config import config as ffconfig

    prev = ffconfig.pipeline_depth
    ffconfig.pipeline_depth = 4  # deep in-flight queue
    try:
        prompts = [[5, 9, 2], [7, 1]]
        # max_seq barely above prompt + margin: registration margin is
        # spec_horizon*(tree+1) = 4*8 = 32; budgets would exceed seq room
        # without the cap
        engine = SpecEngine(
            LLM, llm_params, SSM, ssm_params,
            beam_width=2, beam_depth=3, max_requests_per_batch=2,
            max_seq_len=64, cache_dtype=jnp.float32,
        )
        rm = SpecRequestManager(engine, fused=True, spec_horizon=4,
                                pipelined=True)
        want = incr_outputs(llm_params, prompts, 40)
        got = [r.output_tokens for r in
               rm.generate(prompts, GenerationConfig(max_new_tokens=40))]
        # requests retire at the seq margin; outputs must be a lossless
        # PREFIX of incremental greedy and lens must never pass the cache
        for g, w in zip(got, want):
            assert g == w[:len(g)], (g, w)
            assert len(g) >= 1
        assert (rm._cache_lens <= 64).all()
    finally:
        ffconfig.pipeline_depth = prev
