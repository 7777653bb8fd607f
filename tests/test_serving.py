"""Serving-path tests: incremental decoding with KV cache must exactly match
full self-attention recomputation (greedy), and continuous batching must give
identical outputs regardless of batching/arrival order — the reference's
internal-consistency gates (cpp_inference_tests.sh:185-215, SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=128,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=128,
    norm_eps=1e-6,
    eos_token_id=None,
)


@pytest.fixture(scope="module")
def tiny_params():
    return params_lib.init_params(TINY, jax.random.PRNGKey(0))


def greedy_reference(spec, params, prompt, n_new):
    """Greedy decoding by full recomputation each step (no cache)."""
    toks = list(prompt)
    for _ in range(n_new):
        t = jnp.asarray([toks], jnp.int32)
        pos = jnp.arange(len(toks), dtype=jnp.int32)[None]
        logits, _ = decoder.forward(spec, params, t, pos)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def make_engine(params, **kw):
    kw.setdefault("max_requests_per_batch", 4)
    kw.setdefault("max_seq_len", 64)
    return InferenceEngine(TINY, params, cache_dtype=jnp.float32, **kw)


def test_incremental_matches_recompute(tiny_params):
    prompt = [3, 17, 91, 5, 8]
    want = greedy_reference(TINY, tiny_params, prompt, 10)

    rm = RequestManager(make_engine(tiny_params))
    [req] = rm.generate([prompt], GenerationConfig(max_new_tokens=10))
    assert req.output_tokens == want


def test_batched_matches_single(tiny_params):
    prompts = [[3, 17, 91], [5, 8, 13, 21, 34], [2], [40, 41, 42, 43]]
    singles = []
    for p in prompts:
        rm = RequestManager(make_engine(tiny_params))
        [req] = rm.generate([p], GenerationConfig(max_new_tokens=8))
        singles.append(req.output_tokens)

    rm = RequestManager(make_engine(tiny_params))
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=8))
    for req, want in zip(reqs, singles):
        assert req.output_tokens == want


def test_continuous_batching_overflow(tiny_params):
    # More requests than slots: the queue must drain with identical outputs.
    prompts = [[i + 1, i + 2, i + 3] for i in range(7)]
    rm = RequestManager(make_engine(tiny_params))
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=6))
    assert all(len(r.output_tokens) == 6 for r in reqs)

    rm2 = RequestManager(make_engine(tiny_params))
    for p, r in zip(prompts, reqs):
        [req] = rm2.generate([p], GenerationConfig(max_new_tokens=6))
        assert req.output_tokens == r.output_tokens


def test_eos_stops(tiny_params):
    prompt = [3, 17, 91, 5, 8]
    toks = greedy_reference(TINY, tiny_params, prompt, 10)
    eos = toks[3]  # pretend the 4th generated token is EOS
    rm = RequestManager(make_engine(tiny_params), eos_token_ids=[eos])
    [req] = rm.generate([prompt], GenerationConfig(max_new_tokens=10))
    assert req.output_tokens == toks[:4]
    assert req.profile.llm_decoding_steps == 4


def test_sampling_reproducible(tiny_params):
    prompt = [3, 17, 91]
    cfg = GenerationConfig(max_new_tokens=12, temperature=0.8, top_p=0.9, top_k=20)
    rm1 = RequestManager(make_engine(tiny_params), seed=7)
    rm2 = RequestManager(make_engine(tiny_params), seed=7)
    [a] = rm1.generate([prompt], cfg)
    [b] = rm2.generate([prompt], cfg)
    assert a.output_tokens == b.output_tokens
    assert len(a.output_tokens) == 12


def test_profile_info(tiny_params):
    rm = RequestManager(make_engine(tiny_params))
    [req] = rm.generate([[1, 2, 3]], GenerationConfig(max_new_tokens=5))
    p = req.profile
    assert p.llm_decoding_steps == 5
    assert p.finish_time >= p.first_token_time >= p.start_time > 0
    assert p.ttft >= 0 and p.latency >= p.ttft


def test_background_server(tiny_params):
    rm = RequestManager(make_engine(tiny_params))
    rm.start_background_server()
    try:
        reqs = rm.generate([[3, 17, 91], [5, 8]], GenerationConfig(max_new_tokens=4))
        assert all(len(r.output_tokens) == 4 for r in reqs)
    finally:
        rm.stop_server()


def test_horizon_decode_matches(tiny_params):
    prompts = [[3, 17, 91], [5, 8, 13, 21, 34], [2], [40, 41, 42, 43]]
    base = RequestManager(make_engine(tiny_params))
    want = [
        r.output_tokens
        for r in base.generate(prompts, GenerationConfig(max_new_tokens=9))
    ]
    rm = RequestManager(make_engine(tiny_params), decode_horizon=4)
    got = [
        r.output_tokens
        for r in rm.generate(prompts, GenerationConfig(max_new_tokens=9))
    ]
    assert got == want


def test_horizon_decode_matches_alibi():
    """Regression (round 3): horizon decoding under ALiBi biased in-horizon
    extra-KV columns at the QUERY's position (rel distance 0) instead of
    their own — wrong tokens from the second horizon step on. Gate the
    horizon path against full recomputation for an alibi spec."""
    import dataclasses

    aspec = dataclasses.replace(TINY, pos="alibi", num_kv_heads=4)
    params = params_lib.init_params(aspec, jax.random.PRNGKey(4))
    prompt = [5, 6, 7]
    want = greedy_reference(aspec, params, prompt, 12)
    rm = RequestManager(
        InferenceEngine(aspec, params, max_requests_per_batch=4,
                        max_seq_len=64, cache_dtype=jnp.float32),
        decode_horizon=4,
    )
    [req] = rm.generate([prompt], GenerationConfig(max_new_tokens=12))
    assert req.output_tokens == want


def test_horizon_eos_truncates(tiny_params):
    prompt = [3, 17, 91, 5, 8]
    toks = greedy_reference(TINY, tiny_params, prompt, 10)
    eos = toks[3]
    rm = RequestManager(
        make_engine(tiny_params), eos_token_ids=[eos], decode_horizon=4
    )
    [req] = rm.generate([prompt], GenerationConfig(max_new_tokens=10))
    assert req.output_tokens == toks[:4]


def test_pipelined_decode_matches(tiny_params):
    prompts = [[3, 17, 91], [5, 8, 13, 21, 34], [2], [40, 41, 42, 43]]
    base = RequestManager(make_engine(tiny_params))
    want = [
        r.output_tokens
        for r in base.generate(prompts, GenerationConfig(max_new_tokens=9))
    ]
    rm = RequestManager(
        make_engine(tiny_params), decode_horizon=4, pipelined=True
    )
    got = [
        r.output_tokens
        for r in rm.generate(prompts, GenerationConfig(max_new_tokens=9))
    ]
    assert got == want


def test_pipelined_overflow_queue(tiny_params):
    prompts = [[i + 1, i + 2] for i in range(9)]  # > 4 slots, forces reuse
    base = RequestManager(make_engine(tiny_params))
    want = [
        r.output_tokens
        for r in base.generate(prompts, GenerationConfig(max_new_tokens=6))
    ]
    rm = RequestManager(
        make_engine(tiny_params), decode_horizon=3, pipelined=True
    )
    got = [
        r.output_tokens
        for r in rm.generate(prompts, GenerationConfig(max_new_tokens=6))
    ]
    assert got == want


def test_chunked_prefill_matches(tiny_params):
    prompt = list(range(2, 30))  # 28 tokens, chunk budget 8 -> 4 chunks
    base = RequestManager(make_engine(tiny_params))
    [want] = base.generate([prompt], GenerationConfig(max_new_tokens=8))

    chunked_engine = InferenceEngine(
        TINY, tiny_params, max_requests_per_batch=4, max_seq_len=64,
        max_tokens_per_batch=8, cache_dtype=jnp.float32,
    )
    rm = RequestManager(chunked_engine)
    [got] = rm.generate([prompt], GenerationConfig(max_new_tokens=8))
    assert got.output_tokens == want.output_tokens

    # pipelined path also takes the chunked route
    chunked2 = InferenceEngine(
        TINY, tiny_params, max_requests_per_batch=4, max_seq_len=64,
        max_tokens_per_batch=8, cache_dtype=jnp.float32,
    )
    rm2 = RequestManager(chunked2, decode_horizon=4, pipelined=True)
    [got2] = rm2.generate([prompt], GenerationConfig(max_new_tokens=8))
    assert got2.output_tokens == want.output_tokens


def test_cpu_offload_matches_resident():
    """--offload (host-resident layer weights streamed per layer) must be
    output-identical to device-resident serving. Reference: config.h:189 +
    file_loader.cc offload paths; round 1 shipped the flag dead."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from flexflow_tpu import specs
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import (
        GenerationConfig, InferenceEngine, RequestManager,
    )

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=256, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, intermediate_size=128,
        max_position_embeddings=256, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)
    prompts = [np.random.RandomState(i).randint(1, 256, size=12).tolist()
               for i in range(3)]
    cfg = GenerationConfig(max_new_tokens=12)

    def run(offload):
        eng = InferenceEngine(
            spec, params, max_requests_per_batch=3, max_seq_len=64,
            cache_dtype=jnp.float32, offload=offload,
        )
        if offload:
            assert (
                eng.params["layers"]["wq"].sharding.memory_kind
                == "pinned_host"
            )
        return [r.output_tokens
                for r in RequestManager(eng).generate(prompts, cfg)]

    assert run(True) == run(False)


def test_drain_aware_horizon_dispatch():
    """The scheduler must not dispatch a full horizon into a retiring wave:
    with max_new=10 and decode_horizon=64, total dispatched steps stay near
    the pow2 bucket of the remaining budget, not 64 per iteration."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from flexflow_tpu import specs
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import (
        GenerationConfig, InferenceEngine, RequestManager,
    )

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=128, hidden_size=32, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=16, intermediate_size=64,
        max_position_embeddings=256, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)
    eng = InferenceEngine(spec, params, max_requests_per_batch=2,
                          max_seq_len=128, cache_dtype=jnp.float32)
    rm = RequestManager(eng, decode_horizon=64, pipelined=True)
    prompts = [[1, 2, 3], [4, 5]]
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=10))
    assert all(len(r.output_tokens) == 10 for r in reqs)
    # 1 from prefill + 9 remaining -> pow2 bucket 16 (not 64), maybe twice
    assert rm.total_decoding_steps <= 32, rm.total_decoding_steps


def test_chunked_prefill_final_partial_window(tiny_params):
    """Regression (round-3 review): a final chunk whose fixed-width commit
    window crossed the cache end used to get its START clipped, shifting
    the whole window onto earlier committed positions and corrupting the
    prompt KV. Out-of-range columns must simply drop."""
    prompt = list(range(2, 52))  # 50 tokens; budget 24 -> windows 0/24/48..72
    base = RequestManager(make_engine(tiny_params))  # max_seq_len=64
    [want] = base.generate([prompt], GenerationConfig(max_new_tokens=6))

    chunked_engine = InferenceEngine(
        TINY, tiny_params, max_requests_per_batch=4, max_seq_len=64,
        max_tokens_per_batch=24, cache_dtype=jnp.float32,
    )
    [got] = RequestManager(chunked_engine).generate(
        [prompt], GenerationConfig(max_new_tokens=6))
    assert got.output_tokens == want.output_tokens


def test_horizon_generates_to_context_limit(tiny_params):
    """Regression (round 3): horizon engines used to retire requests a full
    horizon EARLY near the context limit (the leave-room margin); the
    dispatcher now clamps horizons to the remaining headroom so every
    configuration decodes to the last cache position with identical
    tokens."""
    prompt = [3, 17, 91, 5, 8]
    room = 48 - len(prompt)

    def run(**kw):
        eng = InferenceEngine(
            TINY, tiny_params, max_requests_per_batch=2, max_seq_len=48,
            cache_dtype=jnp.float32,
        )
        [r] = RequestManager(eng, **kw).generate(
            [prompt], GenerationConfig(max_new_tokens=60))
        return r.output_tokens

    a = run()
    assert len(a) == room
    assert run(decode_horizon=8) == a
    assert run(decode_horizon=8, pipelined=True) == a
    assert run(decode_horizon=16, pipelined=True, pipeline_depth=3) == a


def test_mesh_offload_matches_resident():
    """--offload under a TP/DP mesh (ROADMAP r3 #6: the jaxlib RET_CHECK in
    spmd_partitioner is fixed on this version): host-resident TP-sharded
    layer weights streamed per scan iteration must be output-identical to
    the device-resident mesh engine."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from flexflow_tpu import specs
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.parallel import make_mesh
    from flexflow_tpu.serving import (
        GenerationConfig, InferenceEngine, RequestManager,
    )

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=256, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=16, intermediate_size=128,
        max_position_embeddings=256, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)
    prompts = [np.random.RandomState(i).randint(1, 256, size=12).tolist()
               for i in range(4)]
    cfg = GenerationConfig(max_new_tokens=12)

    def run(offload):
        mesh = make_mesh(data=2, model=2)
        eng = InferenceEngine(
            spec, params, max_requests_per_batch=4, max_seq_len=64,
            cache_dtype=jnp.float32, offload=offload, mesh=mesh,
        )
        if offload:
            leaf = jax.tree_util.tree_leaves(eng.params["layers"])[0]
            assert leaf.sharding.memory_kind == "pinned_host", leaf.sharding
        reqs = RequestManager(eng).generate(prompts, cfg)
        return [r.output_tokens for r in reqs]

    assert run(False) == run(True)


def test_attn_window_bit_exact(tiny_params):
    """Length-aware attention window (static cache-read bucket) is bit-exact
    vs the full-window read, for horizon decode, single-step decode, and the
    committed cache state (ROADMAP r4 #1: attention read the full [S])."""
    from flexflow_tpu.ops.sampling import SamplingConfig

    e_w = make_engine(tiny_params, max_seq_len=128)
    e_f = make_engine(tiny_params, max_seq_len=128)
    prompt = np.asarray([3, 17, 91, 5, 8, 44, 2], np.int32)
    for e in (e_w, e_f):
        for s in range(4):
            e.prefill_to_slot(prompt, s, jax.random.PRNGKey(9),
                              SamplingConfig.greedy(1))
    lens = np.full((4,), len(prompt), np.int32)
    toks = np.arange(4, dtype=np.int32) + 5
    scfg = SamplingConfig.greedy(4)
    a = e_w.decode_horizon(lens, toks, jax.random.PRNGKey(3), scfg, 8,
                           window=16)
    b = e_f.decode_horizon(lens, toks, jax.random.PRNGKey(3), scfg, 8,
                           window=None)
    assert np.array_equal(a, b)
    a1 = e_w.decode(lens + 8, a[-1], jax.random.PRNGKey(4), scfg, window=32)
    b1 = e_f.decode(lens + 8, b[-1], jax.random.PRNGKey(4), scfg, window=None)
    assert np.array_equal(a1, b1)
    # commits must land identically in the FULL cache on both paths
    assert jnp.array_equal(e_w.cache.k, e_f.cache.k)
    assert jnp.array_equal(e_w.cache.v, e_f.cache.v)
    # cross-continue: windowed state feeds a full-window program and back
    a2 = e_w.decode_horizon(lens + 9, a1, jax.random.PRNGKey(5), scfg, 4,
                            window=None)
    b2 = e_f.decode_horizon(lens + 9, b1, jax.random.PRNGKey(5), scfg, 4,
                            window=32)
    assert np.array_equal(a2, b2)


def test_attn_window_bucket_policy(tiny_params):
    e = make_engine(tiny_params, max_seq_len=512)
    assert e.attn_window_bucket(1) == 128
    assert e.attn_window_bucket(128) == 128
    assert e.attn_window_bucket(129) == 256
    assert e.attn_window_bucket(300) is None  # >= max_seq_len -> full
    assert e.attn_window_bucket(512) is None
