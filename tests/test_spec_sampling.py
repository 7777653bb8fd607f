"""Sampling-mode speculative verification tests.

Pins three properties of spec_sampling.tree_sample_walk + the SpecEngine
sampling path:
1. distribution preservation: the first emitted token of the stochastic walk
   is distributed exactly per the target distribution (Monte Carlo).
2. greedy degeneration: with one-hot targets (temperature <= 0) the walk
   reproduces the lossless greedy walk bit-for-bit, end to end.
3. e2e: sampling requests complete through SpecRequestManager and respect
   stop conditions / budgets.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.ops.sampling import SamplingConfig
from flexflow_tpu.serving import GenerationConfig
from flexflow_tpu.serving.spec_manager import SpecRequestManager
from flexflow_tpu.serving.spec_sampling import tree_sample_walk
from flexflow_tpu.serving.speculative import SpecEngine

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=96,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=4,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=256,
    norm_eps=1e-6,
)


def _dirichlet(key, shape, conc=0.5):
    g = jax.random.gamma(key, conc, shape)
    return g / jnp.sum(g, axis=-1, keepdims=True)


def test_walk_first_token_distribution():
    """Empirical distribution of the first emitted token == target p at the
    root, for ANY fixed draft tree (deterministic proposals are exact)."""
    w, d, v = 2, 2, 8
    t = 1 + w * d
    kp, kt = jax.random.split(jax.random.PRNGKey(0), 2)
    p = _dirichlet(kp, (1, t, v))
    # chain-ish tree: both depth-1 slots children of root; depth-2 of slot 1
    tokens = jnp.asarray([[3, 1, 5, 2, 6]], jnp.int32)
    parents = jnp.asarray([[-1, 0, 0, 1, 1]], jnp.int32)

    n = 40_000
    keys = jax.random.split(kt, n)

    @jax.jit
    @jax.vmap
    def one(key):
        produced, n_acc, _ = tree_sample_walk(
            p, tokens, parents, key, width=w, depth=d
        )
        return produced[0, 0]

    first = np.asarray(one(keys))
    emp = np.bincount(first, minlength=v) / n
    want = np.asarray(p[0, 0])
    # 40k samples: se ~ sqrt(p(1-p)/n) <= 0.0025; 4 sigma
    np.testing.assert_allclose(emp, want, atol=0.011)


def test_walk_second_token_distribution_given_accept():
    """Conditioned on accepting child slot 1, the second emitted token is
    distributed per the target at slot 1."""
    w, d, v = 2, 2, 8
    kp, kt = jax.random.split(jax.random.PRNGKey(7), 2)
    p = _dirichlet(kp, (1, 1 + w * d, v))
    tokens = jnp.asarray([[3, 1, 5, 2, 6]], jnp.int32)
    parents = jnp.asarray([[-1, 0, 0, 1, 1]], jnp.int32)

    n = 60_000
    keys = jax.random.split(kt, n)

    @jax.jit
    @jax.vmap
    def one(key):
        produced, n_acc, from_slots = tree_sample_walk(
            p, tokens, parents, key, width=w, depth=d
        )
        return produced[0], from_slots[0, 1]

    produced, slot1 = map(np.asarray, one(keys))
    took1 = (slot1 == 1) & (produced[:, 0] == 1)  # accepted child slot 1
    assert took1.sum() > 3000
    second = produced[took1, 1]
    emp = np.bincount(second, minlength=v) / took1.sum()
    # law of total prob at slot 1: accepted children of slot 1 (slots 3, 4)
    # and residual samples all combine back to the target at slot 1
    want = np.asarray(p[0, 1])
    np.testing.assert_allclose(emp, want, atol=0.02)


def test_onehot_target_degenerates_to_greedy_walk():
    """One-hot p accepts exactly the matching child and the bonus is the
    argmax: identical contract to the greedy walk."""
    w, d, v = 2, 2, 16
    t = 1 + w * d
    argmaxes = jnp.asarray([[4, 9, 0, 2, 0]], jnp.int32)  # per-slot targets
    p = jax.nn.one_hot(argmaxes, v, dtype=jnp.float32)
    # slot 1 token == root argmax (4): accepted; slot 3/4 children of slot 1,
    # slot 3 token == slot-1 argmax (9): accepted; then bonus = argmax at 3
    tokens = jnp.asarray([[7, 4, 5, 9, 6]], jnp.int32)
    parents = jnp.asarray([[-1, 0, 0, 1, 1]], jnp.int32)
    produced, n_acc, from_slots = tree_sample_walk(
        p, tokens, parents, jax.random.PRNGKey(11), width=w, depth=d
    )
    assert int(n_acc[0]) == 3
    np.testing.assert_array_equal(np.asarray(produced[0]), [4, 9, 2])
    np.testing.assert_array_equal(np.asarray(from_slots[0, :3]), [0, 1, 3])


def _engine():
    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))
    return SpecEngine(
        TINY, params, TINY, params,
        beam_width=2, beam_depth=3,
        max_requests_per_batch=2, max_seq_len=128,
        cache_dtype=jnp.float32,
    )


def test_engine_sample_step_greedy_matches_fused_step():
    """temperature=0 through the sampling kernel == the greedy kernel,
    including KV commits (subsequent steps stay identical)."""
    eng_a, eng_b = _engine(), _engine()
    prompt = np.asarray([5, 9, 3, 17], np.int32)
    fa = eng_a.prefill_both(prompt, 0)
    fb = eng_b.prefill_both(prompt, 0)
    assert fa == fb
    lens = np.asarray([len(prompt), 0], np.int32)
    roots = np.asarray([fa, 0], np.int32)
    scfg = SamplingConfig.greedy(2)
    key = jax.random.PRNGKey(42)
    for _ in range(3):
        pa, na = eng_a.fused_step(lens, roots)
        pb, nb = eng_b.fused_sample_step(lens, roots, key, scfg)
        np.testing.assert_array_equal(na, nb)
        np.testing.assert_array_equal(pa[0, : na[0]], pb[0, : nb[0]])
        lens = lens + na
        roots = np.asarray([pa[0, na[0] - 1], 0], np.int32)


def test_manager_sampling_requests_complete():
    eng = _engine()
    rm = SpecRequestManager(eng, fused=True, seed=1)
    cfg = GenerationConfig(max_new_tokens=12, temperature=0.8, top_p=0.95)
    reqs = rm.generate([[3, 17, 91, 5], [2, 4, 8]], cfg)
    for r in reqs:
        assert 1 <= len(r.output_tokens) <= 12
        assert all(0 <= t < TINY.vocab_size for t in r.output_tokens)
    # mixed batch: one greedy + one sampling resolves via the sampling path
    rm2 = SpecRequestManager(eng, fused=True, seed=2)
    out = rm2.generate(
        [[3, 17, 91, 5]], GenerationConfig(max_new_tokens=8)
    )
    assert len(out[0].output_tokens) == 8


def test_manager_sampling_horizon_staged():
    """The STAGED sampling horizon (fused_sample_step_n, n>1, pipelined):
    requests complete with valid tokens, and a GREEDY slot riding the
    sampling-mode program stays bit-equal to incremental greedy decoding
    (greedy slots are deterministic regardless of keys)."""
    from flexflow_tpu.serving import InferenceEngine, RequestManager

    eng = _engine()
    greedy_prompt = [3, 17, 91, 5]
    incr = RequestManager(
        InferenceEngine(TINY, eng.llm_params, max_requests_per_batch=2,
                        max_seq_len=eng.max_seq_len,
                        cache_dtype=jnp.float32)
    ).generate([greedy_prompt], GenerationConfig(max_new_tokens=10))
    want = incr[0].output_tokens

    rm = SpecRequestManager(eng, fused=True, spec_horizon=2, pipelined=True,
                            seed=5)
    g_greedy = rm.register_request(
        greedy_prompt, GenerationConfig(max_new_tokens=10))
    g_samp = rm.register_request(
        [2, 4, 8],
        GenerationConfig(max_new_tokens=10, temperature=0.9, top_p=0.9))
    rm.run_until_idle()
    greedy_out = rm.get_request(g_greedy).output_tokens
    samp_out = rm.get_request(g_samp).output_tokens
    assert greedy_out == want  # greedy slot deterministic through sampling
    assert 1 <= len(samp_out) <= 10
    assert all(0 <= t < TINY.vocab_size for t in samp_out)
