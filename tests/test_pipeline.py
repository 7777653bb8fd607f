"""Pipeline-parallelism tests: PP logits must exactly match single-device
(the reference's TP-vs-PP consistency gate, cpp_inference_tests.sh:205-215),
and PP must compose with DP/TP and with jax.grad (GPipe-style training)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.parallel import make_mesh
from flexflow_tpu.parallel.pipeline import pipeline_forward, stage_params
from flexflow_tpu.training.losses import sparse_categorical_crossentropy

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=96,
    hidden_size=64,
    num_layers=4,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=64,
    norm_eps=1e-6,
)


@pytest.fixture(scope="module")
def tiny_params():
    return params_lib.init_params(TINY, jax.random.PRNGKey(0))


def _data(b=8, t=12):
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, TINY.vocab_size, size=(b, t)).astype(np.int32)
    positions = np.broadcast_to(np.arange(t, dtype=np.int32), (b, t))
    return jnp.asarray(tokens), jnp.asarray(positions)


def _staged(params, n):
    return {**params, "layers": stage_params(params["layers"], n)}


def test_pp_matches_single(tiny_params):
    tokens, positions = _data()
    want, _ = decoder.forward(TINY, tiny_params, tokens, positions)

    mesh = make_mesh(data=1, pipe=4, model=1)
    staged = _staged(tiny_params, 4)
    got = pipeline_forward(
        TINY, staged, tokens, positions, mesh=mesh, num_microbatches=4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_pp_with_tp(tiny_params):
    tokens, positions = _data()
    want, _ = decoder.forward(TINY, tiny_params, tokens, positions)

    mesh = make_mesh(data=1, pipe=2, model=2)
    staged = _staged(tiny_params, 2)
    got = pipeline_forward(
        TINY, staged, tokens, positions, mesh=mesh, num_microbatches=2
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_pp_with_dp(tiny_params):
    tokens, positions = _data()
    want, _ = decoder.forward(TINY, tiny_params, tokens, positions)

    mesh = make_mesh(data=2, pipe=2, model=2)
    staged = _staged(tiny_params, 2)
    got = pipeline_forward(
        TINY, staged, tokens, positions, mesh=mesh, num_microbatches=2
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_pp_grad_matches(tiny_params):
    tokens, positions = _data()
    labels = jnp.roll(tokens, -1, axis=1)

    def loss_single(p):
        logits, _ = decoder.forward(TINY, p, tokens, positions)
        return sparse_categorical_crossentropy(logits, labels)

    mesh = make_mesh(data=1, pipe=2, model=1)

    def loss_pp(p):
        staged = _staged(p, 2)
        logits = pipeline_forward(
            TINY, staged, tokens, positions, mesh=mesh, num_microbatches=2
        )
        return sparse_categorical_crossentropy(logits, labels)

    l1, g1 = jax.value_and_grad(loss_single)(tiny_params)
    l2, g2 = jax.value_and_grad(loss_pp)(tiny_params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-3
        )


def test_trainer_with_pipeline(tiny_params):
    import numpy as np

    from flexflow_tpu.training import SGDOptimizer, Trainer

    rng = np.random.RandomState(0)
    toks = rng.randint(0, TINY.vocab_size, size=(8, 12)).astype(np.int32)
    labels = np.roll(toks, -1, axis=1)

    tr1 = Trainer(TINY, tiny_params, SGDOptimizer(lr=0.05))
    mesh = make_mesh(data=2, pipe=2, model=2)
    tr2 = Trainer(TINY, tiny_params, SGDOptimizer(lr=0.05), mesh=mesh,
                  pipeline_stages=2, num_microbatches=2)
    for _ in range(3):
        l1 = tr1.train_step(toks, labels)
        l2 = tr2.train_step(toks, labels)
        np.testing.assert_allclose(l1, l2, atol=1e-4, rtol=1e-4)


def test_balance_stages_dp():
    """Linear-partition DP: minimizes the max contiguous stage sum."""
    from flexflow_tpu.parallel.pipeline import balance_stages

    # uniform costs -> even split
    assert balance_stages([1.0] * 8, 2) == [4, 4]
    assert balance_stages([1.0] * 8, 4) == [2, 2, 2, 2]
    # expensive tail (e.g. MoE layers in the second half): fewer tail layers
    sizes = balance_stages([1, 1, 1, 1, 3, 3, 3, 3], 2)
    assert sizes == [5, 3]  # stage sums 7 vs 9 beat the even split's 4 vs 12
    # single expensive layer dominates
    sizes = balance_stages([1, 1, 10, 1, 1, 1], 3)
    assert max(sizes) >= 1 and sum(sizes) == 6
    cum = [0]
    for s in sizes:
        cum.append(cum[-1] + s)
    stage_sums = [sum([1, 1, 10, 1, 1, 1][cum[i]:cum[i + 1]])
                  for i in range(3)]
    assert max(stage_sums) == 10  # can't beat the single heavy layer


def test_pipeline_uneven_stages_match_even_and_reference():
    """Uneven stage execution (cond-skipped padding) must be numerically
    identical to the even split and the non-pipelined forward (the
    mechanism under balance_stages; ROADMAP r4 #3 / VERDICT r3 #7)."""
    import numpy as np

    from flexflow_tpu.parallel.pipeline import (
        pipeline_forward, stage_params, stage_params_uneven,
    )

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=128, hidden_size=32,
        num_layers=4, num_heads=4, num_kv_heads=4, head_dim=8,
        intermediate_size=64, max_position_embeddings=64, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)
    mesh = make_mesh(pipe=2)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(1, 128, size=(4, 8)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[None], (4, 8))

    ref, _ = decoder.forward(spec, params, toks, pos)

    even = {**params, "layers": stage_params(params["layers"], 2)}
    out_even = pipeline_forward(spec, even, toks, pos, mesh=mesh,
                                num_microbatches=2)
    np.testing.assert_allclose(np.asarray(out_even), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    uneven = {**params,
              "layers": stage_params_uneven(params["layers"], [3, 1])}
    out_uneven = pipeline_forward(spec, uneven, toks, pos, mesh=mesh,
                                  num_microbatches=2, stage_sizes=[3, 1])
    np.testing.assert_allclose(np.asarray(out_uneven), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
