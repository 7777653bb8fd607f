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
