"""Training-layer tests: loss decreases, optimizers match expectations, and the
sharded train step agrees with the single-device one (reference analog:
tests/training_tests.sh smoke + accuracy scripts, tests/align optimizer math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.parallel import make_mesh
from flexflow_tpu.training import AdamOptimizer, SGDOptimizer, Trainer
from flexflow_tpu.training.losses import sparse_categorical_crossentropy

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=64,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=64,
    max_position_embeddings=64,
    norm_eps=1e-6,
)


def _data(batch=8, seqlen=16, n=4, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        toks = rng.randint(0, TINY.vocab_size, size=(batch, seqlen)).astype(np.int32)
        labels = np.roll(toks, -1, axis=1)
        labels[:, -1] = -100
        out.append((toks, labels))
    return out


def test_sgd_math():
    opt = SGDOptimizer(lr=0.1, momentum=0.9)
    params = {"w": jnp.ones((2,))}
    state = opt.init(params)
    grads = {"w": jnp.full((2,), 2.0)}
    p1, state = opt.update(grads, state, params)
    np.testing.assert_allclose(p1["w"], 1.0 - 0.1 * 2.0)
    p2, state = opt.update(grads, state, p1)
    # v2 = 0.9*2 + 2 = 3.8
    np.testing.assert_allclose(p2["w"], p1["w"] - 0.1 * 3.8, rtol=1e-6)


def test_adam_math():
    opt = AdamOptimizer(lr=0.1)
    params = {"w": jnp.zeros((1,))}
    state = opt.init(params)
    grads = {"w": jnp.full((1,), 3.0)}
    p1, state = opt.update(grads, state, params)
    # first step: mhat == g, vhat == g^2 -> update == -lr * sign(g) (eps small)
    np.testing.assert_allclose(p1["w"], -0.1, rtol=1e-5)


def test_sparse_cce_ignore_index():
    logits = jnp.zeros((2, 3, 4))
    labels = jnp.array([[0, 1, -100], [2, -100, -100]])
    loss = sparse_categorical_crossentropy(logits, labels)
    np.testing.assert_allclose(loss, np.log(4.0), rtol=1e-6)


def test_loss_decreases():
    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))
    tr = Trainer(TINY, params, AdamOptimizer(lr=1e-2))
    data = _data(n=2)
    first = tr.train_step(*data[0])
    for _ in range(10):
        last = tr.train_step(*data[0])
    assert last < first


def test_sharded_step_matches_single():
    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))
    data = _data(n=3)

    tr1 = Trainer(TINY, params, SGDOptimizer(lr=0.05))
    tr2 = Trainer(
        TINY, params, SGDOptimizer(lr=0.05), mesh=make_mesh(data=2, model=2)
    )
    for toks, labels in data:
        l1 = tr1.train_step(toks, labels)
        l2 = tr2.train_step(toks, labels)
        np.testing.assert_allclose(l1, l2, atol=1e-5, rtol=1e-5)
    # final params agree
    flat1 = jax.tree.leaves(tr1.params)
    flat2 = jax.tree.leaves(tr2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_fit_and_evaluate():
    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))
    tr = Trainer(TINY, params, AdamOptimizer(lr=1e-2))
    hist = tr.fit(_data(n=3), epochs=2)
    assert len(hist) == 2
    res = tr.evaluate(_data(n=2, seed=1))
    assert "loss" in res and "accuracy" in res
    assert 0.0 <= res["accuracy"] <= 1.0


def test_dataloader_sharded():
    from flexflow_tpu.parallel import make_mesh
    from flexflow_tpu.training.dataloader import SingleDataLoader

    rng = np.random.RandomState(0)
    x = rng.randn(40, 8).astype(np.float32)
    y = rng.randint(0, 4, 40).astype(np.int32)
    mesh = make_mesh(data=4)
    dl = SingleDataLoader([x, y], batch_size=8, mesh=mesh, seed=3)
    assert dl.num_batches == 5
    seen = 0
    for bx, by in dl:
        assert bx.shape == (8, 8) and by.shape == (8,)
        assert len(bx.sharding.device_set) == 4
        seen += 1
    assert seen == 5
    # shuffling differs across epochs but covers all data
    all1 = np.concatenate([np.asarray(b[1]) for b in dl.epoch()])
    all2 = np.concatenate([np.asarray(b[1]) for b in dl.epoch()])
    assert sorted(all1.tolist()) == sorted(all2.tolist())
