"""Checkpoint/resume tests (exceeds reference §5.4: full train-state resume)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.quant import quantize_params
from flexflow_tpu.training import AdamOptimizer, Trainer
from flexflow_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_lora_adapter,
)

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


def _same_tree(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_params(tmp_path):
    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, params)
    loaded = load_checkpoint(p)
    _same_tree(params, loaded)


def test_roundtrip_quantized(tmp_path):
    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))
    q = quantize_params(TINY, params, bits=4, group_size=16,
                        compute_dtype=jnp.float32)
    p = str(tmp_path / "q.npz")
    save_checkpoint(p, q)
    loaded = load_checkpoint(p)
    from flexflow_tpu.quant import dequantize

    np.testing.assert_array_equal(
        np.asarray(dequantize(q["layers"]["wq"])),
        np.asarray(dequantize(loaded["layers"]["wq"])),
    )


def test_train_resume(tmp_path):
    rng = np.random.RandomState(0)
    toks = rng.randint(0, TINY.vocab_size, size=(8, 12)).astype(np.int32)
    labels = np.roll(toks, -1, axis=1)

    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))
    tr = Trainer(TINY, params, AdamOptimizer(lr=1e-2))
    for _ in range(3):
        tr.train_step(toks, labels)

    p = str(tmp_path / "train.npz")
    save_checkpoint(p, {"params": tr.params, "opt": tr.opt_state})
    for _ in range(2):
        ref_loss = tr.train_step(toks, labels)

    ck = load_checkpoint(p)
    tr2 = Trainer(TINY, ck["params"], AdamOptimizer(lr=1e-2))
    tr2.opt_state = ck["opt"]
    for _ in range(2):
        new_loss = tr2.train_step(toks, labels)
    np.testing.assert_allclose(ref_loss, new_loss, rtol=1e-5)


def test_lora_export(tmp_path):
    from flexflow_tpu.peft import LoraConfig, init_lora_params

    cfg = LoraConfig(rank=4, target_modules=("wq",))
    lora = init_lora_params(TINY, cfg, 3, jax.random.PRNGKey(0))
    p = str(tmp_path / "adapter1.npz")
    save_lora_adapter(p, lora, adapter=1)
    loaded = load_checkpoint(p)
    np.testing.assert_array_equal(
        np.asarray(lora["wq"]["a"][:, 1]), np.asarray(loaded["wq"]["a"])
    )
