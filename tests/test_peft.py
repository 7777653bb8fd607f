"""PEFT/LoRA tests (reference analog: tests/peft_test.sh + peft_alignment):
- zero-B adapters are identity
- routed adapter math == dense-merged weights
- per-slot routing (mixed adapter/base in one batch)
- co-scheduled finetuning: loss decreases, base params untouched, serving
  continues to work with the finetuned adapter
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.peft import LoraConfig, init_lora_params, lora_scaling, merge_lora
from flexflow_tpu.peft.finetune import FinetuneSession
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=96,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=128,
    norm_eps=1e-6,
)

CFG = LoraConfig(rank=4, alpha=8.0, target_modules=("wq", "wv", "wd"))


@pytest.fixture(scope="module")
def tiny_params():
    return params_lib.init_params(TINY, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def lora2(tiny_params):
    """Two adapters with random (non-zero) B so they act."""
    lora = init_lora_params(TINY, CFG, 2, jax.random.PRNGKey(1))
    keys = jax.random.split(jax.random.PRNGKey(2), len(lora))
    out = {}
    for k, (mod, ab) in zip(keys, lora.items()):
        out[mod] = {
            "a": ab["a"],
            "b": jax.random.normal(k, ab["b"].shape, jnp.float32) * 0.05,
        }
    return out


def _logits(params, tokens, lora=None, onehot=None):
    pos = jnp.broadcast_to(
        jnp.arange(tokens.shape[1], dtype=jnp.int32)[None], tokens.shape
    )
    logits, _ = decoder.forward(
        TINY, params, tokens, pos,
        lora=lora, adapter_onehot=onehot, lora_scale=lora_scaling(CFG),
    )
    return np.asarray(logits)


def test_zero_b_is_identity(tiny_params):
    lora = init_lora_params(TINY, CFG, 2, jax.random.PRNGKey(1))
    tokens = jnp.asarray([[3, 17, 91, 5]], jnp.int32)
    base = _logits(tiny_params, tokens)
    onehot = jnp.asarray([[1.0, 0.0]])
    with_lora = _logits(tiny_params, tokens, lora, onehot)
    np.testing.assert_allclose(with_lora, base, atol=1e-5)


def test_routed_equals_merged(tiny_params, lora2):
    tokens = jnp.asarray([[3, 17, 91, 5, 8]], jnp.int32)
    for adapter in (0, 1):
        onehot = jax.nn.one_hot(jnp.asarray([adapter]), 2, dtype=jnp.float32)
        routed = _logits(tiny_params, tokens, lora2, onehot)
        merged = merge_lora(TINY, tiny_params, lora2, adapter, CFG)
        dense = _logits(merged, tokens)
        np.testing.assert_allclose(routed, dense, atol=1e-4, rtol=1e-4)
    # adapters actually differ from base
    base = _logits(tiny_params, tokens)
    assert np.abs(_logits(tiny_params, tokens, lora2,
                          jax.nn.one_hot(jnp.asarray([0]), 2)) - base).max() > 1e-3


def test_per_slot_routing(tiny_params, lora2):
    tokens = jnp.asarray([[3, 17, 91], [3, 17, 91], [3, 17, 91]], jnp.int32)
    onehot = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    mixed = _logits(tiny_params, tokens, lora2, onehot)
    a0 = _logits(tiny_params, tokens[:1], lora2, onehot[:1])
    a1 = _logits(tiny_params, tokens[1:2], lora2, onehot[1:2])
    base = _logits(tiny_params, tokens[2:])
    np.testing.assert_allclose(mixed[0], a0[0], atol=1e-4)
    np.testing.assert_allclose(mixed[1], a1[0], atol=1e-4)
    np.testing.assert_allclose(mixed[2], base[0], atol=1e-4)


def test_serving_with_adapter(tiny_params, lora2):
    engine = InferenceEngine(
        TINY, tiny_params, max_requests_per_batch=2, max_seq_len=64,
        cache_dtype=jnp.float32, lora=lora2, lora_config=CFG,
    )
    rm = RequestManager(engine)
    [base_req] = rm.generate([[3, 17, 91]], GenerationConfig(max_new_tokens=6))
    [lora_req] = rm.generate(
        [[3, 17, 91]], GenerationConfig(max_new_tokens=6, adapter_id=0)
    )
    assert len(base_req.output_tokens) == 6
    assert len(lora_req.output_tokens) == 6

    # base-model request must match an engine without LoRA at all
    engine2 = InferenceEngine(
        TINY, tiny_params, max_requests_per_batch=2, max_seq_len=64,
        cache_dtype=jnp.float32,
    )
    rm2 = RequestManager(engine2)
    [plain] = rm2.generate([[3, 17, 91]], GenerationConfig(max_new_tokens=6))
    assert base_req.output_tokens == plain.output_tokens


def test_finetune_coscheduled(tiny_params):
    lora = init_lora_params(TINY, CFG, 1, jax.random.PRNGKey(1))
    engine = InferenceEngine(
        TINY, tiny_params, max_requests_per_batch=2, max_seq_len=64,
        cache_dtype=jnp.float32, lora=lora, lora_config=CFG,
    )
    rm = RequestManager(engine)

    rng = np.random.RandomState(0)
    toks = rng.randint(0, TINY.vocab_size, size=(4, 12)).astype(np.int32)
    labels = np.roll(toks, -1, axis=1)
    cfg = LoraConfig(rank=4, alpha=8.0, target_modules=CFG.target_modules,
                     learning_rate=5e-2)
    session = FinetuneSession(TINY, cfg, 0, [(toks, labels)], epochs=20)
    rm.register_finetune(session)

    base_before = jax.tree.leaves(engine.params)[0]
    [req] = rm.generate([[3, 17, 91]], GenerationConfig(max_new_tokens=4))
    assert len(req.output_tokens) == 4
    assert len(session.losses) == 20
    assert session.losses[-1] < session.losses[0]
    # base params untouched; adapter B no longer zero
    assert base_before is jax.tree.leaves(engine.params)[0]
    assert float(jnp.abs(engine.lora["wq"]["b"]).max()) > 0
