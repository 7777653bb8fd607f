"""LoRA finetuning vs the HuggingFace `peft` library — the external oracle.

Round-1 gap (VERDICT #5): the LoRA trainer was tested only against itself.
Here the SAME tiny Llama + SAME LoRA adapter (A copied from peft's init,
B zeros) trains with SGD on the SAME batches in both frameworks; the loss
trajectories and the trained A/B matrices must align numerically.

Reference analog: tests/peft/peft_alignment_test.py +
tests/peft/hf_finetune.py (FF finetune vs HF PEFT, loss & tensor alignment).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
peft = pytest.importorskip("peft")

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.peft.finetune import FinetuneSession
from flexflow_tpu.peft.lora import LoraConfig, init_lora_params
from flexflow_tpu.serving import InferenceEngine

RANK, ALPHA, LR, STEPS = 4, 8.0, 5e-2, 4


def _build_hf():
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    model = transformers.LlamaForCausalLM(cfg).float()
    lcfg = peft.LoraConfig(
        r=RANK, lora_alpha=ALPHA, target_modules=["q_proj", "v_proj"],
        lora_dropout=0.0, bias="none", task_type="CAUSAL_LM",
        init_lora_weights=True,
    )
    return peft.get_peft_model(model, lcfg), cfg


def _hf_lora_tensors(pmodel, n_layers):
    """Extract per-layer A [r, D] / B [D_out, r] from the peft model."""
    a_q, b_q, a_v, b_v = [], [], [], []
    sd = {k: v.detach().numpy() for k, v in pmodel.state_dict().items()}
    for i in range(n_layers):
        base = f"base_model.model.model.layers.{i}.self_attn"
        a_q.append(sd[f"{base}.q_proj.lora_A.default.weight"])
        b_q.append(sd[f"{base}.q_proj.lora_B.default.weight"])
        a_v.append(sd[f"{base}.v_proj.lora_A.default.weight"])
        b_v.append(sd[f"{base}.v_proj.lora_B.default.weight"])
    return a_q, b_q, a_v, b_v


def test_lora_finetune_matches_hf_peft():
    pmodel, cfg = _build_hf()
    n_layers = cfg.num_hidden_layers

    # ---- data: fixed random token batches ----
    rng = np.random.RandomState(0)
    seqs = [rng.randint(1, 256, size=17) for _ in range(STEPS)]
    pairs = [
        (s[None, :-1].astype(np.int32), s[None, 1:].astype(np.int32))
        for s in seqs
    ]

    # ---- HF PEFT side: SGD on the adapter only ----
    opt = torch.optim.SGD(
        [p for p in pmodel.parameters() if p.requires_grad], lr=LR
    )
    hf_losses = []
    for toks, labels in pairs:
        opt.zero_grad()
        out = pmodel(
            input_ids=torch.tensor(toks.astype(np.int64)),
            labels=None,
        )
        logits = out.logits  # [1, T, V]
        loss = torch.nn.functional.cross_entropy(
            logits.reshape(-1, logits.shape[-1]),
            torch.tensor(labels.reshape(-1).astype(np.int64)),
        )
        loss.backward()
        opt.step()
        hf_losses.append(float(loss))

    # ---- our side: same base weights, same adapter init ----
    spec = specs.from_hf_config(cfg.to_dict())
    # peft wraps adapted linears: strip ".base_layer" to recover HF names
    base_sd = {
        k.replace(".base_layer", ""): v
        for k, v in pmodel.get_base_model().state_dict().items()
        if "lora" not in k
    }
    params = params_lib.convert_hf_state_dict(spec, base_sd, jnp.float32)
    lcfg = LoraConfig(rank=RANK, alpha=ALPHA, target_modules=("wq", "wv"),
                      learning_rate=LR, optimizer="sgd")
    lora = init_lora_params(spec, lcfg, 1, jax.random.PRNGKey(0), jnp.float32)
    a_q, b_q, a_v, b_v = _hf_lora_tensors(pmodel, n_layers)
    # NOTE: the HF model has already trained; re-init from a FRESH peft model
    fresh, _ = _build_hf()
    a_q, b_q, a_v, b_v = _hf_lora_tensors(fresh, n_layers)
    lora["wq"]["a"] = jnp.asarray(np.stack(a_q), jnp.float32).transpose(
        0, 2, 1
    )[:, None]  # [L, 1, D, r]
    lora["wq"]["b"] = jnp.asarray(np.stack(b_q), jnp.float32).transpose(
        0, 2, 1
    )[:, None]  # [L, 1, r, D_out]
    lora["wv"]["a"] = jnp.asarray(np.stack(a_v), jnp.float32).transpose(
        0, 2, 1
    )[:, None]
    lora["wv"]["b"] = jnp.asarray(np.stack(b_v), jnp.float32).transpose(
        0, 2, 1
    )[:, None]

    engine = InferenceEngine(
        spec, params, max_requests_per_batch=1, max_seq_len=32,
        cache_dtype=jnp.float32, lora=lora, lora_config=lcfg,
    )
    session = FinetuneSession(spec, lcfg, 0, pairs, epochs=1)
    while not session.tick(engine):
        pass

    # ---- loss trajectory alignment ----
    ours = np.asarray(session.losses)
    hf = np.asarray(hf_losses)
    assert ours.shape == hf.shape
    np.testing.assert_allclose(ours, hf, rtol=2e-3, atol=2e-3)

    # ---- trained adapter tensor alignment (slot 0) ----
    a_q_t, b_q_t, _, _ = _hf_lora_tensors(pmodel, n_layers)
    ours_a = np.asarray(engine.lora["wq"]["a"][:, 0]).transpose(0, 2, 1)
    ours_b = np.asarray(engine.lora["wq"]["b"][:, 0]).transpose(0, 2, 1)
    np.testing.assert_allclose(ours_a, np.stack(a_q_t), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(ours_b, np.stack(b_q_t), rtol=5e-3, atol=5e-4)
