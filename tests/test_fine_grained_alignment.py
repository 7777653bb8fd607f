"""Fine-grained per-layer alignment vs HF forward hooks (utils/alignment.py).

Reference: tests/inference/inference_alignment_test.py +
tests/fine_grained_alignment_test.sh diff the --inference-debugging tensor
dumps against HF hook captures per decoding step. Gates here:

- every zoo family aligns LAYER BY LAYER (not just at the logits) on the
  prompt forward whose last position is the decode step's computation;
- the harness LOCALIZES an injected per-layer perturbation to exactly the
  perturbed layer (the property that makes it a debugging tool);
- the file-based flow (DebugDumper tree -> comparison) agrees with the
  in-memory one.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.utils.alignment import (
    compare_dump_with_hf, compare_with_hf, first_divergence,
)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

ATOL = 2e-3


def _family_cfg(family):
    if family == "llama":
        cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=64)
        cfg.architectures = ["LlamaForCausalLM"]
    elif family == "opt":
        cfg = transformers.OPTConfig(
            vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=3,
            num_attention_heads=4, max_position_embeddings=64,
            do_layer_norm_before=True, word_embed_proj_dim=64)
        cfg.architectures = ["OPTForCausalLM"]
    elif family == "falcon":
        cfg = transformers.FalconConfig(
            vocab_size=256, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, multi_query=True, parallel_attn=True,
            new_decoder_architecture=False, bias=False, alibi=False)
        cfg.architectures = ["FalconForCausalLM"]
    elif family == "mpt":
        cfg = transformers.MptConfig(
            vocab_size=256, d_model=64, n_layers=3, n_heads=4,
            expansion_ratio=2, max_seq_len=64)
        cfg.architectures = ["MptForCausalLM"]
    elif family == "starcoder":
        cfg = transformers.GPTBigCodeConfig(
            vocab_size=256, n_embd=64, n_layer=3, n_head=4, n_positions=64,
            multi_query=True)
        cfg.architectures = ["GPTBigCodeForCausalLM"]
    elif family == "mixtral":
        cfg = transformers.MixtralConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=64)
        cfg.architectures = ["MixtralForCausalLM"]
    else:
        raise ValueError(family)
    return cfg


def _build(family):
    torch.manual_seed(0)
    cfg = _family_cfg(family)
    model = getattr(transformers, cfg.architectures[0])(cfg).eval()
    cfg_dict = cfg.to_dict()
    cfg_dict["architectures"] = cfg.architectures
    spec = specs.from_hf_config(cfg_dict)
    params = params_lib.convert_hf_state_dict(spec, model.state_dict())
    tokens = np.random.RandomState(0).randint(
        0, spec.vocab_size, size=(2, 12))
    return spec, params, model, tokens


@pytest.mark.parametrize(
    "family", ["llama", "opt", "falcon", "mpt", "starcoder", "mixtral"])
def test_layerwise_alignment(family):
    spec, params, model, tokens = _build(family)
    report = compare_with_hf(spec, params, model, tokens)
    assert len(report) == spec.num_layers + 1
    bad = first_divergence(report, ATOL)
    assert bad is None, f"{family}: diverged at {bad}: {report}"


@pytest.mark.parametrize("layer", [0, 1, 2])
def test_localizes_injected_perturbation(layer):
    """The Done-gate from VERDICT r4 #6: a perturbation injected into layer
    k's weights must be reported FIRST at layers.k.output."""
    spec, params, model, tokens = _build("llama")
    layers = dict(params["layers"])
    wq = np.array(layers["wq"])  # writable copy
    wq[layer] = wq[layer] + 0.5 * np.random.RandomState(1).standard_normal(
        wq[layer].shape).astype(wq.dtype)
    layers["wq"] = jnp.asarray(wq)
    perturbed = {**params, "layers": layers}
    report = compare_with_hf(spec, perturbed, model, tokens)
    assert first_divergence(report, ATOL) == f"layers.{layer}.output"
    # layers BEFORE the perturbed one still align
    for name, diff in report[:layer]:
        assert diff <= ATOL, (name, diff)


def test_dump_tree_flow_matches(tmp_path):
    """File-based comparison (reference --inference-debugging flow) agrees
    with the in-memory one."""
    from flexflow_tpu.utils.debug_dump import DebugDumper, forward_with_traces

    spec, params, model, tokens = _build("llama")
    positions = np.broadcast_to(np.arange(tokens.shape[1]), tokens.shape)
    _logits, traces = forward_with_traces(
        spec, params, jnp.asarray(tokens), jnp.asarray(positions))
    dumper = DebugDumper(str(tmp_path))
    dumper.dump_step(traces)
    report_f = compare_dump_with_hf(str(tmp_path), model, tokens)
    report_m = compare_with_hf(spec, params, model, tokens)
    assert [n for n, _ in report_f] == [n for n, _ in report_m]
    for (_, a), (_, b) in zip(report_f, report_m):
        assert a == pytest.approx(b, abs=1e-6)
    assert first_divergence(report_f, ATOL) is None
