"""End-to-end LLM/SSM API test: build a tiny local HF model dir (weights +
config + tokenizer), then serve it through the user API — the analog of the
reference's python_inference_tests.sh smoke path."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from flexflow_tpu.serve import LLM, SSM  # noqa: E402


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama")
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)

    # char-level tokenizer saved as tokenizer.json (loadable fully offline)
    from tokenizers import Tokenizer, models as tok_models

    vocab = {chr(i): (i - 32) for i in range(32, 127)}
    vocab["<unk>"] = len(vocab)
    tok = Tokenizer(tok_models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast"}, f)
    return str(d)


def test_llm_generate(model_dir):
    llm = LLM(model_dir, data_type="float32")
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    [res] = llm.generate("hello", max_new_tokens=8)
    assert len(res.output_tokens) == 8
    assert isinstance(res.output_text, str)
    assert res.latency_ms >= res.ttft_ms >= 0


def test_llm_quantized(model_dir):
    llm = LLM(model_dir, data_type="float32", quantization="int8")
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    [res] = llm.generate("hello", max_new_tokens=4)
    assert len(res.output_tokens) == 4


def test_llm_with_ssm_matches_incremental(model_dir):
    base = LLM(model_dir, data_type="float32")
    base.compile(max_requests_per_batch=2, max_seq_length=64)
    want = [r.output_tokens for r in base.generate(["hello", "abc"], max_new_tokens=8)]

    spec = LLM(model_dir, data_type="float32")
    spec.compile(
        max_requests_per_batch=2,
        max_seq_length=64,
        beam_width=2,
        beam_depth=2,
        ssms=[SSM(model_dir, data_type="float32")],
    )
    got = [r.output_tokens for r in spec.generate(["hello", "abc"], max_new_tokens=8)]
    assert got == want


def test_incr_decoding_cli(model_dir, tmp_path, capsys):
    import json as _json

    from inference import incr_decoding

    prompt_file = tmp_path / "prompts.json"
    prompt_file.write_text(_json.dumps(["hello world", "abc"]))
    rc = incr_decoding.main([
        "-llm-model", model_dir,
        "-prompt", str(prompt_file),
        "--max-requests-per-batch", "2",
        "--max-sequence-length", "64",
        "--max-new-tokens", "6",
        "--full-precision",
        "--fusion",
        "-ll:gpu", "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("=== guid") == 2


def test_spec_infer_cli(model_dir, tmp_path, capsys):
    import json as _json

    from inference import spec_infer

    prompt_file = tmp_path / "prompts.json"
    prompt_file.write_text(_json.dumps(["hello"]))
    rc = spec_infer.main([
        "-llm-model", model_dir,
        "-ssm-model", model_dir,
        "-prompt", str(prompt_file),
        "--max-requests-per-batch", "2",
        "--max-sequence-length", "64",
        "--max-new-tokens", "6",
        "--beam-width", "2", "--beam-depth", "2",
        "--full-precision",
    ])
    assert rc == 0
    assert "verified/step" in capsys.readouterr().out


def test_generate_stream(model_dir):
    """llm.generate_stream yields text deltas that join to the blocking
    generate() output exactly (greedy determinism)."""
    from flexflow_tpu.serve import LLM

    llm = LLM(model_dir, data_type="float32")
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    [want] = llm.generate("hello world", max_new_tokens=8)
    llm.start_server()
    try:
        got = "".join(llm.generate_stream("hello world", max_new_tokens=8))
    finally:
        llm.stop_server()
    assert got == want.output_text
