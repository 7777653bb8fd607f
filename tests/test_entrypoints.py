"""Serving entrypoint/usecase breadth (VERDICT r1 #7).

Gates, against the reference's inference/python surface:
- background server works for SPECULATIVE managers too (reference
  start_background_server serves serve_spec_infer as well,
  request_manager.cc:2936/3083) — round 1 refused spec managers;
- the prompt-template and RAG usecases run end-to-end (stdlib fallback
  path of the LangChain wrappers);
- the PEFT CLI (inference/peft.py) co-serves + finetunes + exports an
  HF-PEFT adapter dir that round-trips through register_peft_adapter.
"""

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
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    from tokenizers import Tokenizer, models as tok_models

    vocab = {chr(i): (i - 32) for i in range(32, 127)}
    vocab["<unk>"] = len(vocab)
    tok = Tokenizer(tok_models.BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast"}, f)
    return str(d)


def test_spec_background_server(model_dir):
    llm = LLM(model_dir, data_type="float32")
    llm.compile(
        max_requests_per_batch=2, max_seq_length=64,
        ssms=[SSM(model_dir, data_type="float32")],
        beam_width=2, beam_depth=3,
    )
    llm.start_server()
    try:
        [res] = llm.generate("hello", max_new_tokens=8)
        assert len(res.output_tokens) == 8
    finally:
        llm.stop_server()


def test_prompt_template_usecase(model_dir):
    from inference.usecases.prompt_template_incr import build_chain

    llm = LLM(model_dir, data_type="float32")
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    chain, llm = build_chain(llm=llm, max_new_tokens=6)
    out = chain.run(question="what is up?")
    llm.stop_server()
    assert isinstance(out, str)


def test_rag_usecase(model_dir):
    from inference.usecases.rag_incr import build_rag

    llm = LLM(model_dir, data_type="float32")
    # char-level tokenizer: the stuffed RAG prompt needs seq headroom
    llm.compile(max_requests_per_batch=2, max_seq_length=128)
    docs = ["TPUs multiply fast.", "Bananas are yellow."]
    answer, llm = build_rag(llm=llm, docs=docs, max_new_tokens=4)
    out = answer("TPUs?", k=1)
    llm.stop_server()
    assert isinstance(out, str)


def test_oversize_prompt_rejected_synchronously(model_dir):
    """A too-long prompt must raise at registration, not hang the server."""
    llm = LLM(model_dir, data_type="float32")
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    llm.start_server()
    try:
        with pytest.raises(ValueError, match="max_seq_len"):
            llm.generate("x" * 500, max_new_tokens=4)
    finally:
        llm.stop_server()


def test_retriever_ranks_by_overlap():
    from inference.usecases.langchain_support import TokenOverlapRetriever

    r = TokenOverlapRetriever(
        ["TPUs multiply matrices quickly.", "Bananas are yellow fruit."],
        chunk_chars=100,
    )
    top = r.retrieve("how do TPUs multiply matrices", k=1)
    assert "TPU" in top[0]


def test_peft_cli_end_to_end(model_dir, tmp_path, capsys):
    from inference.peft import main as peft_main

    dataset = tmp_path / "data.json"
    prompts = tmp_path / "prompts.json"
    json.dump(["hello world hello world"] * 2, open(dataset, "w"))
    json.dump(["hello "], open(prompts, "w"))
    adapter_dir = str(tmp_path / "adapter")
    rc = peft_main([
        "-llm-model", model_dir, "-enable-peft",
        "-prompt", str(prompts), "-finetuning-dataset", str(dataset),
        "--max-new-tokens", "4", "--max-training-steps", "2",
        "--max-sequence-length", "64", "--full-precision",
        "--save-peft", adapter_dir,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[Finetune] steps" in out
    assert os.path.exists(os.path.join(adapter_dir, "adapter_model.safetensors"))

    # round-trip: serve through the exported adapter
    llm = LLM(model_dir, data_type="float32")
    aid = llm.register_peft_adapter(adapter_dir)
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    [res] = llm.generate("hello", max_new_tokens=4, adapter_id=aid)
    assert len(res.output_tokens) == 4


def test_openai_compatible_server(model_dir):
    """OpenAI-protocol endpoint (/v1/completions + /v1/chat/completions +
    /v1/models) over the background-serving LLM — the TPU build's
    standard-protocol serving surface (vs the reference's Triton backend
    prototype)."""
    import threading
    import urllib.request

    from inference.entrypoint.openai_server import make_handler
    from http.server import ThreadingHTTPServer

    llm = LLM(model_dir, data_type="float32")
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    llm.start_server()
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(llm, "tiny-llama"))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models", timeout=30
        ) as r:
            models = json.loads(r.read())
        assert models["data"][0]["id"] == "tiny-llama"

        out = post("/v1/completions",
                   {"prompt": "hello world", "max_tokens": 8})
        assert out["object"] == "text_completion"
        assert isinstance(out["choices"][0]["text"], str)
        assert out["usage"]["completion_tokens"] == 8

        chat = post("/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4,
        })
        assert chat["object"] == "chat.completion"
        assert chat["choices"][0]["message"]["role"] == "assistant"
    finally:
        srv.shutdown()
        llm.stop_server()


def test_openai_streaming(model_dir):
    """SSE streaming over the background server: chunks arrive with text
    deltas, terminated by a stop chunk and [DONE]."""
    import threading
    import urllib.request

    from inference.entrypoint.openai_server import make_handler
    from http.server import ThreadingHTTPServer

    llm = LLM(model_dir, data_type="float32")
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    llm.start_server()
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(llm, "tiny-llama"))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "hello world", "max_tokens": 8,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            body = r.read().decode()
        events = [ln[6:] for ln in body.splitlines()
                  if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        text = "".join(c["choices"][0]["text"] for c in chunks)
        assert len(text) > 0
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    finally:
        srv.shutdown()
        llm.stop_server()


def test_openai_error_handling_and_stop(model_dir):
    """Protocol robustness (round-3 review): oversize prompts get a 400
    JSON error (not a dropped connection), token-id prompts work, and the
    `stop` parameter maps through the tokenizer."""
    import threading
    import urllib.error
    import urllib.request

    from inference.entrypoint.openai_server import make_handler
    from http.server import ThreadingHTTPServer

    llm = LLM(model_dir, data_type="float32")
    llm.compile(max_requests_per_batch=2, max_seq_length=64)
    llm.start_server()
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(llm, "tiny-llama"))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def post(obj, expect=200):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        # oversize prompt -> 400 with a JSON error body
        code, body = post({"prompt": "x " * 200, "max_tokens": 4})
        assert code == 400 and "error" in body

        # token-id-array prompt (OpenAI protocol) works
        code, body = post({"prompt": [3, 17, 9], "max_tokens": 4})
        assert code == 200
        assert body["usage"]["completion_tokens"] == 4

        # multi-token stop sequence -> loud 400, not silent ignore
        code, body = post({"prompt": "hi", "max_tokens": 4,
                           "stop": ["hello world"]})
        assert code == 400 and "stop sequence" in body["error"]["message"]
    finally:
        srv.shutdown()
        llm.stop_server()
