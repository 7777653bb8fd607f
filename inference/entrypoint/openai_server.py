#!/usr/bin/env python
"""OpenAI-compatible serving endpoint (stdlib-only).

The reference ships a Triton Inference Server backend prototype as its
standard-protocol serving surface; the TPU build's analog is the de-facto
standard LLM serving protocol instead: ``POST /v1/completions`` and
``POST /v1/chat/completions`` (including ``stream=true`` SSE) over the same
background-serving LLM the other entrypoints use. Zero extra dependencies
(http.server), so it runs in hermetic environments; any OpenAI client
pointed at the base URL works.

    FF_MODEL_DIR=/path/to/model python -m inference.entrypoint.openai_server
"""

from __future__ import annotations

import json
import os
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _chat_to_prompt(messages):
    """Minimal chat templating (the reference's chat.py style)."""
    parts = []
    for m in messages:
        parts.append(f"{m.get('role', 'user')}: {m.get('content', '')}")
    parts.append("assistant:")
    return "\n".join(parts)


def _stop_token_ids(llm, req):
    """Map the OpenAI ``stop`` parameter to token ids.

    Single-token stop strings map through the tokenizer; multi-token stop
    sequences are rejected loudly (a 400) rather than silently ignored.
    ``stop_token_ids`` passes through directly."""
    ids = list(req.get("stop_token_ids", []))
    stop = req.get("stop")
    if stop is None:
        return ids
    if isinstance(stop, str):
        stop = [stop]
    for s in stop:
        toks = llm.tokenizer(s, return_tensors=None)["input_ids"]
        if len(toks) != 1:
            raise ValueError(
                f"stop sequence {s!r} tokenizes to {len(toks)} tokens; "
                "only single-token stop strings are supported"
            )
        ids.append(int(toks[0]))
    return ids


def make_handler(llm, model_name: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/models":
                self._json(200, {"object": "list", "data": [
                    {"id": model_name, "object": "model"}]})
            elif self.path in ("/health", "/healthz"):
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": {"message": "not found"}})

        def _stream(self, req, prompt, chat):
            """SSE streaming via LLM.generate_stream (EXCEEDS the
            reference, which has no streaming surface)."""
            gen = llm.generate_stream(
                prompt,
                max_new_tokens=int(req.get("max_tokens", 128)),
                temperature=float(req.get("temperature", 0.0)),
                top_p=float(req.get("top_p", 1.0)),
                top_k=int(req.get("top_k", 0)),
                stop_token_ids=_stop_token_ids(llm, req),
            )
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            rid = f"cmpl-{uuid.uuid4().hex[:24]}"
            created = int(time.time())
            obj = "chat.completion.chunk" if chat else "text_completion"

            def emit(delta, finish=None):
                choice = (
                    {"index": 0, "delta": (
                        {"role": "assistant", "content": delta}
                        if delta else {}),
                     "finish_reason": finish}
                    if chat else
                    {"index": 0, "text": delta, "finish_reason": finish,
                     "logprobs": None}
                )
                chunk = {"id": rid, "object": obj, "created": created,
                         "model": model_name, "choices": [choice]}
                self.wfile.write(
                    b"data: " + json.dumps(chunk).encode() + b"\n\n")
                self.wfile.flush()

            try:
                for delta in gen:
                    emit(delta)
            except RuntimeError:  # serving loop died mid-stream
                emit("", finish="error")
            else:
                emit("", finish="stop")
            self.wfile.write(b"data: [DONE]\n\n")
            self.wfile.flush()

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._json(400, {"error": {"message": "bad json"}})

            chat = self.path == "/v1/chat/completions"
            if self.path not in ("/v1/completions", "/v1/chat/completions"):
                return self._json(404, {"error": {"message": "not found"}})

            try:
                if chat:
                    prompt = _chat_to_prompt(req.get("messages", []))
                else:
                    prompt = req.get("prompt", "")
                    if isinstance(prompt, list):
                        if prompt and isinstance(prompt[0], int):
                            # OpenAI allows token-id-array prompts
                            prompt = llm.tokenizer.decode(prompt)
                        else:
                            prompt = prompt[0] if prompt else ""

                if req.get("stream"):
                    return self._stream(req, prompt, chat)

                # the background serving loop batches registrations
                # continuously; generate() only registers + waits, so
                # concurrent requests co-occupy batch slots (no lock)
                n_choices = max(1, int(req.get("n", 1)))
                results = llm.generate(
                    [prompt] * n_choices,
                    max_new_tokens=int(req.get("max_tokens", 128)),
                    temperature=float(req.get("temperature", 0.0)),
                    top_p=float(req.get("top_p", 1.0)),
                    top_k=int(req.get("top_k", 0)),
                    stop_token_ids=_stop_token_ids(llm, req),
                )
            except ValueError as e:  # oversize prompt, bad stop, ...
                return self._json(400, {"error": {"message": str(e)}})
            except RuntimeError as e:  # serving loop died
                return self._json(503, {"error": {"message": str(e)}})
            except Exception as e:  # anything else: a JSON 500, not a
                return self._json(500, {"error": {  # dropped connection
                    "message": f"{type(e).__name__}: {e}"}})

            created = int(time.time())
            rid = f"cmpl-{uuid.uuid4().hex[:24]}"
            try:
                n_prompt = len(
                    llm.tokenizer(prompt, return_tensors=None)["input_ids"])
            except Exception:
                n_prompt = 0
            n_out = sum(len(r.output_tokens) for r in results)
            usage = {
                "prompt_tokens": n_prompt,
                "completion_tokens": n_out,
                "total_tokens": n_prompt + n_out,
            }
            if chat:
                self._json(200, {
                    "id": rid, "object": "chat.completion",
                    "created": created, "model": model_name,
                    "choices": [{
                        "index": i,
                        "message": {"role": "assistant",
                                    "content": r.output_text},
                        "finish_reason": "stop",
                    } for i, r in enumerate(results)],
                    "usage": usage,
                })
            else:
                self._json(200, {
                    "id": rid, "object": "text_completion",
                    "created": created, "model": model_name,
                    "choices": [{
                        "index": i, "text": r.output_text,
                        "finish_reason": "stop", "logprobs": None,
                    } for i, r in enumerate(results)],
                    "usage": usage,
                })

    return Handler


def serve(llm=None, host: str = "0.0.0.0", port: int = 8000,
          model_name: str = "flexflow-tpu"):
    if llm is None:
        from flexflow_tpu.serve import LLM

        model_dir = os.environ["FF_MODEL_DIR"]
        model_name = os.path.basename(model_dir.rstrip("/")) or model_name
        llm = LLM(model_dir)
        llm.compile(
            max_requests_per_batch=int(os.environ.get("FF_MAX_BATCH", 8)),
            max_seq_length=int(os.environ.get("FF_MAX_SEQ", 256)),
        )
    llm.start_server()
    srv = ThreadingHTTPServer((host, port), make_handler(llm, model_name))
    print(f"OpenAI-compatible server on http://{host}:{port}/v1")
    try:
        srv.serve_forever()
    finally:
        llm.stop_server()


if __name__ == "__main__":
    serve(port=int(os.environ.get("FF_PORT", 8000)))
