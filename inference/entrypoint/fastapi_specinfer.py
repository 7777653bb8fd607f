#!/usr/bin/env python
"""FastAPI speculative-serving endpoint (mirror of reference
/root/reference/inference/python/entrypoint/fastapi_specinfer.py).

Serves an LLM with one or more SSM draft models through the background
SpecRequestManager (tree-speculative, lossless). Requires ``fastapi`` +
``uvicorn``.

Env: FF_MODEL_DIR (verifier), FF_SSM_DIRS (comma-separated draft dirs).
"""

from __future__ import annotations

import os


def create_app(llm=None):
    from fastapi import FastAPI
    from pydantic import BaseModel

    app = FastAPI(title="flexflow_tpu speculative serving")

    if llm is None:
        from flexflow_tpu.serve import LLM, SSM

        llm = LLM(os.environ["FF_MODEL_DIR"])
        ssms = [
            SSM(d)
            for d in os.environ["FF_SSM_DIRS"].split(",")
            if d.strip()
        ]
        llm.compile(
            max_requests_per_batch=int(os.environ.get("FF_MAX_BATCH", 8)),
            max_seq_length=int(os.environ.get("FF_MAX_SEQ", 256)),
            ssms=ssms,
        )
    llm.start_server()

    class PromptRequest(BaseModel):
        prompt: str
        max_new_tokens: int = 128
        temperature: float = 0.0
        top_p: float = 1.0
        top_k: int = 0

    @app.post("/generate")
    def generate(req: PromptRequest):
        [res] = llm.generate(
            req.prompt,
            max_new_tokens=req.max_new_tokens,
            temperature=req.temperature,
            top_p=req.top_p,
            top_k=req.top_k,
        )
        return {
            "prompt": res.prompt,
            "output": res.output_text,
            "output_tokens": res.output_tokens,
            "decoding_steps": res.decoding_steps,
            "ttft_ms": res.ttft_ms,
            "latency_ms": res.latency_ms,
        }

    @app.get("/health")
    def health():
        return {"status": "ok"}

    return app


if __name__ == "__main__":
    import uvicorn

    uvicorn.run(create_app(), host="0.0.0.0", port=int(os.environ.get("PORT", 8000)))
