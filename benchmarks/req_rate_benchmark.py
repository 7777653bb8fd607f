
#!/usr/bin/env python
"""Request-rate benchmark: replay a Poisson trace against the serving engine.

Mirror of the reference's PEFT/req-rate benchmark drivers
(/root/reference/inference/peft/req_rate_benchmark.cc — latency under Poisson
arrivals). Replays a trace (see generate_trace.py) through the background
server, reporting tokens/s, mean/p50/p99 latency and TTFT.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import json
import time

import numpy as np


def run_trace(rm, trace, vocab_size: int, seed: int = 0, time_scale: float = 1.0):
    """Replays requests with their arrival offsets; returns finished Requests."""
    from flexflow_tpu.serving.request_manager import GenerationConfig

    rng = np.random.RandomState(seed)
    rm.start_background_server()
    guids = []
    t0 = time.monotonic()
    try:
        for entry in trace:
            target = entry["arrival_s"] * time_scale
            now = time.monotonic() - t0
            if target > now:
                time.sleep(target - now)
            prompt = rng.randint(1, vocab_size, size=entry["prompt_len"]).tolist()
            guids.append(rm.register_request(
                prompt,
                GenerationConfig(max_new_tokens=entry["output_len"]),
            ))
        for g in guids:
            rm.get_request(g).done.wait()
    finally:
        rm.stop_server()
    return [rm.get_request(g) for g in guids]


def summarize(reqs, wall_s: float) -> dict:
    lat = np.array([r.profile.latency for r in reqs]) * 1e3
    ttft = np.array([r.profile.ttft for r in reqs]) * 1e3
    toks = sum(len(r.output_tokens) for r in reqs)
    return {
        "requests": len(reqs),
        "output_tokens": toks,
        "tokens_per_s": round(toks / wall_s, 2),
        "latency_ms_mean": round(float(lat.mean()), 1),
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 1),
        "latency_ms_p99": round(float(np.percentile(lat, 99)), 1),
        "ttft_ms_mean": round(float(ttft.mean()), 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", required=True)
    p.add_argument("--time-scale", type=float, default=1.0)
    p.add_argument("--max-requests-per-batch", type=int, default=8)
    p.add_argument("--max-sequence-length", type=int, default=1024)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from flexflow_tpu import specs
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import InferenceEngine, RequestManager

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=32000, hidden_size=768,
        num_layers=12, num_heads=12, num_kv_heads=12, head_dim=64,
        intermediate_size=3072, max_position_embeddings=2048, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
    engine = InferenceEngine(
        spec, params, max_requests_per_batch=args.max_requests_per_batch,
        max_seq_len=args.max_sequence_length,
    )
    rm = RequestManager(engine, decode_horizon=16)

    with open(args.trace) as f:
        trace = json.load(f)
    t0 = time.monotonic()
    reqs = run_trace(rm, trace, spec.vocab_size, time_scale=args.time_scale)
    print(json.dumps(summarize(reqs, time.monotonic() - t0)))


if __name__ == "__main__":
    main()
