"""PEFT forward benchmark: adapter-routed decode latency vs base model.

Mirror of the reference ``peft_fwd_benchmark.cc``
(/root/reference/inference/peft/peft_fwd_benchmark.cc): measures the
inference-side cost of LoRA — decode-step latency with 0..N concurrent
adapters routed per request — on the real serving engine.

    python -u -m benchmarks.peft_fwd_benchmark [--batch 8] [--seq 256]
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.ops.sampling import SamplingConfig
from flexflow_tpu.peft.lora import LoraConfig, init_lora_params
from flexflow_tpu.serving import InferenceEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--adapters", type=int, default=4)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--layers", type=int, default=12)
    args = ap.parse_args()

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=32000, hidden_size=768,
        num_layers=args.layers, num_heads=12, num_kv_heads=12, head_dim=64,
        intermediate_size=3072, max_position_embeddings=2048, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
    cfg = LoraConfig(rank=args.rank, alpha=2.0 * args.rank,
                     target_modules=("wq", "wv"))
    lora = init_lora_params(spec, cfg, args.adapters, jax.random.PRNGKey(1),
                            jnp.bfloat16)
    b = args.batch
    lens = np.full((b,), args.seq // 2, np.int32)
    toks = np.ones((b,), np.int32)
    scfg = SamplingConfig.greedy(b)
    key = jax.random.PRNGKey(2)

    def run(engine, adapter_ids, label):
        engine.decode(lens, toks, key, scfg, adapter_ids=adapter_ids)  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            engine.decode(lens, toks, key, scfg, adapter_ids=adapter_ids)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({
            "metric": f"peft_fwd_decode_ms_{label}",
            "value": round(ms, 3), "unit": "ms/step", "batch": b,
        }))
        return ms

    base_engine = InferenceEngine(
        spec, params, max_requests_per_batch=b, max_seq_len=args.seq,
    )
    base = run(base_engine, None, "base")
    del base_engine

    peft_engine = InferenceEngine(
        spec, params, max_requests_per_batch=b, max_seq_len=args.seq,
        lora=lora, lora_config=cfg,
    )
    ids = [i % args.adapters for i in range(b)]
    with_lora = run(peft_engine, ids, f"{args.adapters}adapters")
    print(json.dumps({
        "metric": "peft_fwd_overhead",
        "value": round(with_lora / base, 3), "unit": "x",
    }))


if __name__ == "__main__":
    main()
