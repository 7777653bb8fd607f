"""PEFT backward benchmark: LoRA finetuning step latency vs sequence length.

Mirror of the reference ``peft_bwd_benchmark.cc``
(/root/reference/inference/peft/peft_bwd_benchmark.cc): measures the
finetuning-side cost — one full co-scheduled optimizer step (forward with
adapter, backward restricted to LoRA params, SGD update as ONE jitted
program, the analog of the reference's fused ``peft_bwd`` + in-kernel
update) across sequence lengths.

    python -u -m benchmarks.peft_bwd_benchmark [--seqs 128,256,512]
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
from flexflow_tpu.peft.finetune import FinetuneSession
from flexflow_tpu.peft.lora import LoraConfig, init_lora_params
from flexflow_tpu.serving import InferenceEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="128,256,512")
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--layers", type=int, default=12)
    args = ap.parse_args()

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=32000, hidden_size=768,
        num_layers=args.layers, num_heads=12, num_kv_heads=12, head_dim=64,
        intermediate_size=3072, max_position_embeddings=2048, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
    cfg = LoraConfig(rank=args.rank, alpha=2.0 * args.rank,
                     target_modules=("wq", "wv"), learning_rate=1e-3)
    lora = init_lora_params(spec, cfg, 1, jax.random.PRNGKey(1), jnp.float32)
    engine = InferenceEngine(
        spec, params, max_requests_per_batch=2, max_seq_len=64,
        lora=lora, lora_config=cfg,
    )

    rng = np.random.RandomState(0)
    for seq in (int(s) for s in args.seqs.split(",")):
        ids = rng.randint(1, 32000, size=seq + 1)
        pairs = [(ids[None, :-1].astype(np.int32),
                  ids[None, 1:].astype(np.int32))] * (args.iters + 1)
        session = FinetuneSession(spec, cfg, 0, pairs, epochs=1)
        session.tick(engine)  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            session.tick(engine)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        tok_s = seq / (ms / 1e3)
        print(json.dumps({
            "metric": "peft_bwd_step_ms", "seq_len": seq,
            "value": round(ms, 3), "unit": "ms/step",
            "train_tokens_per_sec": round(tok_s, 1),
            "final_loss": round(session.losses[-1], 4),
        }))


if __name__ == "__main__":
    main()
