"""Benchmark driver: prints ONE JSON line with the headline serving metric.

Metric (BASELINE.json): output tokens/sec/chip, incremental decoding on a
LLaMA-160M-class model (config #1), bf16, continuous batch of 8 slots.
``vs_baseline`` becomes the speculative-decoding speedup ratio (gate >= 1.5x)
once the spec-infer path is the headline; for incremental decoding it reports
value relative to the round-1 incremental baseline recorded here.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.serving.engine import InferenceEngine
from flexflow_tpu.ops.sampling import SamplingConfig

# Round-1 reference point: first measured incremental-decoding throughput on
# this chip (updated as the engine improves; spec-decode compares against it).
ROUND1_INCR_TOKENS_PER_SEC = None  # None -> vs_baseline reported as 1.0


def main():
    spec = specs.ModelSpec(
        arch="LlamaForCausalLM",
        vocab_size=32000,
        hidden_size=768,
        num_layers=12,
        num_heads=12,
        num_kv_heads=12,
        head_dim=64,
        intermediate_size=3072,
        max_position_embeddings=2048,
        norm_eps=1e-6,
    )
    batch, max_seq = 8, 1024
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
    engine = InferenceEngine(
        spec,
        params,
        max_requests_per_batch=batch,
        max_seq_len=max_seq,
        cache_dtype=jnp.bfloat16,
    )

    rng = np.random.RandomState(0)
    scfg = SamplingConfig.greedy(batch)
    key = jax.random.PRNGKey(0)

    # fill slots with prompts of length 64 via prefill+insert
    scfg1 = SamplingConfig.greedy(1)
    cache_lens = np.zeros(batch, np.int32)
    tokens = np.zeros(batch, np.int32)
    for slot in range(batch):
        prompt = rng.randint(0, spec.vocab_size, size=64).astype(np.int32)
        tok, kv, _ = engine.prefill(prompt, key, scfg1)
        engine.insert(kv, slot)
        cache_lens[slot] = 64
        tokens[slot] = tok

    # warmup (compile)
    for _ in range(3):
        tokens = engine.decode(cache_lens, tokens, key, scfg)
        cache_lens += 1

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        tokens = engine.decode(cache_lens, tokens, key, scfg)
        cache_lens += 1
    dt = time.perf_counter() - t0

    tps = batch * n_steps / dt
    vs = tps / ROUND1_INCR_TOKENS_PER_SEC if ROUND1_INCR_TOKENS_PER_SEC else 1.0
    print(
        json.dumps(
            {
                "metric": "llama160m_incr_decode_output_tokens_per_sec_chip",
                "value": round(tps, 2),
                "unit": "tokens/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
