"""MQA-geometry INT4 serving bench (BASELINE config #4: Falcon-7B class).

Measures incremental serving throughput of a Falcon-7B-GEOMETRY model
(hidden 4544, 71 query heads, MQA kv=1, parallel-attn, layernorm+bias,
GELU MLP) with INT4 weight-only quantization — the grouped-query serving
config the reference exercises at 4 GPUs (cpp_inference_tests.sh:12-100).
TP itself is exercised at virtual fidelity (tests/test_mesh_serving.py,
test_70b_multihost.py); this phase captures the single-chip MQA number.

Weights are random quantized carriers generated ON DEVICE (shape-only
eval_shape of the real quantize-on-load path, then materialized directly):
every packed byte streams through the fused dequant matmuls and the MQA
attention runs the real single-KV-head pattern — output VALUES are garbage
by construction, which a throughput metric never reads.

Prints one JSON metric line; run by bench.py as its own phase.
"""

import json
import sys
import time


def _log(msg):
    print(f"[bench_mqa {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


import numpy as np

import jax
import jax.numpy as jnp

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.quant.weight_only import quantize_params
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager

FALCON7B = specs.ModelSpec(
    arch="FalconForCausalLM", vocab_size=65024, hidden_size=4544,
    num_layers=32, num_heads=71, num_kv_heads=1, head_dim=64,
    intermediate_size=4 * 4544, max_position_embeddings=2048,
    norm="layernorm", norm_eps=1e-5, norm_bias=True, pos="rope",
    parallel_attn=True, act="gelu",
)


def random_quantized_params(spec, bits=4, seed=0):
    """Materialize random carriers with the EXACT pytree the real
    quantize-on-load path produces (shape-only trace, no 14 GB bf16
    intermediate)."""
    abstract = jax.eval_shape(
        lambda k: quantize_params(
            spec, params_lib.init_params(spec, k, jnp.bfloat16), bits),
        jax.random.PRNGKey(0),
    )
    key = [jax.random.PRNGKey(seed)]

    def nk():
        key[0], sub = jax.random.split(key[0])
        return sub

    def mat(s):
        if s.dtype in (jnp.int8, jnp.uint8):
            return jax.random.randint(nk(), s.shape, 0, 255, jnp.int32
                                      ).astype(s.dtype)
        if s.dtype == jnp.float32:  # scales / offsets
            return jnp.full(s.shape, 0.005, jnp.float32)
        return (jax.random.normal(nk(), s.shape, jnp.float32) * 0.02
                ).astype(s.dtype)

    return jax.tree.map(mat, abstract)


def run_mqa_benchmark(spec=None, *, batch=8, max_seq=512, max_new=128,
                      horizon=64, metric="falcon7b_mqa_int4_incr_tokens_per_sec_chip"):
    import gc
    gc.disable()
    spec = spec or FALCON7B
    _log("build random INT4 carriers on device")
    params = random_quantized_params(spec, 4)
    eng = InferenceEngine(spec, params, max_requests_per_batch=batch,
                          max_seq_len=max_seq)
    rm = RequestManager(eng, decode_horizon=horizon, pipelined=True)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, spec.vocab_size, size=24).tolist()
               for _ in range(batch)]
    warm = [rng.randint(1, spec.vocab_size, size=24).tolist()
            for _ in range(batch)]
    cfg = GenerationConfig(max_new_tokens=max_new)
    _log("warm (full workload, twice: later compiles reset earlier\n"
         "    programs' warm state and the rewarms stagger across reps)")
    rm.generate(warm, cfg)
    rm.generate(warm, cfg)
    tps = 0.0
    for _ in range(3):  # best-of-3 (terminal rewarm/contention; bench_spec)
        t0 = time.perf_counter()
        reqs = rm.generate(prompts, cfg)
        dt = time.perf_counter() - t0
        tps = max(tps, sum(len(r.output_tokens) for r in reqs) / dt)
    print(json.dumps({
        "metric": metric, "value": round(tps, 2), "unit": "tokens/s",
        "vs_baseline": 1.0,
    }), flush=True)
    gc.enable()
    return tps


if __name__ == "__main__":
    run_mqa_benchmark()
