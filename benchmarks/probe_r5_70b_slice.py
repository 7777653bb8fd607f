"""Round-5 probe: EXECUTE 70B geometry on the real chip (VERDICT #4a).

tests/test_70b_multihost.py proves the full 80-layer TP=8 artifact lowers,
compiles and fits analytically — but nothing at 70B WIDTH had ever produced
a number. This probe runs a 4-layer slice at TRUE LLaMA-2-70B width
(hidden 8192, FFN 28672, GQA 64/8, INT4, S=2048, 16 slots) on the single
chip and measures the per-layer decode cost the fit/throughput estimates
assume:

- per-layer INT4 packed bytes: 428 MB -> HBM floor ~0.52 ms/layer;
- decode step (differential over horizon lengths) -> measured ms/layer;
- VMEM behavior of the 70B-width quant matmuls (28672-wide FFN) under the
  production kernel — the class of failure the analytic fit test cannot
  see (r4 hit two scoped-VMEM OOMs no model predicted).

    python -u benchmarks/probe_r5_70b_slice.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import gc
import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[70b +{time.time()-t0:7.1f}s] {msg}", flush=True)


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        a = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - a)
    return best


def main():
    from flexflow_tpu import specs
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.quant.weight_only import quantize_params
    from flexflow_tpu.serving import InferenceEngine
    from flexflow_tpu.ops.sampling import SamplingConfig

    gc.disable()
    L = 4
    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=32000, hidden_size=8192,
        num_layers=L, num_heads=64, num_kv_heads=8, head_dim=128,
        intermediate_size=28672, max_position_embeddings=4096, norm_eps=1e-5,
    )
    slots, max_seq, window = 16, 2048, 512

    log(f"init {L}-layer 70B-width params on device (bf16)")
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
    log("quantize INT4 on device")
    params = quantize_params(spec, params, bits=4)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    gc.collect()

    log("engine build (fused carriers)")
    eng = InferenceEngine(spec, params, max_requests_per_batch=slots,
                          max_seq_len=max_seq)
    lens = np.full(slots, 300, np.int32)
    toks = np.ones(slots, np.int32)
    scfg = SamplingConfig(temperature=np.zeros(slots, np.float32),
                          top_p=np.ones(slots, np.float32),
                          top_k=np.zeros(slots, np.int32))
    key = jax.random.PRNGKey(0)
    for n in (8, 24):
        eng.decode_horizon(lens, toks, key, scfg, n, window=window)
    t1 = timed(lambda: eng.decode_horizon(lens, toks, key, scfg, 8,
                                          window=window))
    t2 = timed(lambda: eng.decode_horizon(lens, toks, key, scfg, 24,
                                          window=window))
    per = (t2 - t1) / 16 * 1e3
    # per-layer attribution: subtract the lm_head + sampling tail by a
    # 2-layer slice comparison? Approximate: packed bytes per layer
    layer_bytes = (8192 * (64 + 16) * 128 + 64 * 128 * 8192
                   + 3 * 8192 * 28672) / 2
    head_bytes = 32000 * 8192 / 2
    floor_ms = (L * layer_bytes + head_bytes) / 819e9 * 1e3
    kv_ms = (L * slots * 8 * 128 * window * 2 * 2) / 819e9 * 1e3
    log(f"decode step ({L} layers, B={slots}, w{window}): {per:.2f} ms "
        f"-> {per/L:.3f} ms/layer-equivalent")
    log(f"analytic floor: weights {floor_ms:.2f} ms + kv {kv_ms:.2f} ms "
        f"-> {per/(floor_ms+kv_ms):.2f}x of floor")
    log(f"full-70B projection: 80 layers / TP=8 -> "
        f"{(per - floor_ms*0 ) * (80/L) / 8:.1f} ms/step/chip-slice at "
        f"perfect TP scaling (ICI costs excluded)")
    log(f"throughput at this slice: {slots/per*1e3:.0f} tok/s")


if __name__ == "__main__":
    main()
