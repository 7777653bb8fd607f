"""70B-width slice benchmark: EXECUTED numbers at LLaMA-2-70B geometry.

BASELINE config #5 serves LLaMA-2-70B INT4 multi-node; one v5e cannot hold
80 layers, but a 4-layer slice at TRUE width (hidden 8192, FFN 28672,
GQA 64/8, INT4, 16 slots, S=2048) runs on the single chip and measures the
per-layer decode cost that the TP=8 fit/compile artifact
(tests/test_70b_multihost.py) and any pod-throughput projection assume —
the number VERDICT r4 #4 said had never been produced.

Emits llama70b_width_slice_* metrics (one JSON line each); invoked as a
bench.py phase.
"""

import gc
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _log(msg):
    print(f"[bench_70b {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def _emit(metric, value, unit, vs):
    print(json.dumps({
        "metric": metric, "value": value, "unit": unit, "vs_baseline": vs,
    }), flush=True)


def _init_quantized_streaming(spec, bits=4):
    """Materialize random 70B-width params LEAF BY LEAF, quantizing each
    matmul weight and freeing its bf16 source before the next — the whole
    bf16 tree (~8 GB at 4 layers of 70B width) plus quantize temporaries
    OOMs a 16 GB chip if built at once (measured r5)."""
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.quant.weight_only import quantize_params

    abstract = jax.eval_shape(
        lambda k: quantize_params(
            spec, params_lib.init_params(spec, k, jnp.bfloat16), bits),
        jax.random.PRNGKey(0),
    )
    key = jax.random.PRNGKey(0)

    def leaves(path, leaf):
        nonlocal key
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, leaf.shape, jnp.float32) * 0.02
        return jnp.asarray(x, leaf.dtype)

    # QuantizedArray nodes: build their bf16 source, quantize, free
    import jax.tree_util as jtu

    from flexflow_tpu.quant.weight_only import QuantizedArray, quantize

    def build(node):
        nonlocal key
        if isinstance(node, QuantizedArray):
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, node.shape, jnp.float32) * 0.02
            w = jnp.asarray(w, jnp.bfloat16)
            qa = quantize(w, bits=node.bits, group_size=node.group_size,
                          batch_dims=node.batch_dims,
                          contract_dims=node.contract_dims)
            jax.block_until_ready(qa.q)
            del w
            gc.collect()
            return qa
        return jtu.tree_map_with_path(leaves, node)

    out = {}
    for name, sub in abstract.items():
        if isinstance(sub, dict):
            out[name] = {k: build(v) for k, v in sub.items()}
        else:
            out[name] = build(sub)
    return out


def run_70b_slice(layers: int = 4, slots: int = 16, max_seq: int = 2048,
                  window: int = 512, spec_override=None):
    from flexflow_tpu import specs
    from flexflow_tpu.ops.sampling import SamplingConfig
    from flexflow_tpu.serving import InferenceEngine

    gc.disable()
    spec = spec_override or specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=32000, hidden_size=8192,
        num_layers=layers, num_heads=64, num_kv_heads=8, head_dim=128,
        intermediate_size=28672, max_position_embeddings=4096, norm_eps=1e-5,
    )
    layers = spec.num_layers
    _log(f"init {layers}-layer 70B-width params on device + INT4 quantize "
         f"(leaf-streamed)")
    params = _init_quantized_streaming(spec, bits=4)
    gc.collect()

    eng = InferenceEngine(spec, params, max_requests_per_batch=slots,
                          max_seq_len=max_seq)
    lens = np.full(slots, min(300, max_seq // 2), np.int32)
    toks = np.ones(slots, np.int32)
    scfg = SamplingConfig(temperature=np.zeros(slots, np.float32),
                          top_p=np.ones(slots, np.float32),
                          top_k=np.zeros(slots, np.int32))
    key = jax.random.PRNGKey(0)
    win = window if window < max_seq else None
    _log("warm decode programs")
    for n in (8, 24):
        eng.decode_horizon(lens, toks, key, scfg, n, window=win)
        eng.decode_horizon(lens, toks, key, scfg, n, window=win)

    def timed(n):
        best = float("inf")
        for _ in range(3):
            a = time.perf_counter()
            eng.decode_horizon(lens, toks, key, scfg, n, window=win)
            best = min(best, time.perf_counter() - a)
        return best

    t1, t2 = timed(8), timed(24)
    per_ms = (t2 - t1) / 16 * 1e3
    hh, kh, dh = spec.num_heads, spec.num_kv_heads, spec.head_dim
    d, f = spec.hidden_size, spec.intermediate_size
    layer_bytes = (d * (hh + 2 * kh) * dh + hh * dh * d + 3 * d * f) / 2
    head_bytes = spec.vocab_size * d / 2
    kv_bytes = slots * kh * dh * (window or max_seq) * 2 * 2
    floor_ms = (layers * (layer_bytes + kv_bytes) + head_bytes) / 819e9 * 1e3
    _emit("llama70b_width_slice_ms_per_step", round(per_ms, 3), "ms",
          round(floor_ms / per_ms, 3))
    _emit("llama70b_width_slice_ms_per_layer", round(per_ms / layers, 3),
          "ms", 1.0)
    _emit("llama70b_width_slice_tokens_per_sec",
          round(slots / per_ms * 1e3, 1), "tokens/s", 1.0)
    _emit("llama70b_width_slice_x_hbm_floor", round(per_ms / floor_ms, 3),
          "x", 1.0)
    gc.enable()
    return per_ms


if __name__ == "__main__":
    run_70b_slice()
