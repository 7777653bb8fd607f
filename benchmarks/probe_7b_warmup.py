"""Bisect the 7B quantized warm-up hang (ROADMAP #1 / VERDICT r2 #2).

Round 2 observed: the 7B INT8 engine's first compile/execution through the
remote-compile tunnel ran >40 min twice and wedged the shared service.
Suspects: (a) the Pallas quant_matmul at 7B shapes inside the decode scan,
(b) the XLA dequant fallback for wd [32, 11008, 4096] inside the scan,
(c) the horizon-scan program size itself.

This script isolates each stage with its own wall-clock print (run the
whole thing under `timeout` so nothing can wedge the service):

    timeout 1800 python benchmarks/probe_7b_warmup.py --stage matmuls
    timeout 1800 python benchmarks/probe_7b_warmup.py --stage layer
    timeout 2400 python benchmarks/probe_7b_warmup.py --stage engine
    FF_PALLAS_QUANT_MATMUL=0 timeout 2400 python ... --stage engine

Each stage prints a [probe] line BEFORE dispatch so the last line in the
log identifies the hang site.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import sys
import time

import numpy as np

t_start = time.time()


def log(msg):
    print(f"[probe +{time.time()-t_start:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def stage_matmuls(bits):
    """Each 7B quantized projection shape standalone (outside any scan)."""
    import jax
    import jax.numpy as jnp

    from flexflow_tpu.models.decoder import _linear
    from flexflow_tpu.quant.weight_only import quantize

    d, f, v_, hd, heads = 4096, 11008, 32000, 128, 32
    shapes = {
        "wq/wk/wv [D, H*Dh]": (d, heads * hd),
        "wo [H*Dh, D]": (heads * hd, d),
        "wg/wu [D, F]": (d, f),
        "wd [F, D]": (f, d),
        "lm_head [D, V]": (d, v_),
    }
    rng = np.random.RandomState(0)
    for name, (din, dout) in shapes.items():
        log(f"quantize {name} int{bits}")
        w = jnp.asarray(rng.randn(din, dout) * 0.02, jnp.float32)
        qa = quantize(w, bits)
        x = jnp.asarray(rng.randn(8, din), jnp.bfloat16)
        log(f"dispatch quantized linear {name} (compile)")
        fn = jax.jit(lambda xx, q=qa: _linear(xx, q))
        out = fn(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(x)
        jax.block_until_ready(out)
        log(f"OK {name}: {(time.perf_counter()-t0)/10*1e6:.1f} us/call")


def stage_layer(bits):
    """One full 7B transformer layer inside a lax.scan (the decode shape)."""
    import jax
    import jax.numpy as jnp

    from flexflow_tpu.models import decoder
    from flexflow_tpu.serving.engine import InferenceEngine  # noqa: F401
    from benchmarks.spec_pair import fast_quantized_verifier
    import bench_spec

    log("build 2-layer 7B-geometry quantized params")
    import dataclasses
    vspec = dataclasses.replace(bench_spec.VERIFIER_7B, num_layers=2)
    dspec = dataclasses.replace(bench_spec.DRAFT_7B, num_layers=2)
    from flexflow_tpu.models import params as params_lib
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    vq = fast_quantized_verifier(dspec, dparams, vspec, bits)
    log("params on device; build cache")
    cache = decoder.init_kv_cache(vspec, 8, 512, jnp.bfloat16)
    lens = jnp.full((8,), 16, jnp.int32)
    toks = jnp.ones((8, 1), jnp.int32)

    log("dispatch forward_cached (decode T=1, 2 layers; compile)")
    logits, cache = jax.jit(
        lambda p, t, c, l: decoder.forward_cached(vspec, p, t, c, l)
    )(vq, toks, cache, lens)
    jax.block_until_ready(logits)
    log("OK 2-layer decode step")


def stage_engine(bits, horizon):
    """The real engine build + prefill + decode horizon, step by step."""
    import jax
    import jax.numpy as jnp

    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.ops.sampling import SamplingConfig
    from flexflow_tpu.serving.engine import InferenceEngine
    from benchmarks.spec_pair import fast_quantized_verifier
    import bench_spec

    log("draft init")
    dparams = params_lib.init_params(
        bench_spec.DRAFT_7B, jax.random.PRNGKey(0), jnp.bfloat16)
    log(f"fast INT{bits} verifier build (32 layers)")
    vq = fast_quantized_verifier(
        bench_spec.DRAFT_7B, dparams, bench_spec.VERIFIER_7B, bits)
    log("engine build (cache alloc)")
    eng = InferenceEngine(
        bench_spec.VERIFIER_7B, vq, max_requests_per_batch=8,
        max_seq_len=512)
    key = jax.random.PRNGKey(0)
    scfg = SamplingConfig.greedy(8)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 32000, size=24).tolist() for _ in range(8)]
    log("prefill admission batch (compile; first big program)")
    toks = eng.prefill_batch_to_slots_async(prompts, list(range(8)), key, scfg)
    toks = eng.fetch(toks)
    log(f"OK prefill: first tokens {list(toks)[:4]}...")
    lens = np.full((8,), 24, np.int32)
    log("single decode step (compile)")
    t1 = eng.decode(lens, np.asarray(toks, np.int32), key, scfg)
    log("OK decode step")
    log(f"decode_horizon n={horizon} (compile; the round-2 hang suspect)")
    out = eng.decode_horizon(lens + 1, np.asarray(t1, np.int32), key, scfg,
                             horizon)
    log(f"OK horizon: {out.shape}")
    t0 = time.perf_counter()
    out = eng.decode_horizon(lens + 1, np.asarray(t1, np.int32), key, scfg,
                             horizon)
    dt = time.perf_counter() - t0
    log(f"horizon steady-state: {dt/horizon*1e3:.2f} ms/token-step "
        f"-> {8*horizon/dt:.0f} tok/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["matmuls", "layer", "engine"],
                   required=True)
    p.add_argument("--bits", type=int, default=8)
    p.add_argument("--horizon", type=int, default=8)
    args = p.parse_args()
    import jax
    log(f"devices: {jax.devices()}")
    if args.stage == "matmuls":
        stage_matmuls(args.bits)
    elif args.stage == "layer":
        stage_layer(args.bits)
    else:
        stage_engine(args.bits, args.horizon)
    log("stage complete")


if __name__ == "__main__":
    main()
