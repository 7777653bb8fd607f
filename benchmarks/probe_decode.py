"""Probe: decode-step timing breakdown at configurable batch on real TPU.

Measures compile time and steady-state step time for single-step decode and
horizon decode at the bench model config, to attribute the gap between the
measured step time and the HBM roofline (weights + KV bytes / 819 GB/s).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.serving import InferenceEngine
from flexflow_tpu.ops.sampling import SamplingConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=16)
    ap.add_argument("--fill", type=int, default=384)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=32000, hidden_size=768,
        num_layers=12, num_heads=12, num_kv_heads=12, head_dim=64,
        intermediate_size=3072, max_position_embeddings=2048, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
    engine = InferenceEngine(
        spec, params, max_requests_per_batch=args.batch,
        max_seq_len=args.seq, cache_dtype=jnp.bfloat16,
    )
    B = args.batch
    lens = np.full((B,), args.fill, np.int32)
    toks = np.random.RandomState(0).randint(1, 32000, size=(B,)).astype(np.int32)
    scfg = SamplingConfig.greedy(B)
    key = jax.random.PRNGKey(1)

    # roofline: weights + KV-read bytes per step
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(params))
    wbytes = nparams * 2
    kvbytes = 2 * spec.num_layers * B * spec.num_kv_heads * spec.head_dim * args.seq * 2
    print(f"weights {wbytes/1e9:.3f} GB  kv(full-read) {kvbytes/1e9:.3f} GB "
          f"-> floor {(wbytes+kvbytes)/819e9*1e3:.2f} ms/step "
          f"({B/((wbytes+kvbytes)/819e9):.0f} tok/s)")

    # single-step decode
    t0 = time.perf_counter()
    out = engine.decode(lens, toks, key, scfg)
    t1 = time.perf_counter()
    print(f"decode compile+first: {t1-t0:.1f} s")
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = engine.decode(lens, toks, key, scfg)
    t1 = time.perf_counter()
    step_ms = (t1 - t0) / args.iters * 1e3
    print(f"decode steady: {step_ms:.2f} ms/step  ({B/step_ms*1e3:.0f} tok/s)")

    # horizon decode
    n = args.horizon
    t0 = time.perf_counter()
    out = engine.decode_horizon(lens, toks, key, scfg, n)
    t1 = time.perf_counter()
    print(f"decode_horizon(n={n}) compile+first: {t1-t0:.1f} s")
    t0 = time.perf_counter()
    for i in range(max(2, args.iters // n)):
        out = engine.decode_horizon(lens, toks, key, scfg, n)
    t1 = time.perf_counter()
    it = max(2, args.iters // n)
    step_ms = (t1 - t0) / it / n * 1e3
    print(f"decode_horizon steady: {step_ms:.2f} ms/step  ({B/step_ms*1e3:.0f} tok/s)")


if __name__ == "__main__":
    main()
