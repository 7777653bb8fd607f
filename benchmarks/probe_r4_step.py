"""Round-4 probe: 7B engine decode per-step time, INT4 vs INT8, on-chip.

Dispatch overhead through the axon tunnel is ~3 ms/call, so naive per-call
timing lies (stage_matmuls showed 2.7-3.8 ms/call for kernels tuned at
35-57 us). This probe times the REAL engine horizon program at two horizon
lengths and reports (t_n2 - t_n1) / (n2 - n1): pure per-step device time,
tunnel cost cancelled.

    python -u benchmarks/probe_r4_step.py --bits 4 8 [--seq 512] [--batch 8]

Optionally ``--seq 256 512`` at one bits level separates the attention
cache-read share (the jnp decode attention streams the whole allocated
[S] window regardless of cache_lens).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import gc
import time

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[step +{time.time()-t0:7.1f}s] {msg}", flush=True)


def measure(vspec, vq, batch, seq, n1, n2, iters=4):
    from flexflow_tpu.serving import InferenceEngine
    from flexflow_tpu.ops.sampling import SamplingConfig

    eng = InferenceEngine(vspec, vq, max_requests_per_batch=batch,
                          max_seq_len=seq)
    lens = np.full((batch,), 32, np.int32)
    toks = np.arange(1, batch + 1, dtype=np.int32)
    scfg = SamplingConfig.greedy(batch)
    key = jax.random.PRNGKey(0)

    def run(n):
        out, eng.cache = eng._decode_n(
            eng.params, eng.cache, jnp.asarray(lens), jnp.asarray(toks),
            key, jax.tree.map(jnp.asarray, scfg), n, greedy_only=True)
        return out

    times = {}
    for n in (n1, n2):
        log(f"compile horizon n={n}")
        jax.block_until_ready(run(n))  # compile
        t = []
        for _ in range(iters):
            a = time.perf_counter()
            jax.block_until_ready(run(n))
            t.append(time.perf_counter() - a)
        times[n] = min(t)
        log(f"n={n}: {times[n]*1e3:.1f} ms total ({times[n]/n*1e3:.2f} ms/step naive)")
    per_step = (times[n2] - times[n1]) / (n2 - n1)
    del eng
    gc.collect()
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, nargs="*", default=[512])
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=32)
    args = ap.parse_args()

    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier
    from flexflow_tpu.models import params as params_lib

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    log(f"devices {jax.devices()}")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)

    # rooflines (819 GB/s v5e)
    wbytes = {4: 3.3e9, 8: 6.6e9}
    for bits in args.bits:
        log(f"build INT{bits} verifier")
        vq = fast_quantized_verifier(dspec, dparams, vspec, bits)
        for seq in args.seq:
            cache_gb = (vspec.num_layers * args.batch * vspec.num_kv_heads
                        * vspec.head_dim * seq * 2 * 2) / 1e9
            per = measure(vspec, vq, args.batch, seq, args.n1, args.n2)
            floor = (wbytes[bits] + cache_gb * 1e9) / 819e9
            log(f"INT{bits} seq={seq}: {per*1e3:.2f} ms/step "
                f"({args.batch/per:.0f} tok/s) | HBM floor "
                f"{floor*1e3:.2f} ms (weights {wbytes[bits]/1e9:.1f} GB + "
                f"cache {cache_gb:.1f} GB) -> {per/floor:.2f}x floor")
        del vq
        gc.collect()


if __name__ == "__main__":
    main()
