"""Round-4 probe #2: localize the 4.5x chain-vs-isolated quant matmul gap.

tune_quant_kernel measures the prod INT4 kernel at 48 us isolated-in-chain
([4096,11008], b=8) but a realistic 7-matmul 32-layer chain runs ~1.16
ms/layer (probe_r4_scan). This probe times subset chains to find where the
time goes.

    python -u benchmarks/probe_r4_scan2.py --bits 4
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[scan2 +{time.time()-t0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.models.decoder import _linear

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    log(f"devices {jax.devices()}; build INT{args.bits} carriers")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    vq = fast_quantized_verifier(dspec, dparams, vspec, args.bits)
    layers = vq["layers"]
    x = jnp.asarray(np.random.RandomState(0).randn(8, 4096), jnp.bfloat16)

    def timeit(name, fn, nbytes):
        jax.block_until_ready(fn())
        ts = []
        for _ in range(args.iters):
            a = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - a)
        t = min(ts)
        fl = nbytes / 819e9
        log(f"{name}: {t*1e3:.2f} ms (floor {fl*1e3:.2f} ms -> "
            f"{t/max(fl,1e-9):.2f}x)")
        return t

    def bytes_of(names):
        return sum(l.nbytes for n in names
                   for l in jax.tree_util.tree_leaves(layers[n]))

    def mk_chain(names, glue=True):
        qls = {n: layers[n] for n in names}

        @jax.jit
        def run(x, qls):
            def sbody(h, sl):
                acc = h
                if "wq" in sl:
                    q = _linear(h, sl["wq"])
                    k = _linear(h, sl["wk"])
                    v = _linear(h, sl["wv"])
                    acc = acc + _linear(q + k + v, sl["wo"])
                if "wg" in sl:
                    g = _linear(h, sl["wg"])
                    u = _linear(h, sl["wu"])
                    inner = jax.nn.silu(g) * u if glue else g + u
                    acc = acc + _linear(inner, sl["wd"])
                return acc.astype(h.dtype), ()

            h, _ = jax.lax.scan(sbody, x, qls)
            return h

        return lambda: run(x, qls)

    log("compile: big 3 (wg/wu/wd)")
    timeit("big3", mk_chain(["wg", "wu", "wd"]), bytes_of(["wg", "wu", "wd"]))
    log("compile: small 4 (wq/wk/wv/wo)")
    timeit("small4", mk_chain(["wq", "wk", "wv", "wo"]),
           bytes_of(["wq", "wk", "wv", "wo"]))
    log("compile: big3 no-glue")
    timeit("big3-noglue", mk_chain(["wg", "wu", "wd"], glue=False),
           bytes_of(["wg", "wu", "wd"]))
    log("compile: full 7")
    timeit("full7", mk_chain(["wq", "wk", "wv", "wo", "wg", "wu", "wd"]),
           bytes_of(["wq", "wk", "wv", "wo", "wg", "wu", "wd"]))

    # single hot op repeated: wg only, tune-style (validates the carrier)
    @jax.jit
    def run_wg(x):
        def sbody(h, sl):
            out = _linear(h, sl)
            return h + (jnp.sum(out) * 1e-12).astype(h.dtype), ()

        h, _ = jax.lax.scan(sbody, x, layers["wg"])
        return h

    log("compile: wg-only (tune-style dep)")
    timeit("wg-only", lambda: run_wg(x), bytes_of(["wg"]))


if __name__ == "__main__":
    main()
