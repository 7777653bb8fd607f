"""Round-4 probe: does lax.scan layer slicing copy quantized weights?

Hypothesis for the 7.7x-off-floor decode step: scan xs-slicing of the
[L, ...] quantized carriers materializes a copy of every weight tile per
layer (XLA cannot fuse a dynamic-slice into a pallas_call operand), tripling
HBM weight traffic; the KV cache slice may pay the same.

Times three 32-layer matmul-only chains (no attention/norms) at the 7B
decode shape (b=8):
  scan     — current engine structure (scan over stacked [L] carriers)
  unrolled — python loop, static q[i] slices
  flat     — per-layer SEPARATE QuantizedArrays (no slicing at all)

    python -u benchmarks/probe_r4_scan.py --bits 4
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[scan +{time.time()-t0:7.1f}s] {msg}", flush=True)


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
    from flexflow_tpu.quant.weight_only import QuantizedArray

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    log(f"devices {jax.devices()}; build INT{args.bits} carriers")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    vq = fast_quantized_verifier(dspec, dparams, vspec, args.bits)
    layers = vq["layers"]
    names = ["wq", "wk", "wv", "wo", "wg", "wu", "wd"]
    qls = {n: layers[n] for n in names}
    x = jnp.asarray(np.random.RandomState(0).randn(8, 4096), jnp.bfloat16)

    def unit(qa, i=None):
        """Layer-i view of a stacked QuantizedArray (static index)."""
        if i is None:
            return qa
        return dataclasses.replace(
            qa,
            q=qa.q[i], scale=qa.scale[i],
            offset=None if qa.offset is None else qa.offset[i],
            shape=qa.shape[1:], batch_dims=0,
        )

    def body(h, sl):
        q = _linear(h, sl["wq"])
        k = _linear(h, sl["wk"])
        v = _linear(h, sl["wv"])
        a = _linear(q + k + v, sl["wo"])
        g = _linear(h, sl["wg"])
        u = _linear(h, sl["wu"])
        m = _linear(jax.nn.silu(g) * u, sl["wd"])
        return (h + a + m).astype(h.dtype)

    # --- scan (engine structure) ---
    @jax.jit
    def run_scan(x, qls):
        def sbody(h, sl):
            return body(h, sl), ()

        h, _ = jax.lax.scan(sbody, x, qls)
        return h

    # --- unrolled static slices ---
    @jax.jit
    def run_unrolled(x, qls):
        h = x
        for i in range(args.layers):
            h = body(h, {n: unit(qls[n], i) for n in names})
        return h

    # --- flat per-layer arrays (ground truth: zero slicing) ---
    flat = [
        {n: jax.device_put(unit(jax.tree.map(lambda a: a, qls[n]), i))
         for n in names}
        for i in range(args.layers)
    ]

    @jax.jit
    def run_flat(x, flat):
        h = x
        for sl in flat:
            h = body(h, sl)
        return h

    variants = [
        ("scan", lambda: run_scan(x, qls)),
        ("unrolled", lambda: run_unrolled(x, qls)),
        ("flat", lambda: run_flat(x, flat)),
    ]
    wbytes = sum(
        l.nbytes for n in names
        for l in jax.tree_util.tree_leaves(qls[n])
    )
    floor = wbytes / 819e9
    for name, fn in variants:
        log(f"compile {name}")
        jax.block_until_ready(fn())
        ts = []
        for _ in range(args.iters):
            a = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - a)
        t = min(ts)
        log(f"{name}: {t*1e3:.2f} ms ({wbytes/1e9:.2f} GB weights; "
            f"floor {floor*1e3:.2f} ms -> {t/floor:.2f}x)")


if __name__ == "__main__":
    main()
