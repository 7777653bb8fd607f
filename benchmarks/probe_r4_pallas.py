"""Round-4 probe #3: per-pallas-call overhead — buffer identity vs slicing.

tune_quant_kernel: 48 us/call (int4 [4096,11008], one closure-constant
carrier reused). Engine-style chains: ~230 us/call on [4096,4096] slices of
a stacked [32, ...] carrier. Cases here separate the variables, all 32
calls of the SAME [4096,4096]-class INT4 matmul, real dataflow dependency:

  closure  — one carrier, closed over (tune-style)
  arg-one  — one carrier, passed as jit arg; reused 32x
  arg-32   — 32 separate carriers passed as args (no slicing)
  scan-xs  — stacked [32,...] carrier as scan xs (engine-style)
  unroll   — stacked carrier, static q[i] slices in an unrolled loop
  slice-only — scan over the stacked carrier, body touches 1 element/leaf

    python -u benchmarks/probe_r4_pallas.py
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
    print(f"[p3 +{time.time()-t0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--layers", type=int, default=32)
    args = ap.parse_args()
    n = args.layers

    from flexflow_tpu.ops.pallas.quant_matmul import quant_matmul
    from flexflow_tpu.quant import weight_only

    rng = np.random.RandomState(0)
    d = f = 4096
    log(f"devices {jax.devices()}; quantize [{d},{f}] x{n}")
    w = jnp.asarray(rng.randn(n, d, f) * 0.02, jnp.float32)
    qa_stack = weight_only.quantize(w, bits=4, batch_dims=1)
    qa_one = weight_only.quantize(w[0], bits=4)
    x = jnp.asarray(rng.randn(8, d), jnp.bfloat16)

    def unit(i):
        return dataclasses.replace(
            qa_stack,
            q=qa_stack.q[i], scale=qa_stack.scale[i],
            offset=qa_stack.offset[i],
            shape=qa_stack.shape[1:], batch_dims=0,
        )

    qa32 = [jax.tree.map(jax.device_put, unit(i)) for i in range(n)]
    per_bytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(qa_one))
    floor = per_bytes / 819e9

    def timeit(name, fn):
        jax.block_until_ready(fn())
        ts = []
        for _ in range(args.iters):
            a = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - a)
        t = min(ts) / n
        log(f"{name}: {t*1e6:.1f} us/call (floor {floor*1e6:.1f} us -> "
            f"{t/floor:.2f}x)")

    @jax.jit
    def closure(x):
        def body(h, _):
            out = quant_matmul(h, qa_one)
            return (h + out * 1e-6).astype(h.dtype), ()

        h, _ = jax.lax.scan(body, x, None, length=n)
        return h

    @jax.jit
    def arg_one(x, qa):
        def body(h, _):
            out = quant_matmul(h, qa)
            return (h + out * 1e-6).astype(h.dtype), ()

        h, _ = jax.lax.scan(body, x, None, length=n)
        return h

    @jax.jit
    def arg_32(x, qas):
        h = x
        for qa in qas:
            h = (h + quant_matmul(h, qa) * 1e-6).astype(h.dtype)
        return h

    @jax.jit
    def scan_xs(x, qa_stack):
        def body(h, sl):
            out = quant_matmul(h, sl)
            return (h + out * 1e-6).astype(h.dtype), ()

        h, _ = jax.lax.scan(body, x, qa_stack)
        return h

    @jax.jit
    def unroll(x, qa_stack):
        h = x
        for i in range(n):
            sl = dataclasses.replace(
                qa_stack, q=qa_stack.q[i], scale=qa_stack.scale[i],
                offset=qa_stack.offset[i], shape=qa_stack.shape[1:],
                batch_dims=0)
            h = (h + quant_matmul(h, sl) * 1e-6).astype(h.dtype)
        return h

    @jax.jit
    def slice_only(x, qa_stack):
        def body(h, sl):
            probe = (sl.q[0, 0].astype(jnp.float32) * sl.scale[0, 0]
                     + sl.offset[0, 0])
            return (h + probe * 1e-9).astype(h.dtype), ()

        h, _ = jax.lax.scan(body, x, qa_stack)
        return h

    # scan-slice of stacked carrier, sliced unit fed to pallas in the body
    stack_for_scan = qa_stack  # pytree with [n, ...] leaves

    log("compile closure")
    timeit("closure", lambda: closure(x))
    log("compile arg-one")
    timeit("arg-one", lambda: arg_one(x, qa_one))
    log("compile arg-32")
    timeit("arg-32", lambda: arg_32(x, qa32))
    log("compile scan-xs")
    timeit("scan-xs", lambda: scan_xs(x, stack_for_scan))
    log("compile unroll")
    timeit("unroll", lambda: unroll(x, stack_for_scan))
    log("compile slice-only")
    timeit("slice-only", lambda: slice_only(x, stack_for_scan))


if __name__ == "__main__":
    main()
