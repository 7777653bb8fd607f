"""Probe: per-op kernel time with dispatch overhead cancelled.

The axon tunnel adds a large fixed cost per host->device dispatch, so naive
timing lies. Strategy: time one jitted scan of N1 ops and one of N2 ops;
(t2 - t1) / (N2 - N1) cancels the fixed cost exactly. Compiles are slow
through the tunnel (~30-60s per scan) — keep the variant list short.

    python -u -m benchmarks.probe_overhead
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.quant import weight_only
from flexflow_tpu.ops.pallas import quant_matmul as qmm

N1, N2 = 16, 128


def chained(make_op, x, chain):
    @jax.jit
    def run(x):
        def body(xc, _):
            out = make_op(xc)
            xc = xc + (out[:1, :1] * 1e-6).astype(xc.dtype)
            return xc, ()

        xc, _ = jax.lax.scan(body, x, None, length=chain)
        return xc

    return run


def diff_time(name, make_op, x, iters=5):
    f1 = chained(make_op, x, N1)
    f2 = chained(make_op, x, N2)
    t0 = time.perf_counter()
    jax.block_until_ready(f1(x))
    jax.block_until_ready(f2(x))
    print(f"  [{name}: compiled in {time.perf_counter()-t0:.0f}s]", flush=True)
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f1(x))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f2(x))
        t2s.append(time.perf_counter() - t0)
    t1 = sorted(t1s)[len(t1s) // 2]
    t2 = sorted(t2s)[len(t2s) // 2]
    return (t2 - t1) / (N2 - N1)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    D, F, B, gs = 4096, 11008, 8, 128
    x = jnp.asarray(rng.randn(B, D), jnp.bfloat16)
    w = jnp.asarray(rng.randn(D, F) * 0.02, jnp.float32)
    wb = w.astype(jnp.bfloat16)
    qa8 = weight_only.quantize(w, bits=8, group_size=gs)
    qa4 = weight_only.quantize(w, bits=4, group_size=gs)
    PEAK = 819.0

    cases = [
        ("bf16 GEMV (XLA)", lambda xc: jnp.dot(xc, wb), wb.size * 2),
        ("int8 pallas (prod)", lambda xc: qmm.quant_matmul(xc, qa8), qa8.q.size),
        ("int4 pallas (prod)", lambda xc: qmm.quant_matmul(xc, qa4), qa4.q.size),
        ("int8 XLA dequant", lambda xc: jnp.dot(xc, weight_only.dequantize(qa8)),
         qa8.q.size),
    ]
    for name, op, nbytes in cases:
        t = diff_time(name, op, x)
        print(f"{name}: {t*1e6:.0f} us ({nbytes/t/1e9:.0f} GB/s packed, "
              f"SoL {nbytes/PEAK/1e3:.0f} us)", flush=True)


if __name__ == "__main__":
    main()
