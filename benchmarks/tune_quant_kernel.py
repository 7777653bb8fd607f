"""Tuning harness for the Pallas fused dequant matmul (ROADMAP #1).

Methodology (important on this axon-tunneled chip):
- dispatch overhead is large (~ms): time scans of N1 vs N2 chained ops inside
  one jit and use (t2-t1)/(N2-N1) — the fixed cost cancels.
- the chain dependency must consume the FULL output (jnp.sum), otherwise XLA
  slices the dot through the dependency and the op being timed vanishes.

    python -u -m benchmarks.tune_quant_kernel
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexflow_tpu.quant import weight_only
from flexflow_tpu.ops.pallas import quant_matmul as qmm

N1, N2 = 16, 128
PEAK = 819.0  # v5e HBM GB/s


def chained(make_op, x, chain):
    @jax.jit
    def run(x):
        def body(xc, _):
            out = make_op(xc)
            # full-output dependency: forces the whole op to execute
            xc = xc + (jnp.sum(out) * 1e-12).astype(xc.dtype)
            return xc, ()

        xc, _ = jax.lax.scan(body, x, None, length=chain)
        return xc

    return run


def diff_time(make_op, x, iters=9):
    f1 = chained(make_op, x, N1)
    f2 = chained(make_op, x, N2)
    jax.block_until_ready(f1(x))
    jax.block_until_ready(f2(x))
    # MIN envelope of each chain, then diff: the tunneled chip shows
    # seconds-scale contention spikes (medians can exceed HBM peak or go
    # negative); contention only ever ADDS time, so the minimum over many
    # alternating repeats approaches the uncontended runtime of each chain
    t1s, t2s = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f1(x))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f2(x))
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (N2 - N1)



def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    D, F, B, gs = 4096, 11008, 8, 128
    x = jnp.asarray(rng.randn(B, D), jnp.bfloat16)
    w = jnp.asarray(rng.randn(D, F) * 0.02, jnp.float32)
    wb = w.astype(jnp.bfloat16)
    qa8 = weight_only.quantize(w, bits=8, group_size=gs)
    qa4 = weight_only.quantize(w, bits=4, group_size=gs)

    cases = [
        ("bf16 GEMV (XLA)", lambda xc: jnp.dot(xc, wb), wb.size * 2),
        ("int8 pallas prod", lambda xc: qmm.quant_matmul(xc, qa8), qa8.q.size),
        ("int4 pallas prod", lambda xc: qmm.quant_matmul(xc, qa4), qa4.q.size),
        ("int8 XLA dequant",
         lambda xc: jnp.dot(xc, weight_only.dequantize(qa8)), qa8.q.size),
        ("int4 XLA dequant",
         lambda xc: jnp.dot(xc, weight_only.dequantize(qa4)), qa4.q.size),
    ]
    for name, op, nbytes in cases:
        t = diff_time(op, x)
        print(f"{name}: {t*1e6:.0f} us ({nbytes/t/1e9:.0f} GB/s packed, "
              f"SoL {nbytes/PEAK/1e3:.0f} us)", flush=True)


if __name__ == "__main__":
    main()
