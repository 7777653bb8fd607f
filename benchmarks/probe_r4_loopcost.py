"""Round-4 probe #4: axon execution cost structure for loops.

probe_r4_pallas measured ~850 us per scan iteration even for a TRIVIAL
body — incompatible with tune_quant_kernel's 48 us/call differential slope
unless executions carry a large fixed cost. This probe fits
t(n) = C + n * k for (a) a trivial scan body, (b) an int4 quant-matmul
body, and (c) a nested scan (outer n, inner 32 trivial), to separate
per-execution, per-iteration, and per-scan-ENTRY costs.

    python -u benchmarks/probe_r4_loopcost.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[p4 +{time.time()-t0:7.1f}s] {msg}", flush=True)


def timeit(fn, iters=7):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        a = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - a)
    return min(ts)


def main():
    from flexflow_tpu.ops.pallas.quant_matmul import quant_matmul
    from flexflow_tpu.quant import weight_only

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 4096), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4096, 4096) * 0.02, jnp.float32)
    qa = weight_only.quantize(w, bits=4)
    log(f"devices {jax.devices()}")

    @functools.partial(jax.jit, static_argnames=("n",))
    def trivial(x, n):
        def body(h, _):
            return (h * 1.0000001).astype(h.dtype), ()

        h, _ = jax.lax.scan(body, x, None, length=n)
        return h

    @functools.partial(jax.jit, static_argnames=("n",))
    def qmm_chain(x, qa, n):
        def body(h, _):
            return (h + quant_matmul(h, qa) * 1e-6).astype(h.dtype), ()

        h, _ = jax.lax.scan(body, x, None, length=n)
        return h

    @functools.partial(jax.jit, static_argnames=("n",))
    def nested(x, n):
        def inner_body(h, _):
            return (h * 1.0000001).astype(h.dtype), ()

        def outer(h, _):
            h, _ = jax.lax.scan(inner_body, h, None, length=32)
            return h, ()

        h, _ = jax.lax.scan(outer, x, None, length=n)
        return h

    for name, fn in [
        ("trivial", lambda n: trivial(x, n)),
        ("qmm", lambda n: qmm_chain(x, qa, n)),
        ("nested32", lambda n: nested(x, n)),
    ]:
        pts = []
        for n in (1, 8, 32, 128):
            t = timeit(lambda: fn(n))
            pts.append((n, t))
            log(f"{name} n={n}: {t*1e3:.3f} ms")
        ns = np.array([p[0] for p in pts], float)
        ts = np.array([p[1] for p in pts], float)
        k, c = np.polyfit(ns, ts, 1)
        log(f"{name}: fixed {c*1e3:.3f} ms + {k*1e6:.1f} us/iter")


if __name__ == "__main__":
    main()
