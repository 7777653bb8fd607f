"""Round-5 probe: ship or kill the INT4 group-dot kernel (VERDICT #2b).

r4 left _int4_groupdot_kernel default-OFF: scoped-VMEM OOM at d=11008
verify shapes (Mosaic allocates ~2x the analytic estimate) and no on-chip
e2e number. This probe:

1. compiles the kernel at EVERY 7B serving unit x token-by-token row count
   (decode 8 / draft 16 / verify 104), binary-searching the largest block_f
   that compiles — the real VMEM accounting the estimator needs;
2. checks row-determinism ON CHIP: rows 0..7 of a [104, d] call must be
   bitwise-identical to the [8, d] call (the spec-lossless invariant);
3. times groupdot vs the prod dequant-tile kernel per unit (differential
   chained scans);
4. end-to-end: InferenceEngine decode ms/step with FF_INT4_GROUPDOT off/on.

    python -u benchmarks/probe_r5_groupdot.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import gc
import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[groupdot +{time.time()-t0:7.1f}s] {msg}", flush=True)


def timed(fn, *args, reps=3):
    best = float("inf")
    for _ in range(reps):
        a = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - a)
    return best


# 7B serving units AFTER carrier fusion (decoder.fuse_qkv_params)
UNITS = {
    "wqkv": (4096, 12288),
    "wo": (4096, 4096),
    "wgu": (4096, 22016),
    "wd": (11008, 4096),
    "lm_head": (4096, 32256),
}
ROWS = (8, 16, 104)


def main():
    from flexflow_tpu.quant.weight_only import quantize, dequantize
    from flexflow_tpu.ops.pallas.quant_matmul import _qmm_2d

    gc.disable()
    key = jax.random.PRNGKey(0)

    qas = {}
    for name, (d, f) in UNITS.items():
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (d, f), jnp.bfloat16) * 0.02
        qas[name] = quantize(w, bits=4, group_size=128)
        del w
    gc.collect()
    log("units quantized on device")

    # ---- 1. compile matrix: largest block_f that compiles per (unit, rows)
    results = {}
    for name, (d, f) in UNITS.items():
        qa = qas[name]
        for rows in ROWS:
            x = jnp.ones((rows, d), jnp.bfloat16)
            ok_bf = None
            for bf in (512, 256, 128):
                if f % bf:
                    continue
                try:
                    out = _qmm_2d(x, qa.q, qa.scale, qa.offset, bits=4,
                                  group_size=128, block_f=bf,
                                  groupdot=True)
                    jax.block_until_ready(out)
                    ok_bf = bf
                    break
                except Exception as e:
                    msg = str(e).split("\n")[0][:100]
                    log(f"  {name} r{rows} bf{bf}: FAIL {msg}")
            results[(name, rows)] = ok_bf
            log(f"{name} [{rows},{d}]x[{d},{f}]: groupdot max bf = {ok_bf}")
    gc.collect()

    # ---- 2. row-determinism on chip: [8] block == first rows of [104]
    name = "wgu"
    d, f = UNITS[name]
    qa = qas[name]
    key, k2 = jax.random.split(key)
    xb = jax.random.normal(k2, (104, d), jnp.bfloat16)
    bf = results[(name, 104)] or 128
    o_small = _qmm_2d(xb[:8], qa.q, qa.scale, qa.offset, bits=4,
                      group_size=128, block_f=bf, groupdot=True)
    o_big = _qmm_2d(xb, qa.q, qa.scale, qa.offset, bits=4,
                    group_size=128, block_f=bf, groupdot=True)
    same = bool(jnp.all(o_small == o_big[:8]))
    log(f"row-determinism (8 vs 104 rows, {name}): {'BITWISE OK' if same else 'MISMATCH'}")
    # and across block_f choices
    bf2 = 128 if bf != 128 else 256
    if f % bf2 == 0:
        o_b2 = _qmm_2d(xb, qa.q, qa.scale, qa.offset, bits=4,
                       group_size=128, block_f=bf2, groupdot=True)
        same2 = bool(jnp.all(o_big == o_b2))
        log(f"blocking-independence (bf {bf} vs {bf2}): "
            f"{'BITWISE OK' if same2 else 'MISMATCH'}")

    # ---- 3. per-unit timing: groupdot vs prod (differential chained scan)
    def chain(qa, d, f, rows, groupdot, bf, n):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(x, n):
            def body(x, _):
                o = _qmm_2d(x, qa.q, qa.scale, qa.offset, bits=4,
                            group_size=128, block_f=bf, groupdot=groupdot)
                if f >= d:
                    nx = jnp.clip(o[:, :d], -1, 1).astype(x.dtype)
                else:
                    reps = -(-d // f)
                    nx = jnp.clip(jnp.tile(o, (1, reps))[:, :d], -1, 1
                                  ).astype(x.dtype)
                return nx, ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return x
        return run

    for name, (d, f) in UNITS.items():
        qa = qas[name]
        for rows in (8, 104):
            x = jnp.ones((rows, d), jnp.bfloat16) * 0.01
            line = f"{name} r{rows}:"
            for gd in (False, True):
                bf = results[(name, rows)] if gd else 512
                if gd and bf is None:
                    line += "  gd=FAIL"
                    continue
                r = chain(qa, d, f, rows, gd, bf or 512, 0)
                try:
                    for n in (4, 16):
                        jax.block_until_ready(r(x, n))
                    t4 = timed(r, x, 4)
                    t16 = timed(r, x, 16)
                    us = (t16 - t4) / 12 * 1e6
                    line += f"  {'gd' if gd else 'prod'}={us:7.1f}us"
                except Exception as e:
                    line += f"  {'gd' if gd else 'prod'}=ERR({str(e)[:60]})"
            log(line)
    del qas
    gc.collect()

    # ---- 4. end-to-end decode with the flag on
    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import InferenceEngine
    from flexflow_tpu.ops.sampling import SamplingConfig
    from flexflow_tpu.config import config as ffconfig

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    log("building 7B INT4 verifier for e2e")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0), jnp.bfloat16)
    v4 = fast_quantized_verifier(dspec, dparams, vspec, 4)
    del dparams
    gc.collect()

    batch, max_seq, window = 8, 512, 256
    lens = np.full(batch, 56, np.int32)
    toks = np.ones(batch, np.int32)
    scfg = SamplingConfig(temperature=np.zeros(batch, np.float32),
                          top_p=np.ones(batch, np.float32),
                          top_k=np.zeros(batch, np.int32))
    k = jax.random.PRNGKey(0)
    for flag in (False, True):
        ffconfig.int4_groupdot = flag
        eng = InferenceEngine(vspec, v4, max_requests_per_batch=batch,
                              max_seq_len=max_seq)
        try:
            for n in (8, 24):
                eng.decode_horizon(lens, toks, k, scfg, n, window=window)
            t1 = timed(lambda: eng.decode_horizon(lens, toks, k, scfg, 8,
                                                  window=window))
            t2 = timed(lambda: eng.decode_horizon(lens, toks, k, scfg, 24,
                                                  window=window))
            per = (t2 - t1) / 16 * 1e3
            log(f"e2e decode groupdot={flag}: {per:7.2f} ms/step "
                f"({batch/per*1e3:.0f} tok/s steady)")
        except Exception as e:
            log(f"e2e decode groupdot={flag}: FAILED {str(e)[:200]}")
        del eng
        gc.collect()


if __name__ == "__main__":
    main()
