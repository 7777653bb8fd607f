"""Round-5 probe: attribute the 14.7 ms incremental decode step (VERDICT #2).

Known so far: packed INT4 weights are ~3.3 GB -> ~4.0 ms at HBM SoL; the
prod dequant-tile kernel measured ~1.3-1.9x SoL on isolated matmuls; window
-256 attention reads ~1.05 GB -> ~1.3 ms. That sums to ~9 ms, leaving ~6 ms
unattributed (norms/rope/staging/sampling/scan overhead?). Measure:

  fwd        scan of decoder.forward_cached(write_cache=False), fixed token
             (weights + attention + norms/rope; NO sampling, NO staging)
  fwd+samp   + greedy sampling feeding the next token (adds argmax+lm feed)
  decode_n   the shipping program (adds staging DUS + extra_kv + commit/n)
  windows    fwd at window 128 / 256 / 512 -> attention bytes slope
  units      per-unit quant matmul at rows=8, LONG chains (n=32/128) so the
             differential dwarfs dispatch noise

    python -u benchmarks/probe_r5_decattr.py
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
    print(f"[decattr +{time.time()-t0:7.1f}s] {msg}", flush=True)


def timed(fn, *args, reps=3):
    best = float("inf")
    for _ in range(reps):
        a = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - a)
    return best


def main():
    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier
    from flexflow_tpu.models import params as params_lib, decoder
    from flexflow_tpu.models.decoder import KVCache
    from flexflow_tpu.ops import sampling as sampling_lib
    from flexflow_tpu.ops.sampling import SamplingConfig
    from flexflow_tpu.serving import InferenceEngine

    gc.disable()
    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    batch, max_seq, window = 8, 512, 256

    log("7B INT4 verifier build")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0), jnp.bfloat16)
    v4 = fast_quantized_verifier(dspec, dparams, vspec, 4)
    del dparams
    gc.collect()

    eng = InferenceEngine(vspec, v4, max_requests_per_batch=batch,
                          max_seq_len=max_seq)
    params = eng.params  # fused carriers
    cache = eng.cache
    lens = jnp.full((batch,), 56, jnp.int32)
    toks0 = jnp.ones((batch,), jnp.int32)

    # ---- fwd-only scan (no sampling: next token = argmax? no — FIXED) ----
    def make_fwd(win, sample):
        cr = KVCache(k=cache.k[..., :win], v=cache.v[..., :win])

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(params, toks, n):
            def body(tok, i):
                logits, _kv = decoder.forward_cached(
                    vspec, params, tok[:, None], cr, lens,
                    positions=lens[:, None], write_cache=False)
                if sample:
                    nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                else:
                    # data dependency without an argmax reduction
                    nxt = (tok + logits[:, 0, 0].astype(jnp.int32) % 3) % 1000
                return nxt, ()
            tok, _ = jax.lax.scan(body, toks, jnp.arange(n), length=n)
            return tok
        return run

    for name, win, sample in (("fwd w256", 256, False),
                              ("fwd+argmax w256", 256, True),
                              ("fwd w128", 128, False),
                              ("fwd w512", 512, False)):
        run = make_fwd(win, sample)
        for n in (8, 40):
            jax.block_until_ready(run(params, toks0, n))
        t1 = timed(run, params, toks0, 8)
        t2 = timed(run, params, toks0, 40)
        per = (t2 - t1) / 32 * 1e3
        log(f"{name}: {per:7.2f} ms/step (n8={t1*1e3:.1f} n40={t2*1e3:.1f})")

    # ---- the shipping decode_n for reference ----
    scfg = SamplingConfig(temperature=np.zeros(batch, np.float32),
                          top_p=np.ones(batch, np.float32),
                          top_k=np.zeros(batch, np.int32))
    key = jax.random.PRNGKey(0)
    lens_np = np.full(batch, 56, np.int32)
    toks_np = np.ones(batch, np.int32)
    for n in (8, 40):
        eng.decode_horizon(lens_np, toks_np, key, scfg, n, window=window)
    t1 = timed(lambda: eng.decode_horizon(lens_np, toks_np, key, scfg, 8,
                                          window=window))
    t2 = timed(lambda: eng.decode_horizon(lens_np, toks_np, key, scfg, 40,
                                          window=window))
    log(f"decode_n w256: {(t2-t1)/32*1e3:7.2f} ms/step "
        f"(n8={t1*1e3:.1f} n40={t2*1e3:.1f})")

    # ---- per-unit weight matmul costs at rows=8, long chains ----
    from flexflow_tpu.ops.pallas.quant_matmul import _qmm_2d

    units = {
        "wqkv": params["layers"]["wqkv"],
        "wo": params["layers"]["wo"],
        "wgu": params["layers"]["wgu"],
        "wd": params["layers"]["wd"],
        "lm_head": params.get("lm_head", params.get("wte")),
    }

    total_per_layer = 0.0
    for name, qa in units.items():
        if qa is None or not hasattr(qa, "q"):
            log(f"{name}: not quantized, skipping")
            continue
        q = qa.q[0] if qa.q.ndim == 3 else qa.q
        s = qa.scale[0] if qa.scale.ndim == 3 else qa.scale
        off = (qa.offset[0] if qa.offset.ndim == 3 else qa.offset) \
            if qa.offset is not None else None
        d = qa.d_contract
        f = q.shape[-1]

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(x, n, q=q, s=s, off=off, d=d, f=f, gs=qa.group_size,
                bits=qa.bits):
            def body(x, _):
                o = _qmm_2d(x, q, s, off, bits=bits, group_size=gs)
                if f >= d:
                    nx = jnp.clip(o[:, :d], -1, 1).astype(x.dtype)
                else:
                    reps = -(-d // f)
                    nx = jnp.clip(jnp.tile(o, (1, reps))[:, :d], -1, 1
                                  ).astype(x.dtype)
                return nx, ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return x

        x = jnp.ones((batch, d), jnp.bfloat16) * 0.01
        for n in (32, 128):
            jax.block_until_ready(run(x, n))
        t1 = timed(run, x, 32)
        t2 = timed(run, x, 128)
        us = (t2 - t1) / 96 * 1e6
        packed = q.size * q.dtype.itemsize
        sol = packed / 819e9 * 1e6
        log(f"{name} [{8},{d}]x[{d},{f}]: {us:7.1f}us ({us/sol:.2f}x SoL "
            f"{sol:.0f}us)")
        if name != "lm_head":
            total_per_layer += us
    log(f"per-layer weights total: {total_per_layer:.1f}us "
        f"-> {total_per_layer*32/1e3:.2f} ms/step over 32 layers")


if __name__ == "__main__":
    main()
