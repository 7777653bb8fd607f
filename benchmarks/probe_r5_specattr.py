"""Round-5 probe: attribute the fused spec iteration's ~37 ms (VERDICT #1/#7).

Device truth says a spec iteration costs ~33-37 ms while its parts should
sum to ~23 (verify ~16 = incr step cost, draft ~7): something — the accept
walk, the staged-append einsums, the extra_kv concats, or the commit — is
eating the difference, and that difference is exactly what caps the
spec-vs-incremental ratio. Measure each stage by DIFFERENTIAL chained
timing: scan the stage body n1/n2 times inside one jit, (t2-t1)/(n2-n1).

Variants (all read-only against the caches, same static shapes as the
shipping _staged_horizon at h=8, window=256):

  draft      draft_phase only (staged buffers live, like iteration >0)
  dv         draft_phase + verify_logits_reg + argmax
  dvw        + greedy_accept_walk
  dvws       + _append_staged for BOTH models (full body minus commit)
  full       engine.fused_step_n diff h=2 vs h=6 (commit+dispatch cancel)
  incr       engine-free InferenceEngine decode_n diff n=8 vs n=24

Also times the INT4 group-dot kernel vs the prod dequant-tile kernel at the
7B serving shapes (decode b=8, draft b=16, verify b=104) and checks the
compiler accepts group-dot at those shapes (VMEM), via memory_analysis.

    python -u benchmarks/probe_r5_specattr.py
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
    print(f"[specattr +{time.time()-t0:7.1f}s] {msg}", flush=True)


def timed(fn, *args, reps=3):
    """Best-of-reps wall time of a blocked call (contention only adds)."""
    best = float("inf")
    for _ in range(reps):
        a = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - a)
    return best


def main():
    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier
    from flexflow_tpu.models import params as params_lib, decoder
    from flexflow_tpu.models.decoder import KVCache
    from flexflow_tpu.serving.speculative import (
        SpecEngine, greedy_accept_walk, make_depths_vec)

    gc.disable()
    tiny = "--tiny" in _sys.argv  # CPU smoke: validate the probe compiles/runs
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        dspec, vspec = bench_spec.DRAFT_S, bench_spec.VERIFIER_S
    else:
        dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    batch, max_seq = 8, 512
    w, d = 2, 6
    tree = 1 + w * d
    h = 8
    window = 256

    log("random draft init (cost probe needs shapes, not acceptance)")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0), jnp.bfloat16)
    log("fast INT4 verifier build")
    v4 = fast_quantized_verifier(dspec, dparams, vspec, 4)
    gc.collect()

    log("spec engine build (w2d6)")
    eng = SpecEngine(vspec, v4, dspec, dparams, beam_width=w, beam_depth=d,
                     max_requests_per_batch=batch, max_seq_len=max_seq)

    lens = np.full(batch, 56, np.int32)  # mid-run committed lengths
    roots = np.arange(1, batch + 1, dtype=np.int32)

    draft_phase = eng._draft_phase_core
    vlr = eng._verify_logits_reg
    app = eng._append_staged_core
    depths_vec = make_depths_vec(w, d)
    cap = h * (d + 1)

    llm_read = KVCache(k=eng.llm_cache.k[..., :window],
                       v=eng.llm_cache.v[..., :window])
    ssm_read = KVCache(k=eng.ssm_cache.k[..., :window],
                       v=eng.ssm_cache.v[..., :window])

    sl, skh, sd = dspec.num_layers, dspec.num_kv_heads, dspec.head_dim
    ll, lkh, ld = vspec.num_layers, vspec.num_kv_heads, vspec.head_dim

    def stage0():
        return (jnp.zeros((ll, batch, cap, lkh, ld), jnp.bfloat16),
                jnp.zeros((ll, batch, cap, lkh, ld), jnp.bfloat16),
                jnp.zeros((sl, batch, cap, skh, sd), jnp.bfloat16),
                jnp.zeros((sl, batch, cap, skh, sd), jnp.bfloat16),
                jnp.zeros((batch,), jnp.int32))

    def make_variant(stage):
        """stage in {draft, dv, dvw, dvws}; scan body mirrors
        speculative._staged_horizon exactly up to the named stage."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(llm_params, ssm_params, lens, roots, n):
            lens = jnp.asarray(lens, jnp.int32)

            def body(carry, _):
                s_lk, s_lv, s_sk, s_sv, counts, roots = carry
                tt, tp, anc, ssm_buf = draft_phase(
                    ssm_params, ssm_read, lens, roots,
                    staged=(s_sk, s_sv, counts))
                if stage == "draft":
                    nxt = tt[:, 1]  # data dependency
                    return (s_lk, s_lv, s_sk, s_sv, counts, nxt), tt[:, 0]
                logits, llm_buf = vlr(
                    llm_params, llm_read, lens, tt,
                    jnp.broadcast_to(depths_vec[None], (batch, tree)), anc,
                    staged=(s_lk, s_lv, counts))
                expected = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if stage == "dv":
                    nxt = expected[:, 0]
                    return (s_lk, s_lv, s_sk, s_sv, counts, nxt), nxt
                produced, n_acc, from_slots = greedy_accept_walk(
                    expected, tt, tp, d)
                nxt = jnp.take_along_axis(
                    produced, (n_acc - 1)[:, None], axis=1)[:, 0]
                if stage == "dvw":
                    return (s_lk, s_lv, s_sk, s_sv, counts, nxt), nxt
                path = from_slots[:, :d + 1]
                s_lk, s_lv = app(s_lk, s_lv, *llm_buf, path, counts, n_acc)
                s_sk, s_sv = app(s_sk, s_sv, *ssm_buf, path, counts, n_acc)
                # counts stays put so shapes/cost match iteration-after-
                # iteration without overrunning cap at large n
                return (s_lk, s_lv, s_sk, s_sv, counts, nxt), nxt

            s_lk, s_lv, s_sk, s_sv, counts = stage0()
            _, out = jax.lax.scan(
                body, (s_lk, s_lv, s_sk, s_sv, counts,
                       jnp.asarray(roots, jnp.int32)), None, length=n)
            return out

        return run

    results = {}
    n1, n2 = 2, 6
    for stage in ("draft", "dv", "dvw", "dvws"):
        run = make_variant(stage)
        log(f"compile {stage} n={n1},{n2}")
        for n in (n1, n2):
            jax.block_until_ready(
                run(eng.llm_params, eng.ssm_params, lens, roots, n))
        t_1 = timed(run, eng.llm_params, eng.ssm_params, lens, roots, n1)
        t_2 = timed(run, eng.llm_params, eng.ssm_params, lens, roots, n2)
        per = (t_2 - t_1) / (n2 - n1) * 1e3
        results[stage] = per
        log(f"{stage}: {per:7.2f} ms/iter  (t{n1}={t_1*1e3:.1f} t{n2}={t_2*1e3:.1f})")

    # full fused horizon (includes walk/staging AND the real commit once)
    log("compile fused_step_n h=2,6")
    for hh in (2, 6):
        eng.fused_step_n(lens, roots, hh, window)
    t1 = timed(lambda: eng.fused_step_n(lens, roots, 2, window))
    t2 = timed(lambda: eng.fused_step_n(lens, roots, 6, window))
    results["full"] = (t2 - t1) / 4 * 1e3
    log(f"full: {results['full']:7.2f} ms/iter  (h2={t1*1e3:.1f} h6={t2*1e3:.1f})")
    # one-horizon absolute (commit + dispatch incl.) for the h8 shipping shape
    eng.fused_step_n(lens, roots, 8, window)
    t8 = timed(lambda: eng.fused_step_n(lens, roots, 8, window))
    log(f"h8 absolute: {t8*1e3:.1f} ms ({t8/8*1e3:.2f} ms/iter incl. "
        f"commit+dispatch)")

    log("ATTRIBUTION (ms/iter):")
    log(f"  draft          {results['draft']:7.2f}")
    log(f"  verify         {results['dv'] - results['draft']:7.2f}")
    log(f"  accept walk    {results['dvw'] - results['dv']:7.2f}")
    log(f"  append_staged  {results['dvws'] - results['dvw']:7.2f}")
    log(f"  scan-body total{results['dvws']:7.2f}")
    log(f"  full-iter diff {results['full']:7.2f}")

    del eng
    gc.collect()

    # ---- incremental decode per-step (same verifier) ----
    from flexflow_tpu.serving import InferenceEngine
    from flexflow_tpu.ops.sampling import SamplingConfig

    log("incr engine build")
    ieng = InferenceEngine(vspec, v4, max_requests_per_batch=batch,
                           max_seq_len=max_seq)
    scfg = SamplingConfig(temperature=np.zeros(batch, np.float32),
                          top_p=np.ones(batch, np.float32),
                          top_k=np.zeros(batch, np.int32))
    key = jax.random.PRNGKey(0)
    toks = np.ones(batch, np.int32)
    for n in (8, 24):
        ieng.decode_horizon(lens, toks, key, scfg, n, window=window)
    ti1 = timed(lambda: ieng.decode_horizon(lens, toks, key, scfg, 8,
                                            window=window))
    ti2 = timed(lambda: ieng.decode_horizon(lens, toks, key, scfg, 24,
                                            window=window))
    per = (ti2 - ti1) / 16 * 1e3
    log(f"incr: {per:7.2f} ms/step  (n8={ti1*1e3:.1f} n24={ti2*1e3:.1f}; "
        f"{batch/per*1e3:.0f} tok/s steady)")


if __name__ == "__main__":
    main()
