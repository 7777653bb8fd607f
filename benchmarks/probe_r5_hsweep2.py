"""Round-5 probe: spec e2e with raw staging + 4-deep pipeline (VERDICT #1).

After the r5 redesign (raw tree-buffer staging — no per-iteration
compaction einsums; spec pipeline_depth horizons in flight), sweep the
exact bench workload (sharpened ckpt-325 pair, INT4 verifier, batch=8,
max_new=128) over horizon x tree shape:

    w2d6 h8 / h16      (r4 shipping tree; deeper horizon now cheap)
    w2d8 h8 / h16      (deeper tree: more accepted tokens per verify pass)

plus the INT4 incremental baseline from the same process for the ratio.

    python -u benchmarks/probe_r5_hsweep2.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import gc
import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[hsweep2 +{time.time()-t0:7.1f}s] {msg}", flush=True)


def main():
    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier, sharpen_draft
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import (
        GenerationConfig, InferenceEngine, RequestManager,
    )
    from flexflow_tpu.serving.speculative import SpecEngine
    from flexflow_tpu.serving.spec_manager import SpecRequestManager

    gc.disable()
    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    batch, max_seq, max_new = 8, 512, 128
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, dspec.vocab_size, size=24).tolist()
               for _ in range(batch)]
    warm = [rng.randint(1, dspec.vocab_size, size=24).tolist()
            for _ in range(batch)]
    cfg = GenerationConfig(max_new_tokens=max_new)

    log("draft init + sharpen (bench pair)")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    dparams, ckpts = sharpen_draft(
        dspec, dparams, steps=bench_spec.SHARPEN_STEPS,
        checkpoints=(bench_spec.DRAFT_CKPT,), log_fn=log)
    draft = ckpts[bench_spec.DRAFT_CKPT]
    del ckpts
    log("INT4 verifier build")
    v4 = fast_quantized_verifier(dspec, dparams, vspec, 4)
    del dparams
    gc.collect()

    # ---- incremental baseline (same process, same verifier) ----
    log("incr baseline")
    ieng = InferenceEngine(vspec, v4, max_requests_per_batch=batch,
                           max_seq_len=max_seq)
    rm = RequestManager(ieng, decode_horizon=64, pipelined=True)
    rm.generate(warm, cfg)
    incr = 0.0
    for rep in range(3):
        a = time.perf_counter()
        reqs = rm.generate(prompts, cfg)
        dt = time.perf_counter() - a
        tps = sum(len(r.output_tokens) for r in reqs) / dt
        incr = max(incr, tps)
        log(f"incr rep{rep}: {tps:7.1f} tok/s")
    ref_out = [r.output_tokens for r in reqs]
    del ieng, rm, reqs
    gc.collect()

    from flexflow_tpu.quant.weight_only import quantize_params

    results = {}
    for (w, d, dq) in ((2, 6, "bf16"),):
        log(f"spec engine build w{w}d{d} draft={dq}")
        eng = SpecEngine(vspec, v4, dspec, draft,
                         beam_width=w, beam_depth=d,
                         max_requests_per_batch=batch, max_seq_len=max_seq)
        for h in (10, 12, 8):
            srm = SpecRequestManager(eng, fused=True, spec_horizon=h,
                                     pipelined=True)
            srm.generate(warm, cfg)
            best = 0.0
            for rep in range(3):
                a = time.perf_counter()
                reqs = srm.generate(prompts, cfg)
                dt = time.perf_counter() - a
                tps = sum(len(r.output_tokens) for r in reqs) / dt
                best = max(best, tps)
                log(f"w{w}d{d} {dq} h{h} rep{rep}: {tps:7.1f} tok/s "
                    f"(acc {srm.mean_verified_tokens_per_step:.3f})")
            match = all(a.output_tokens[:20] == b[:20]
                        for a, b in zip(reqs, ref_out))
            results[(w, d, dq, h)] = (best, srm.mean_verified_tokens_per_step,
                                      match)
            log(f"w{w}d{d} {dq} h{h}: BEST {best:.1f} tok/s  ratio "
                f"{best/incr:.3f}x  prefix20={'OK' if match else 'FAIL'}")
        del eng
        gc.collect()

    log(f"incr baseline: {incr:.1f} tok/s")
    for k, (tps, acc, match) in sorted(results.items(), key=str):
        log(f"  w{k[0]}d{k[1]} {k[2]} h{k[3]}: {tps:7.1f} tok/s  "
            f"{tps/incr:.3f}x  acc {acc:.3f}  prefix20 {match}")


if __name__ == "__main__":
    main()
