"""Round-5 probe: close the spec drain-tail gap (ROADMAP r4 #7).

bench_spec captures ~699 tok/s for the 7B INT4 spec path while device truth
at the measured iteration cost is ~860 — the loss is pipeline fill plus
tail over-dispatch: `_clamped_horizon(projected=True)` rounds the remaining
iteration estimate UP to a pow2 bucket, so the last dispatch can overshoot
the budget by most of a horizon (~33 ms/iteration wasted per overshoot).

Sweep, end-to-end through SpecRequestManager.generate on the EXACT bench
pair/workload (sharpened draft ckpt-325, INT4 verifier, w2d6, batch=8,
max_new=128):

  h=8  round-up   (shipping config)
  h=16 round-up   (coarser buckets: fewer dispatches, bigger overshoot)
  h=16 round-down (finer tail: trailing small dispatches instead of waste)

    python -u benchmarks/probe_r5_hsweep.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import gc
import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[hsweep +{time.time()-t0:7.1f}s] {msg}", flush=True)


def main():
    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier, sharpen_draft
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import GenerationConfig
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

    log("spec engine build (w2d6)")
    # fuse_qkv now defaults ON (config.py); the h-sweep baseline must be
    # genuinely UNFUSED or the final fused-vs-baseline comparison measures
    # fused vs fused (ADVICE r4)
    from flexflow_tpu.config import config as _ffcfg
    _ffcfg.fuse_qkv = False
    eng = SpecEngine(vspec, v4, dspec, draft, beam_width=2, beam_depth=6,
                     max_requests_per_batch=batch, max_seq_len=max_seq)

    def run_cfg(name, engine, h, mode):
        srm = SpecRequestManager(engine, fused=True, spec_horizon=h,
                                 pipelined=True)
        srm.horizon_round = mode
        log(f"{name}: warm")
        srm.generate(warm, cfg)
        best = 0.0
        for rep in range(3):
            a = time.perf_counter()
            reqs = srm.generate(prompts, cfg)
            dt = time.perf_counter() - a
            toks = sum(len(r.output_tokens) for r in reqs)
            tps = toks / dt
            best = max(best, tps)
            log(f"{name} rep{rep}: {tps:7.1f} tok/s ({toks} tok, {dt:.3f} s, "
                f"acc {srm.mean_verified_tokens_per_step:.3f})")
        log(f"{name}: BEST {best:.1f} tok/s")
        gc.collect()
        return best

    results = {}
    for name, h, mode in (("h8-up", 8, "up"), ("h16-up", 16, "up"),
                          ("h16-down", 16, "down"), ("h8-down", 8, "down")):
        results[name] = run_cfg(name, eng, h, mode)

    # fused wqkv/wgu carriers at the winning horizon (FF_FUSE_QKV measured
    # end-to-end; rebuild the engine so carriers concat at build time)
    del eng
    gc.collect()
    from flexflow_tpu.config import config as ffconfig
    ffconfig.fuse_qkv = True
    log("rebuild engine with fused carriers")
    eng_f = SpecEngine(vspec, v4, dspec, draft, beam_width=2, beam_depth=6,
                       max_requests_per_batch=batch, max_seq_len=max_seq)
    best_name = max(results, key=results.get)
    h, mode = (8 if "h8" in best_name else 16,
               "down" if "down" in best_name else "up")
    results["fused-" + best_name] = run_cfg("fused-" + best_name, eng_f, h,
                                            mode)
    log(f"RESULTS {results}")


if __name__ == "__main__":
    main()
