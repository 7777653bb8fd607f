"""Round-4 probe: harness overhead around the 7B INT4 generate() runs.

Device truth (differential): incr 16.8 ms/step (475 tok/s at B=8), spec
45.9 ms/iter x 4.8 accepted (=837 tok/s) -> device speedup 1.76x. The
bench measured only 204 / 150 tok/s — ~4-5 s of harness overhead on ~1 s
of device work. This probe reruns the bench's exact INT4 phases with
per-phase profiling and a second (steady-state) repetition.

    python -u benchmarks/probe_r4_harness.py [--spec-horizon 8]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[harn +{time.time()-t0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec-horizon", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=128)
    args = ap.parse_args()

    from flexflow_tpu.config import config
    config.profiling = True
    import gc
    gc.disable()

    import bench_spec
    from benchmarks.spec_pair import (
        fast_quantized_verifier, quantization_matched_draft,
    )
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import (
        GenerationConfig, InferenceEngine, RequestManager,
    )
    from flexflow_tpu.serving.spec_manager import SpecRequestManager
    from flexflow_tpu.serving.speculative import SpecEngine

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    batch, max_seq, max_new = args.batch, 512, args.max_new
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 32000, size=24).tolist() for _ in range(batch)]
    prompts2 = [rng.randint(1, 32000, size=24).tolist() for _ in range(batch)]
    warm = [rng.randint(1, 32000, size=24).tolist() for _ in range(batch)]
    cfg = GenerationConfig(max_new_tokens=max_new)

    log("build")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    draft = quantization_matched_draft(dspec, dparams, 4)
    v4 = fast_quantized_verifier(dspec, dparams, vspec, 4)

    # ---- incr ----
    eng = InferenceEngine(vspec, v4, max_requests_per_batch=batch,
                          max_seq_len=max_seq)
    rm = RequestManager(eng, decode_horizon=64, pipelined=True)
    log("incr warm")
    rm.generate(warm, GenerationConfig(max_new_tokens=64))
    for rep in (1, 2, 3):
        from flexflow_tpu.utils.profiling import StepTimer
        rm.timer = StepTimer()
        t = time.perf_counter()
        reqs = rm.generate(prompts2 if rep == 3 else prompts, cfg)
        dt = time.perf_counter() - t
        n = sum(len(r.output_tokens) for r in reqs)
        log(f"incr rep{rep}: {n} tok in {dt:.2f}s = {n/dt:.0f} tok/s")
        for ln in rm.timer.report():
            log("  " + ln)
    import gc
    del eng, rm
    gc.collect()

    # ---- spec ----
    seng = SpecEngine(vspec, v4, dspec, draft, beam_width=3, beam_depth=8,
                      max_requests_per_batch=batch, max_seq_len=max_seq)
    srm = SpecRequestManager(seng, fused=True,
                            spec_horizon=args.spec_horizon, pipelined=True)
    log("spec warm")
    srm.generate(warm[:2], GenerationConfig(max_new_tokens=16))
    for rep in (1, 2, 3):
        from flexflow_tpu.utils.profiling import StepTimer
        srm.timer = StepTimer()
        t = time.perf_counter()
        reqs = srm.generate(prompts2 if rep == 3 else prompts, cfg)
        dt = time.perf_counter() - t
        n = sum(len(r.output_tokens) for r in reqs)
        log(f"spec rep{rep}: {n} tok in {dt:.2f}s = {n/dt:.0f} tok/s "
            f"(acc {srm.mean_verified_tokens_per_step:.2f})")
        for ln in srm.timer.report():
            log("  " + ln)


if __name__ == "__main__":
    main()
