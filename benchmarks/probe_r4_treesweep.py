"""Round-4 probe: tree-shape sweep for the 7B INT4 spec gate.

At 0.81/token measured agreement, wide trees buy little acceptance over a
chain: E[chain accept, depth d] = (1-p^(d+1))/(1-p) = 4.48 at d=8 vs 4.80
measured for width 3 (25-token tree). Narrower trees make verify ~= one
decode-weight pass and shrink the commit. Steady-state end-to-end tok/s per
(width, depth), real SpecRequestManager (pipelined, projection clamp).

    python -u benchmarks/probe_r4_treesweep.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import gc
import time

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[tree +{time.time()-t0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--combos", type=str, default="1x8,2x6,2x8,3x8,1x12")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--spec-horizon", type=int, default=8)
    args = ap.parse_args()

    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier, sharpen_draft
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import GenerationConfig
    from flexflow_tpu.serving.spec_manager import SpecRequestManager
    from flexflow_tpu.serving.speculative import SpecEngine

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    batch, max_new = args.batch, args.max_new
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 32000, size=24).tolist() for _ in range(batch)]
    warm = [rng.randint(1, 32000, size=24).tolist() for _ in range(batch)]
    cfg = GenerationConfig(max_new_tokens=max_new)

    log("build (sharpened checkpoint pair, bench_spec construction)")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    dparams, ckpts = sharpen_draft(
        dspec, dparams, steps=bench_spec.SHARPEN_STEPS,
        checkpoints=(bench_spec.DRAFT_CKPT,), log_fn=log)
    draft = ckpts[bench_spec.DRAFT_CKPT]
    del ckpts
    import gc; gc.collect()
    v4 = fast_quantized_verifier(dspec, dparams, vspec, 4)

    for combo in args.combos.split(","):
        w, d = (int(v) for v in combo.split("x"))
        log(f"--- width {w} depth {d} (tree {1 + w * d}) ---")
        seng = SpecEngine(vspec, v4, dspec, draft, beam_width=w,
                          beam_depth=d, max_requests_per_batch=batch,
                          max_seq_len=512)
        srm = SpecRequestManager(seng, fused=True,
                                 spec_horizon=args.spec_horizon,
                                 pipelined=True)
        srm.generate(warm, cfg)  # full-workload warm
        best = 0.0
        for _ in range(2):
            t = time.perf_counter()
            reqs = srm.generate(prompts, cfg)
            dt = time.perf_counter() - t
            n = sum(len(r.output_tokens) for r in reqs)
            best = max(best, n / dt)
        log(f"w{w}d{d}: {best:.0f} tok/s steady "
            f"(acc {srm.mean_verified_tokens_per_step:.2f})")
        del seng, srm
        gc.collect()


if __name__ == "__main__":
    main()
