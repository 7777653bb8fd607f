"""Why is on-chip verified/step 1.922 when probe agreement is 0.958?

Measures the draft's teacher-forced agreement in EXACTLY the bench_spec
regime: the same 8 random 24-token prompts, the INT4 verifier's own
incremental greedy continuations (through the real InferenceEngine), then
the (noised) draft teacher-forced on each row. This is the direct
predictor of tree acceptance; comparing it against the single-sequence
probe (probe_agreement_7b.py) separates "the pair disagrees on the bench
distribution" from "the acceptance pipeline loses agreement".

    python -u benchmarks/probe_spec_acceptance.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--eps", type=float, nargs="*", default=[0.01])
    ap.add_argument("--matched", action="store_true",
                    help="quantization-matched drafts (spec_pair."
                         "quantization_matched_draft) instead of raw bf16")
    ap.add_argument("--sharpen", type=int, default=0,
                    help="sharpen_draft training steps before building the "
                         "pair (0 = raw random init)")
    args = ap.parse_args()
    t0 = time.time()

    def log(msg):
        print(f"[acc +{time.time()-t0:6.1f}s] {msg}", flush=True)

    import bench_spec
    from benchmarks.spec_pair import (
        fast_quantized_verifier, perturb_params, quantization_matched_draft,
        sharpen_draft,
    )
    from flexflow_tpu.models import decoder
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import (
        GenerationConfig, InferenceEngine, RequestManager,
    )

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    log(f"devices {jax.devices()}; draft init")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    if args.sharpen:
        log(f"sharpening draft ({args.sharpen} steps)")
        dparams = sharpen_draft(dspec, dparams, steps=args.sharpen,
                                log_fn=log)
    base = dparams
    if args.matched:
        log(f"building quantization-matched draft (INT{args.bits})")
        base = quantization_matched_draft(dspec, dparams, args.bits)
    log(f"INT{args.bits} verifier build")
    vq = fast_quantized_verifier(dspec, dparams, vspec, args.bits)

    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 32000, size=24).tolist() for _ in range(8)]
    log("incremental generation (bench prompts, greedy)")
    eng = InferenceEngine(vspec, vq, max_requests_per_batch=8,
                          max_seq_len=512)
    rm = RequestManager(eng, decode_horizon=32, pipelined=True)
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=args.max_new))
    outs = [r.output_tokens for r in reqs]
    log(f"generated; lens {[len(o) for o in outs]}; "
        f"uniq-token-frac {[round(len(set(o))/max(len(o),1),2) for o in outs]}")

    @jax.jit
    def draft_pred(draft, full, length):
        pos = jnp.arange(full.shape[1], dtype=jnp.int32)[None]
        logits, _ = decoder.forward(dspec, draft, full, pos,
                                    lengths=length, return_kv=True)
        return jnp.argmax(logits, -1)

    # verifier confidence: top-2 logit gap along its own continuation —
    # the quantity that decides whether cross-program numeric jitter can
    # flip the argmax (the prefix-20 gate failure mode)
    @jax.jit
    def verifier_gaps(vq, full, length):
        # vq is an ARGUMENT: a closure capture would inline the 3.5 GB
        # carriers into the remote-compile request (HTTP 413)
        pos = jnp.arange(full.shape[1], dtype=jnp.int32)[None]
        logits, _ = decoder.forward(vspec, vq, full, pos,
                                    lengths=length, return_kv=True)
        top2 = jax.lax.top_k(logits, 2)[0]
        return top2[..., 0] - top2[..., 1]

    gaps_all = []
    for p, o in zip(prompts, outs):
        seq = list(p) + list(o)
        pad = 128
        full = np.zeros((1, pad), np.int32)
        full[0, :len(seq)] = seq
        g = np.asarray(verifier_gaps(vq, jnp.asarray(full),
                                     jnp.asarray([len(seq)])))[0]
        gaps_all.append(g[len(p) - 1:len(seq) - 1])
    gaps = np.concatenate(gaps_all)
    log(f"verifier top-2 gap: median {np.median(gaps):.4f}  "
        f"p10 {np.percentile(gaps, 10):.4f}  min {gaps.min():.5f}  "
        f"frac<0.01 {float((gaps < 0.01).mean()):.3f}")

    for eps in args.eps:
        draft = (base if eps == 0.0 else
                 perturb_params(base, eps, jax.random.PRNGKey(42)))
        # teacher-forced draft agreement per row
        agrees = []
        for i, (p, o) in enumerate(zip(prompts, outs)):
            seq = list(p) + list(o)
            pad = 128
            full = np.zeros((1, pad), np.int32)
            full[0, :len(seq)] = seq
            pred = np.asarray(draft_pred(
                draft, jnp.asarray(full), jnp.asarray([len(seq)])))[0]
            want = np.asarray(o)
            got = pred[len(p) - 1:len(p) - 1 + len(want)]
            agrees.append(float((got == want).mean()))
        m = float(np.mean(agrees))
        log(f"eps={eps} matched={args.matched} per-row: "
            f"{[round(a, 3) for a in agrees]}")
        log(f"eps={eps} mean agreement {m:.3f} "
            f"(chain-accept at depth 8 ~"
            f"{(1 - m ** 9) / (1 - m + 1e-9):.2f}/step)")


if __name__ == "__main__":
    main()
