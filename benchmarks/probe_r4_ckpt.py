"""Round-4 probe: checkpoint-gap acceptance knob for the sharpened pair.

Verifier = embed(quantize(checkpoint_400)); draft candidates = earlier
checkpoints of the SAME training run (the weak/strong same-family
relationship of real published pairs). Measures teacher-forced agreement of
each candidate on the verifier's own greedy continuation, ON CHIP.

    python -u benchmarks/probe_r4_ckpt.py
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
    print(f"[ckpt +{time.time()-t0:6.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--ckpts", type=int, nargs="*",
                    default=[400, 500, 600])
    args = ap.parse_args()

    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier, sharpen_draft
    from flexflow_tpu.models import decoder
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import (
        GenerationConfig, InferenceEngine, RequestManager,
    )

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    log(f"devices {jax.devices()}; init + sharpen {args.steps}")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    final, ckpts = sharpen_draft(dspec, dparams, steps=args.steps,
                                 checkpoints=tuple(args.ckpts), log_fn=log)
    del dparams
    import gc
    gc.collect()
    log("INT4 verifier build from final checkpoint")
    vq = fast_quantized_verifier(dspec, final, vspec, 4)

    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 32000, size=24).tolist() for _ in range(8)]
    eng = InferenceEngine(vspec, vq, max_requests_per_batch=8,
                          max_seq_len=512)
    rm = RequestManager(eng, decode_horizon=32, pipelined=True)
    reqs = rm.generate(prompts, GenerationConfig(max_new_tokens=64))
    outs = [r.output_tokens for r in reqs]
    log(f"continuations ready; uniq-frac "
        f"{[round(len(set(o))/len(o), 2) for o in outs]}")

    @jax.jit
    def draft_pred(draft, full, length):
        pos = jnp.arange(full.shape[1], dtype=jnp.int32)[None]
        logits, _ = decoder.forward(dspec, draft, full, pos,
                                    lengths=length, return_kv=True)
        return jnp.argmax(logits, -1)

    for step_id in sorted(ckpts):
        draft = ckpts[step_id]
        agrees = []
        for p, o in zip(prompts, outs):
            seq = list(p) + list(o)
            full = np.zeros((1, 128), np.int32)
            full[0, :len(seq)] = seq
            pred = np.asarray(draft_pred(
                draft, jnp.asarray(full), jnp.asarray([len(seq)])))[0]
            want = np.asarray(o)
            got = pred[len(p) - 1:len(p) - 1 + len(want)]
            agrees.append(float((got == want).mean()))
        m = float(np.mean(agrees))
        log(f"ckpt {step_id}: mean agreement {m:.3f} "
            f"(per-row {[round(a, 2) for a in agrees]})")


if __name__ == "__main__":
    main()
