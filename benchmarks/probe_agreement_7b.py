"""On-chip agreement probe for the ACTUAL bench_spec 7B pair (ROADMAP r3).

Round-3 chip capture measured only 1.922 verified tokens/step (implied
per-token acceptance ~0.5) where the CPU calibration targeted ~0.8: the
INT4 quantization error plus on-chip bf16 matmul rounding decorrelates the
pair far more than the CPU run did. This probe measures teacher-forced
argmax agreement of the bf16 draft against the INT4/INT8 verifier's own
greedy continuation, per DRAFT_NOISE_EPS level, so the bench noise knob
can be re-calibrated to the published-pair regime (~0.75-0.85/token) ON
THE CHIP.

    python -u benchmarks/probe_agreement_7b.py --bits 4
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
    ap.add_argument("--gen", type=int, default=96)
    ap.add_argument("--eps", type=float, nargs="*",
                    default=[0.0, 0.003, 0.01])
    args = ap.parse_args()
    t0 = time.time()

    def log(msg):
        print(f"[agree +{time.time()-t0:6.1f}s] {msg}", flush=True)

    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier, perturb_params
    from flexflow_tpu.models import decoder
    from flexflow_tpu.models import params as params_lib

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    log(f"devices {jax.devices()}; draft init")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    log(f"INT{args.bits} verifier build")
    vq = fast_quantized_verifier(dspec, dparams, vspec, args.bits)

    # verifier greedy continuation from a random prompt (on-distribution)
    rng = np.random.RandomState(0)
    n_ctx = 8
    seq = list(rng.randint(1, 32000, size=n_ctx))
    vcache = decoder.init_kv_cache(vspec, 1, 512, jnp.bfloat16)

    @jax.jit
    def vstep(params, toks, cache, lens):
        logits, cache = decoder.forward_cached(vspec, params, toks, cache,
                                               lens)
        return jnp.argmax(logits[:, -1], -1), cache

    nxt, vcache = vstep(vq, jnp.asarray([seq], jnp.int32), vcache,
                        jnp.zeros((1,), jnp.int32))
    lens = jnp.full((1,), n_ctx, jnp.int32)
    log("verifier prefill done; generating")
    for _ in range(args.gen):
        seq.append(int(nxt[0]))
        nxt, vcache = vstep(vq, nxt[:, None], vcache, lens)
        lens = lens + 1
    log(f"generated {args.gen} on-distribution tokens")

    # teacher-forced draft agreement on seq[n_ctx:]
    full = jnp.asarray([seq], jnp.int32)

    @jax.jit
    def draft_logits(params):
        pos = jnp.arange(full.shape[1], dtype=jnp.int32)[None]
        logits, _ = decoder.forward(dspec, params, full, pos,
                                    lengths=jnp.asarray([full.shape[1]]),
                                    return_kv=True)
        return jnp.argmax(logits, -1)

    want = np.asarray(seq[n_ctx:])  # target for positions n_ctx-1 ...
    for eps in args.eps:
        d = (dparams if eps == 0.0 else
             perturb_params(dparams, eps, jax.random.PRNGKey(42)))
        pred = np.asarray(draft_logits(d))[0]
        # pred[i] predicts token i+1; compare on the generated region
        got = pred[n_ctx - 1:n_ctx - 1 + len(want)]
        agree = float((got == want).mean())
        log(f"eps={eps}: teacher-forced agreement {agree:.3f} "
            f"({int((got == want).sum())}/{len(want)})")


if __name__ == "__main__":
    main()
