"""Round-4 probe: where do 252 ms/iteration go in the 7B INT4 spec path?

bench_spec measured 4.80 verified tokens/step but only 150 tok/s — implying
~250 ms per fused speculative iteration where ~40 ms is expected (verify ~=
one 17 ms decode-weight pass + 9 small draft steps + commit). Times, with
the differential method:

  fused n=4 vs n=16     — per-iteration device time of the fused program
  draft-only chain      — the 9-step beam expansion alone
  verify-only chain     — the 25-token tree forward alone

Then one profiled SpecRequestManager.generate to split host phases.

    python -u benchmarks/probe_r4_spec.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

t0 = time.time()


def log(msg):
    print(f"[spec +{time.time()-t0:7.1f}s] {msg}", flush=True)


def difftime(fn, n1, n2, iters=4):
    for n in (n1, n2):
        jax.block_until_ready(fn(n))
    t = {}
    for n in (n1, n2):
        ts = []
        for _ in range(iters):
            a = time.perf_counter()
            jax.block_until_ready(fn(n))
            ts.append(time.perf_counter() - a)
        t[n] = min(ts)
    return (t[n2] - t[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=3)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    import bench_spec
    from benchmarks.spec_pair import (
        fast_quantized_verifier, quantization_matched_draft,
    )
    from flexflow_tpu.models import decoder, params as params_lib
    from flexflow_tpu.serving.speculative import SpecEngine

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    log(f"devices {jax.devices()}; build")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    draft = quantization_matched_draft(dspec, dparams, 4)
    v4 = fast_quantized_verifier(dspec, dparams, vspec, 4)

    eng = SpecEngine(vspec, v4, dspec, draft, beam_width=args.width,
                     beam_depth=args.depth, max_requests_per_batch=8,
                     max_seq_len=512)
    b = 8
    lens0 = jnp.full((b,), 32, jnp.int32)
    roots0 = jnp.arange(1, b + 1, dtype=jnp.int32)

    # --- fused iteration: differential over the horizon scan ---
    def run_fused(n):
        produced, n_acc, lens, roots, eng.llm_cache, eng.ssm_cache = (
            eng._fused_step_n(
                eng.llm_params, eng.ssm_params, eng.llm_cache, eng.ssm_cache,
                lens0, roots0, n)
        )
        return n_acc

    log("compile fused n=4/n=16")
    per_iter = difftime(run_fused, 4, 16)
    log(f"fused iteration: {per_iter*1e3:.2f} ms")

    # --- draft-only: chain the draft tree build n times ---
    draft_phase = eng._draft_phase_core

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_draft(ssm_params, ssm_cache, lens, roots, n):
        def body(carry, _):
            roots = carry
            tt, tp, anc, buf = draft_phase(ssm_params, ssm_cache, lens, roots)
            return tt[:, -1], (tt[:, 0],)

        out, _ = jax.lax.scan(body, roots, None, length=n)
        return out

    log("compile draft-only n=4/n=16")
    per_draft = difftime(
        lambda n: run_draft(eng.ssm_params, eng.ssm_cache, lens0, roots0, n),
        4, 16)
    log(f"draft phase: {per_draft*1e3:.2f} ms")

    # --- verify-only: chain the 25-token tree forward n times ---
    tree = eng.tree
    depths_vec = eng._depths_vec

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_verify(llm_params, llm_cache, lens, n):
        tt = jnp.ones((b, tree), jnp.int32)
        anc = jnp.tril(jnp.ones((tree, tree), bool))[None].repeat(b, 0)

        def body(carry, _):
            tt_c = carry
            logits, _buf = decoder.forward_cached(
                vspec, llm_params, tt_c, llm_cache, lens,
                positions=(lens[:, None] + depths_vec[None]).astype(jnp.int32),
                tree_mask=anc, write_cache=False)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return nxt, (nxt[:, 0],)

        out, _ = jax.lax.scan(body, tt, None, length=n)
        return out

    log("compile verify-only n=4/n=16")
    per_verify = difftime(
        lambda n: run_verify(eng.llm_params, eng.llm_cache, lens0, n), 4, 16)
    log(f"verify phase: {per_verify*1e3:.2f} ms")
    log(f"unaccounted (commit+accept+glue): "
        f"{(per_iter - per_draft - per_verify)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
