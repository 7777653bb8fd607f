"""Round-4 probe #5: decompose the 51 ms 7B INT4 decode step.

Differential horizon timing (fixed dispatch cost cancelled) of step
variants, each an n-chained scan at the engine's shapes (B=8, S=512):

  full      — the real engine decode_n body (staging + extra_kv + commit)
  nostage   — forward_cached per step, write_cache=True (window commit per
              step, no staging buffers / extra_kv)
  noattn    — custom layer loop: all 7 matmuls + norms + rope, attention
              output = q (no cache read, no softmax)
  nounembed — noattn minus the lm_head/argmax (fixed token feed)

    python -u benchmarks/probe_r4_declayers.py --bits 4
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
    print(f"[p5 +{time.time()-t0:7.1f}s] {msg}", flush=True)


def difftime(fn, n1, n2, iters=5):
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
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    args = ap.parse_args()

    import bench_spec
    from benchmarks.spec_pair import fast_quantized_verifier
    from flexflow_tpu.models import decoder, params as params_lib
    from flexflow_tpu.models.decoder import KVCache, _mlp, _norm, _qkv, _unembed
    from flexflow_tpu.ops import rotary
    from flexflow_tpu.serving import InferenceEngine
    from flexflow_tpu.ops.sampling import SamplingConfig

    dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
    b, s = args.batch, args.seq
    log(f"devices {jax.devices()}; build INT{args.bits}")
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
    vq = fast_quantized_verifier(dspec, dparams, vspec, args.bits)
    cache = decoder.init_kv_cache(vspec, b, s, jnp.bfloat16)
    lens = jnp.full((b,), 32, jnp.int32)
    toks = jnp.arange(1, b + 1, dtype=jnp.int32)

    # --- full: the engine horizon program ---
    eng = InferenceEngine(vspec, vq, max_requests_per_batch=b, max_seq_len=s)
    scfg = jax.tree.map(jnp.asarray, SamplingConfig.greedy(b))
    key = jax.random.PRNGKey(0)

    def run_full(n):
        out, eng.cache = eng._decode_n(
            eng.params, eng.cache, lens, toks, key, scfg, n,
            greedy_only=True)
        return out

    # --- nostage: plain forward_cached per step (window commit per step) ---
    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def run_nostage_fn(params, cache, lens, toks, n):
        def body(carry, _):
            cache, tk = carry
            logits, cache = decoder.forward_cached(
                vspec, params, tk[:, None], cache, lens)
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (cache, nxt), nxt

        (cache, _), out = jax.lax.scan(body, (cache, toks), None, length=n)
        return out, cache

    state = {"cache": cache}

    def run_nostage(n):
        out, state["cache"] = run_nostage_fn(
            vq, state["cache"], lens, toks, n)
        return out

    # --- noattn / nounembed: custom layer loop, no cache at all ---
    @functools.partial(jax.jit, static_argnames=("n", "unembed"))
    def run_noattn_fn(params, lens, toks, n, unembed=True):
        def step(tk, i):
            positions = (lens + i)[:, None]
            h = jnp.take(params["embed_tokens"], tk[:, None], axis=0)

            def body(h, sl):
                ln1 = _norm(vspec, h, sl["ln1_scale"], None)
                q, k, v = _qkv(vspec, sl, ln1)
                cos, sin = rotary.rope_cos_sin(
                    positions, vspec.head_dim, vspec.rope_theta, None)
                q = rotary.apply_rope(q, cos, sin)
                k = rotary.apply_rope(k, cos, sin)
                a = q + k + v  # attention stand-in
                out = jnp.einsum(
                    "bthd,hdo->bto", a,
                    decoder.as_array(sl["wo"]).reshape(
                        vspec.num_heads, vspec.head_dim, -1))
                h = h + out.astype(h.dtype)
                ln2 = _norm(vspec, h, sl["ln2_scale"], None)
                return h + _mlp(vspec, sl, ln2), ()

            h, _ = jax.lax.scan(body, h, params["layers"])
            if unembed:
                logits = _unembed(vspec, params, h)
                return jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return tk + h[:, 0, :1].astype(jnp.int32)[:, 0] * 0

        def body(tk, i):
            return step(tk, i), ()

        out, _ = jax.lax.scan(body, toks, jnp.arange(n, dtype=jnp.int32))
        return out

    wbytes = {4: 3.45e9, 8: 6.9e9}[args.bits]
    floor = (wbytes + 2.1e9) / 819e9
    for name, fn in [
        ("full", run_full),
        ("nostage", run_nostage),
        ("noattn", lambda n: run_noattn_fn(vq, lens, toks, n)),
        ("nounembed", lambda n: run_noattn_fn(vq, lens, toks, n,
                                              unembed=False)),
    ]:
        log(f"compile {name}")
        per = difftime(fn, 8, 32)
        log(f"{name}: {per*1e3:.2f} ms/step (floor incl cache "
            f"{floor*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
