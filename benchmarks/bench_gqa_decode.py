"""GQA decode + tree-verify attention benchmark (VERDICT r2 #6).

Measures the Pallas decode-attention kernel against the XLA
split_cached_attention path at the shapes it exists for — grouped-query
models (G = H/KH >= 8: LLaMA-3-70B-class G=8, Falcon-7B MQA G=71) across
long cache lengths — plus a tree-verify-shaped workload (B x ~31-token
tree, the reference's TreeIncMultiHeadSelfAttention,
tree_inc_multihead_self_attention.cu).

Decision rule (printed at the end): enable the Pallas kernel per
(G, S)-regime where it wins by >10%; otherwise the claim is deleted and
XLA stays the production path. Run ON THE CHIP:

    python benchmarks/bench_gqa_decode.py            # all suites
    python benchmarks/bench_gqa_decode.py --suite gqa
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from flexflow_tpu.ops import attention as attn_lib


def _time(fn, q, *rest, reps=5):
    """Differential chained timing: the axon tunnel's per-dispatch cost is
    ms-to-tens-of-ms and VARIABLE, so (t_n2 - t_n1)/(n2 - n1) over two
    chained-scan lengths is the only honest per-op number here (see
    benchmarks/tune_quant_kernel.py)."""
    import functools

    n1, n2 = 8, 40

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(q, rest, n):
        def body(qc, _):
            out = fn(qc, *rest)
            return (qc + out * 1e-6).astype(qc.dtype), ()

        qc, _ = jax.lax.scan(body, q, None, length=n)
        return qc

    t = {}
    for n in (n1, n2):
        jax.block_until_ready(chain(q, rest, n))
        ts = []
        for _ in range(reps):
            a = time.perf_counter()
            jax.block_until_ready(chain(q, rest, n))
            ts.append(time.perf_counter() - a)
        t[n] = min(ts)
    return max((t[n2] - t[n1]) / (n2 - n1), 1e-9)


def bench_gqa_decode():
    from flexflow_tpu.ops.pallas.decode_attention import decode_attention

    print("== GQA decode: Pallas kernel vs XLA split attention ==")
    configs = [
        # (name, B, H, KH, D, S)
        ("mha-12 (160M)", 8, 12, 12, 64, 1024),
        ("gqa-4 (llama3-8B)", 8, 32, 8, 128, 1024),
        ("gqa-8 (llama3-70B)", 8, 64, 8, 128, 1024),
        ("gqa-8 long", 8, 64, 8, 128, 4096),
        ("mqa (falcon-7B)", 8, 71, 1, 64, 2048),
        ("mqa long", 8, 71, 1, 64, 8192),
    ]
    wins = []
    for name, b, h, kh, d, s in configs:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, h, d), jnp.bfloat16)
        ck = jnp.asarray(rng.randn(b, kh, d, s), jnp.bfloat16)
        cv = jnp.asarray(rng.randn(b, kh, d, s), jnp.bfloat16)
        ks = jnp.asarray(rng.randn(b, kh, d), jnp.bfloat16)
        vs = jnp.asarray(rng.randn(b, kh, d), jnp.bfloat16)
        lens = jnp.full((b,), s - 8, jnp.int32)

        xla = jax.jit(lambda q, ck, cv, ks, vs, l: attn_lib.split_cached_attention(
            q[:, None], ck, cv, ks[:, None], vs[:, None], l)[:, 0])
        try:
            t_pal = _time(decode_attention, q, ck, cv, ks, vs, lens)
        except Exception as e:
            print(f"{name}: pallas FAILED ({type(e).__name__}: {e})")
            continue
        t_xla = _time(xla, q, ck, cv, ks, vs, lens)
        # exactness spot check
        o_pal = np.asarray(decode_attention(q, ck, cv, ks, vs, lens),
                           np.float32)
        o_xla = np.asarray(xla(q, ck, cv, ks, vs, lens), np.float32)
        ok = np.allclose(o_pal, o_xla, atol=3e-2)
        speedup = t_xla / t_pal
        bytes_kv = 2 * b * kh * d * s * 2
        print(f"{name}: pallas {t_pal*1e6:.1f}us ({bytes_kv/t_pal/1e9:.0f} "
              f"GB/s) vs xla {t_xla*1e6:.1f}us -> {speedup:.2f}x "
              f"{'WIN' if speedup > 1.1 else 'lose'} (close={ok})")
        if speedup > 1.1 and ok:
            g = h // kh
            wins.append((g, s))
    print(f"pallas-decode winning (G,S) regimes: {wins or 'NONE'}")
    return wins


def bench_tree_verify():
    print("== tree-verify attention (B x 31-token tree) ==")
    # reference defaults W=3 D=8 -> tree 25; W=3 D=10 -> 31; pad to 32
    for b, h, kh, d, s, t in [
        (8, 12, 12, 64, 512, 32),
        (8, 32, 8, 128, 1024, 32),
        (8, 32, 32, 128, 1024, 32),
    ]:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
        ck = jnp.asarray(rng.randn(b, kh, d, s), jnp.bfloat16)
        cv = jnp.asarray(rng.randn(b, kh, d, s), jnp.bfloat16)
        kn = jnp.asarray(rng.randn(b, t, kh, d), jnp.bfloat16)
        vn = jnp.asarray(rng.randn(b, t, kh, d), jnp.bfloat16)
        lens = jnp.full((b,), s - t - 1, jnp.int32)
        anc = jnp.asarray(
            np.tril(np.ones((t, t), bool))[None].repeat(b, 0))

        fn = jax.jit(lambda q, ck, cv, kn, vn, l, m: (
            attn_lib.split_cached_attention(
                q, ck, cv, kn, vn, l, new_mask=m)))
        dt = _time(fn, q, ck, cv, kn, vn, lens, anc)
        bytes_kv = 2 * b * kh * d * s * 2
        flops = 2 * 2 * b * h * t * s * d
        print(f"B={b} H={h} KH={kh} S={s} T={t}: {dt*1e6:.1f}us "
              f"({bytes_kv/dt/1e9:.0f} GB/s KV, {flops/dt/1e12:.2f} TFLOP/s)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", choices=["gqa", "tree", "all"], default="all")
    args = p.parse_args()
    print("devices:", jax.devices(), file=sys.stderr)
    if args.suite in ("gqa", "all"):
        bench_gqa_decode()
    if args.suite in ("tree", "all"):
        bench_tree_verify()


if __name__ == "__main__":
    main()
