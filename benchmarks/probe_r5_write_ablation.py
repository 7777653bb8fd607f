"""Round-5 lab note: spec staging write-cost ablation (results recorded).

Measured on chip 2026-08-22 (7B INT4 verifier, w2d6, B=8, w256):
  mode0 dv+walk (read-only staging) : 17.02 ms/iter
  mode1 +ssm block-resident writes  : 17.12 (+0.10)
  mode2 +llm tree-block DUS         : 18.89 (+1.77)  <-- the carry rewrite
  mode3 +valid/pos bookkeeping      : 19.11 (+0.22)

Conclusion: the single 218 MB dynamic-update of the verifier tree block
into the carried [L,B,104,KH,D] staging buffers costs ~1.8 ms — about one
full write of the 875 MB x2 carry pair, i.e. XLA rewrites a scan carry
that the body also reads instead of updating in place. Fix candidates in
ROADMAP #1 (untiled-S cache relayout). See TPU_STATUS_r05.md.
"""
import sys, time, gc, functools
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
t0 = time.time()
def log(m): print(f"[writes +{time.time()-t0:6.1f}s] {m}", flush=True)
import bench_spec
from benchmarks.spec_pair import fast_quantized_verifier
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.models.decoder import KVCache
from flexflow_tpu.serving.speculative import (
    SpecEngine, make_depths_vec, greedy_accept_walk)
gc.disable()
dspec, vspec = bench_spec.DRAFT_7B, bench_spec.VERIFIER_7B
dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0), jnp.bfloat16)
v4 = fast_quantized_verifier(dspec, dparams, vspec, 4)
gc.collect()
log("verifier built")
w, d, batch, max_seq, window = 2, 6, 8, 512, 256
tree = 1 + w*d
eng = SpecEngine(vspec, v4, dspec, dparams, beam_width=w, beam_depth=d,
                 max_requests_per_batch=batch, max_seq_len=max_seq)
lens = jnp.full((batch,), 56, jnp.int32)
roots0 = jnp.arange(1, batch+1, dtype=jnp.int32)
dp, vlr = eng._draft_phase_core, eng._verify_logits_reg
dv = make_depths_vec(w, d)
llm_read = KVCache(k=eng.llm_cache.k[..., :window], v=eng.llm_cache.v[..., :window])
ssm_read = KVCache(k=eng.ssm_cache.k[..., :window], v=eng.ssm_cache.v[..., :window])
cap = 8 * tree
L, KH, DH = vspec.num_layers, vspec.num_kv_heads, vspec.head_dim
SL, SKH, SDH = dspec.num_layers, dspec.num_kv_heads, dspec.head_dim

@functools.partial(jax.jit, static_argnames=("n", "mode"))
def run(lp, sp, roots, n, mode):
    r_lk = jnp.zeros((L, batch, cap, KH, DH), jnp.bfloat16)
    r_lv = jnp.zeros_like(r_lk)
    r_sk = jnp.zeros((SL, batch, cap, SKH, SDH), jnp.bfloat16)
    r_sv = jnp.zeros_like(r_sk)
    valid0 = jnp.zeros((batch, cap), bool)
    pos0 = jnp.zeros((batch, cap), jnp.int32)
    counts0 = jnp.zeros((batch,), jnp.int32)
    def body(carry, i):
        r_lk, r_lv, r_sk, r_sv, valid, pos, counts, r = carry
        col = i * tree
        tt, tp, anc, st = dp(sp, ssm_read, lens, r,
                             staged=(r_sk, r_sv, valid, pos), blk=col)
        if mode >= 1:  # ssm writes land (block-resident)
            r_sk, r_sv = st
        logits, lbuf = vlr(lp, llm_read, lens, tt,
                           jnp.broadcast_to(dv[None], (batch, tree)), anc,
                           staged=(r_lk, r_lv, valid, pos))
        produced, n_acc, fs = greedy_accept_walk(logits.argmax(-1).astype(jnp.int32), tt, tp, d)
        nxt = jnp.take_along_axis(produced, (n_acc-1)[:, None], axis=1)[:, 0]
        if mode >= 2:  # llm DUS
            r_lk = jax.lax.dynamic_update_slice(r_lk, lbuf[0].astype(jnp.bfloat16), (0,0,col,0,0))
            r_lv = jax.lax.dynamic_update_slice(r_lv, lbuf[1].astype(jnp.bfloat16), (0,0,col,0,0))
        if mode >= 3:  # valid/pos bookkeeping
            pidx = jnp.arange(d+1, dtype=jnp.int32)
            path = fs[:, :d+1]
            oh = (path[:, :, None] == jnp.arange(tree, dtype=jnp.int32)[None,None,:])
            oh = oh & (pidx[None,:,None] < n_acc[:,None,None])
            vb = jnp.any(oh, axis=1)
            kof = jnp.argmax(oh, axis=1).astype(jnp.int32)
            pb = lens[:, None] + counts[:, None] + kof
            valid = jax.lax.dynamic_update_slice(valid, vb, (0, col))
            pos = jax.lax.dynamic_update_slice(pos, pb, (0, col))
            counts = counts + n_acc
        return (r_lk, r_lv, r_sk, r_sv, valid, pos, counts, nxt), produced[:, 0]
    carry0 = (r_lk, r_lv, r_sk, r_sv, valid0, pos0, counts0, roots)
    (_, _, _, _, _, _, _, _), out = jax.lax.scan(body, carry0, jnp.arange(n), length=n)
    return out

def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        a = time.perf_counter(); np.asarray(fn()); best = min(best, time.perf_counter()-a)
    return best
names = {0: "dv+walk (no writes)", 1: "+ssm block writes", 2: "+llm DUS", 3: "+bookkeeping"}
for mode in (0, 1, 2, 3):
    for n in (2, 6):
        np.asarray(run(eng.llm_params, eng.ssm_params, roots0, n, mode))
    t1 = timed(lambda: run(eng.llm_params, eng.ssm_params, roots0, 2, mode))
    t2 = timed(lambda: run(eng.llm_params, eng.ssm_params, roots0, 6, mode))
    log(f"mode{mode} {names[mode]:24s}: {(t2-t1)/4*1e3:6.2f} ms/iter (t2={t1*1e3:.0f} t6={t2*1e3:.0f})")
