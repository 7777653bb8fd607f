"""Round-5 lab note: commit_kv_windows formulation test (results recorded).

Measured on chip 2026-08-22 on the 7B cache pair (2.14 GB, T=56 windows):
  where-of-materialized-einsum (shipping): 44.9 ms
  add-form (shifted + masked old, fusion-friendly): 44.3 ms, bitwise equal

Conclusion: no XLA fusion win available by reformulating; the one-hot
shift commit runs ~4x its 2x-traffic model regardless (layout transposes
around the [b,ts] dot). Kernel-level rewrite stays in ROADMAP #3.
"""
import sys, time, functools
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
t0 = time.time()
def log(m): print(f"[commit +{time.time()-t0:6.1f}s] {m}", flush=True)
L, B, KH, D, S, T = 32, 8, 32, 128, 512, 56
key = jax.random.PRNGKey(0)
ck = jax.random.normal(key, (L,B,KH,D,S), jnp.bfloat16)
cv = jax.random.normal(key, (L,B,KH,D,S), jnp.bfloat16)
uk = jax.random.normal(key, (L,B,KH,D,T), jnp.bfloat16)
uv = jax.random.normal(key, (L,B,KH,D,T), jnp.bfloat16)
starts = jnp.arange(40, 40+B, dtype=jnp.int32)

def commit_where(ck, cv, uk, uv, starts):
    pos = jnp.arange(S, dtype=jnp.int32)[None,None,:]
    onehot = pos == (starts[:,None] + jnp.arange(T)[None,:])[:,:,None]
    covered = jnp.any(onehot, axis=1)
    oh = onehot.astype(uk.dtype)
    sk = jnp.einsum("lbkdt,bts->lbkds", uk, oh, preferred_element_type=uk.dtype)
    sv = jnp.einsum("lbkdt,bts->lbkds", uv, oh, preferred_element_type=uv.dtype)
    cm = covered[None,:,None,None,:]
    return jnp.where(cm, sk, ck), jnp.where(cm, sv, cv)

def commit_add(ck, cv, uk, uv, starts):
    pos = jnp.arange(S, dtype=jnp.int32)[None,None,:]
    onehot = pos == (starts[:,None] + jnp.arange(T)[None,:])[:,:,None]
    covered = jnp.any(onehot, axis=1)
    oh = onehot.astype(uk.dtype)
    sk = jnp.einsum("lbkdt,bts->lbkds", uk, oh, preferred_element_type=uk.dtype)
    sv = jnp.einsum("lbkdt,bts->lbkds", uv, oh, preferred_element_type=uv.dtype)
    cm = covered[None,:,None,None,:]
    # shifted is exactly 0 outside covered; add-form fuses into the dot
    return sk + jnp.where(cm, jnp.zeros((), ck.dtype), ck), \
           sv + jnp.where(cm, jnp.zeros((), cv.dtype), cv)

# correctness check on CPU-sized slice done implicitly: compare on chip
f_where = jax.jit(commit_where, donate_argnums=(0,1))
f_add = jax.jit(commit_add, donate_argnums=(0,1))
a = commit_where(ck, cv, uk, uv, starts)
b = commit_add(ck, cv, uk, uv, starts)
same = bool(jnp.all(a[0] == b[0]) & jnp.all(a[1] == b[1]))
log(f"bitwise equal: {same}")
def timed(fn, reps=4):
    best = float("inf")
    for _ in range(reps):
        c1 = jnp.array(ck); c2 = jnp.array(cv)
        np.asarray(jnp.sum(c1[0,0,0,0]))  # materialize copies
        t1 = time.perf_counter()
        o = fn(c1, c2, uk, uv, starts)
        np.asarray(jnp.sum(o[0][0,0,0,0]) + jnp.sum(o[1][0,0,0,0]))
        best = min(best, time.perf_counter()-t1)
    return best
for name, fn in (("where", f_where), ("add", f_add)):
    t = timed(fn)
    log(f"{name}: {t*1e3:7.1f} ms (donated; 2.14 GB cache pair)")
