import time, functools
import numpy as np
import jax, jax.numpy as jnp
from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib, decoder
from flexflow_tpu.models.decoder import KVCache

spec = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=32000, hidden_size=768,
    num_layers=12, num_heads=12, num_kv_heads=12, head_dim=64,
    intermediate_size=3072, max_position_embeddings=2048, norm_eps=1e-6,
)
params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
B, S = 128, 512
cache = decoder.init_kv_cache(spec, B, S, jnp.bfloat16)
lens = jnp.full((B,), 100, jnp.int32)
toks = jnp.ones((B, 1), jnp.int32)

@functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("write",))
def step(params, cache, toks, lens, write):
    out = decoder.forward_cached(spec, params, toks, cache, lens, write_cache=write)
    if write:
        logits, cache2 = out
        return logits[:, 0, :8], cache2
    logits, kv = out
    return logits[:, 0, :8], kv

def bench(write, cache):
    r, aux = step(params, cache, toks, lens, write)
    np.asarray(jax.device_get(r))
    if write: cache = aux
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        r, aux = step(params, cache, toks, lens, write)
        if write: cache = aux
    np.asarray(jax.device_get(r))
    return (time.perf_counter() - t0) / n, cache

dt, cache = bench(True, cache)
print(f"write_cache=True : {dt*1e3:.2f} ms/step")
dt, _ = bench(False, cache)
print(f"write_cache=False: {dt*1e3:.2f} ms/step")
