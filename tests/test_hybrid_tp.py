"""Per-op hybrid TP (Unity per-op machine views, substitution.cc:1920).

``hybrid_ffn``: attention shards over "model", the FFN over
("model","data") — the GSPMD expression of different TP degrees per op.
The win case: small-batch serving where attention TP is capped by kv_heads
(GQA/MQA) but devices would otherwise idle.

The CI box has 2 cores under 8 virtual devices, so wall-clock cannot show
the win; the tests assert the three decidable properties instead:
exactness, per-device compiled FLOPs (the quantity wall-clock follows on
real chips), and the search ranking.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.parallel import make_mesh
from flexflow_tpu.parallel.auto import Layout, analytic_cost
from flexflow_tpu.parallel.sharding import kv_cache_sharding, param_shardings
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager

# GQA spec with attention TP capped at 2 (kv_heads=2) and a fat FFN
SPEC = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=256, hidden_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, intermediate_size=1024,
    max_position_embeddings=128, norm_eps=1e-6,
)


def test_hybrid_ffn_outputs_match_single_device():
    params = params_lib.init_params(SPEC, jax.random.PRNGKey(0), jnp.float32)
    prompts = [[5, 6, 7, 8]]
    cfg = GenerationConfig(max_new_tokens=10)

    base = InferenceEngine(SPEC, params, max_requests_per_batch=1,
                           max_seq_len=64, cache_dtype=jnp.float32)
    want = [r.output_tokens
            for r in RequestManager(base).generate(prompts, cfg)]

    mesh = make_mesh(data=2, model=2)
    hyb = InferenceEngine(SPEC, params, max_requests_per_batch=1,
                          max_seq_len=64, cache_dtype=jnp.float32,
                          mesh=mesh, hybrid_ffn=True)
    got = [r.output_tokens
           for r in RequestManager(hyb).generate(prompts, cfg)]
    assert got == want


def _per_device_flops(hybrid: bool):
    mesh = make_mesh(data=2, model=2)
    params = jax.eval_shape(
        lambda k: params_lib.init_params(SPEC, k, jnp.float32),
        jax.random.PRNGKey(0))
    sh = param_shardings(SPEC, params, mesh, hybrid_ffn=hybrid)
    cache = jax.eval_shape(
        lambda: decoder.init_kv_cache(SPEC, 1, 64, jnp.float32))
    cshard = kv_cache_sharding(mesh, cache)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def step(p, ck, cv, lens, toks):
        logits, c2 = decoder.forward_cached(
            SPEC, p, toks[:, None], decoder.KVCache(ck, cv), lens)
        return jnp.argmax(logits[:, 0], -1), c2.k, c2.v

    compiled = jax.jit(
        step, in_shardings=(sh, cshard, cshard, repl, repl),
    ).lower(
        params, cache.k, cache.v,
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    ).compile()
    return compiled.cost_analysis()["flops"]


def test_hybrid_ffn_cuts_per_device_flops():
    """The SPMD per-device program must carry ~half the FFN FLOPs under the
    hybrid (FFN TP 4 vs 2) — the quantity wall-clock tracks on real chips
    (wall-clock itself is unmeasurable on this 2-core CI box)."""
    uni = _per_device_flops(hybrid=False)
    hyb = _per_device_flops(hybrid=True)
    # FFN dominates this spec (f=8d): expect ~0.55-0.7x, assert < 0.8x
    assert hyb < 0.8 * uni, (hyb, uni)


def test_search_ranks_hybrid_above_capped_uniform():
    """With attention TP capped at kv_heads=2 on 4 devices and batch 1
    (DP useless), the analytic cost must rank the hybrid layout above
    every uniform candidate — the per-op search axis the reference's
    graph_optimize explores."""
    from flexflow_tpu.parallel.auto import enumerate_layouts

    # 7B-class spec at production scale (the toy SPEC is comm-dominated at
    # batch 1, where the model correctly prefers tp=1): attention TP capped
    # at kv_heads=2 on 4 devices, so no uniform layout fills the machine
    big = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=32000, hidden_size=4096,
        num_layers=32, num_heads=32, num_kv_heads=2, head_dim=128,
        intermediate_size=11008, max_position_embeddings=2048,
        norm_eps=1e-6,
    )
    uniforms = []
    for n in (1, 2, 4):
        uniforms += [lo for lo in enumerate_layouts(n, big, 1)
                     if lo.data == 1]
    assert uniforms and max(lo.model for lo in uniforms) == 2  # cap holds
    hybrid = Layout(2, 1, 2, hybrid_ffn=True)
    best_uniform = min(
        analytic_cost(lo, big, 1, 512, train=False) for lo in uniforms)
    assert analytic_cost(hybrid, big, 1, 512, train=False) < best_uniform
