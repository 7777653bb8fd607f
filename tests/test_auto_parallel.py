"""Unity-lite auto-parallelization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.parallel import make_mesh
from flexflow_tpu.parallel.auto import (
    Layout,
    analytic_cost,
    enumerate_layouts,
    optimize_layout,
)
from flexflow_tpu.training import SGDOptimizer, Trainer

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=64,
    hidden_size=32,
    num_layers=4,
    num_heads=4,
    num_kv_heads=4,
    head_dim=8,
    intermediate_size=64,
    max_position_embeddings=64,
    norm_eps=1e-6,
)


def test_enumerate_respects_divisibility():
    layouts = enumerate_layouts(8, TINY, batch_size=8)
    assert Layout(8, 1, 1) in layouts
    assert Layout(2, 2, 2, 2) in layouts
    for lo in layouts:
        assert lo.data * lo.pipe * lo.model == 8
        assert TINY.num_heads % lo.model == 0
        assert TINY.num_layers % lo.pipe == 0
        assert 8 % lo.data == 0


def test_analytic_cost_orders_sanely():
    big = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=32000, hidden_size=4096,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
        intermediate_size=11008, max_position_embeddings=2048,
    )
    # a 7B model cannot fit training state on one v5e chip -> dp=8 infeasible
    assert analytic_cost(Layout(8, 1, 1), big, 8, 512) == float("inf")
    # tp=8 shards the state and must be feasible
    assert analytic_cost(Layout(1, 1, 8), big, 8, 512) < float("inf")


def test_optimize_layout_measured():
    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    toks = rng.randint(0, TINY.vocab_size, size=(8, 16)).astype(np.int32)
    labels = np.roll(toks, -1, axis=1)

    def step_factory(layout):
        mesh = make_mesh(data=layout.data, pipe=layout.pipe, model=layout.model)
        tr = Trainer(TINY, params, SGDOptimizer(lr=0.01), mesh=mesh,
                     pipeline_stages=layout.pipe,
                     num_microbatches=layout.num_microbatches)

        def step():
            tr.train_step(toks, labels)

        return step

    best, report = optimize_layout(
        TINY, step_factory, n_devices=8, batch_size=8, seq_len=16,
        measure_top_k=3,
    )
    assert best is not None and best.data * best.pipe * best.model == 8
    assert len(report) >= 3
    measured = [r["measured_s"] for r in report if r["measured_s"] < 1e9]
    assert measured, report


def test_op_cost_cache_and_simulate_runtime():
    """Reference Simulator analog: per-op measured costs cached by
    op+config hash (simulator.h:750) feeding a step-time estimate
    (simulate_runtime, simulator.h:706-727)."""
    from flexflow_tpu.parallel.auto import (
        Layout, OpCostCache, simulate_runtime,
    )

    cache = OpCostCache()
    t1 = simulate_runtime(TINY, Layout(1, 1, 1), 4, 32, cache)
    n_after_first = len(cache)
    assert t1 > 0 and n_after_first > 0
    # second call: every op hits the cache (no growth)
    t2 = simulate_runtime(TINY, Layout(1, 1, 1), 4, 32, cache)
    assert len(cache) == n_after_first
    assert t2 == t1  # fully cached -> deterministic
    # a TP layout adds new (sharded-shape) entries
    simulate_runtime(TINY, Layout(1, 1, 2), 4, 32, cache)
    assert len(cache) > n_after_first


def test_memory_constrained_search():
    """Reference graph.cc:2126-2221: lambda bisection picks the fastest
    layout under a per-device memory budget."""
    from flexflow_tpu.parallel.auto import (
        estimate_memory, memory_constrained_search,
    )

    # generous budget: unconstrained optimum
    best, report = memory_constrained_search(
        TINY, n_devices=8, batch_size=8, seq_len=32,
        memory_budget_bytes=1e15,
    )
    assert best is not None
    # tight budget: forces a model/pipe-sharded layout (more weight sharding)
    mem_unsharded = estimate_memory(best, TINY, 8, 32)
    tight = mem_unsharded * 0.5
    best2, _ = memory_constrained_search(
        TINY, n_devices=8, batch_size=8, seq_len=32,
        memory_budget_bytes=tight,
    )
    if best2 is not None:
        assert estimate_memory(best2, TINY, 8, 32) <= tight
    # impossible budget: None
    none, _ = memory_constrained_search(
        TINY, n_devices=8, batch_size=8, seq_len=32, memory_budget_bytes=1.0,
    )
    assert none is None
