"""Unity-lite: automatic parallel-layout search over mesh axes.

TPU-native distillation of the reference's Unity auto-parallelization
(/root/reference/src/runtime/graph.cc:2107 ``graph_optimize_task`` +
substitution.cc:1920 ``GraphSearchHelper::graph_optimize`` — best-first search
over parallelization substitutions costed by ``Simulator::measure_operator_cost``
(real on-device kernel timing, cached) plus machine-model transfer costs).

On TPU the layout space collapses to mesh-axis assignments: (dp, pp, tp)
factorizations of the device count (+ microbatch count for pp). The search:

1. enumerate legal factorizations (divisibility of heads/layers/batch);
2. rank them with an analytic cost model (MXU flops + ICI collective bytes +
   pipeline bubble + HBM capacity filter — the machine-model analog,
   simulator.h:213-380);
3. MEASURE the top candidates by compiling and timing the real train step
   (the ``measure_operator_cost`` philosophy: trust the hardware, cache the
   result), and pick the winner.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax

from flexflow_tpu.specs import ModelSpec


@dataclasses.dataclass(frozen=True)
class Layout:
    data: int
    pipe: int
    model: int
    num_microbatches: int = 1
    # per-op machine-view hybrid (reference Unity's per-op degrees,
    # substitution.cc:1920): attention TP = model, FFN TP = model*data
    # (parallel/sharding.param_shardings(hybrid_ffn=True)). Used by the
    # serving search when attention TP is capped (kv_heads) but devices
    # would otherwise idle.
    hybrid_ffn: bool = False

    def __str__(self):
        h = " ffn-tp=%d" % (self.model * self.data) if self.hybrid_ffn else ""
        return (f"dp={self.data} pp={self.pipe} tp={self.model} "
                f"mb={self.num_microbatches}{h}")


@dataclasses.dataclass
class MachineModel:
    """Analytic machine description (reference SimpleMachineModel analog).

    Attaching a ``topology`` (parallel/topology.TorusTopology) upgrades the
    comm terms from flat-bandwidth estimates to per-axis ring-collective
    costs with DCN spill — the reference's EnhancedMachineModel/network-sim
    tier (simulator.h:280, network.cc)."""

    chip_flops: float = 197e12  # v5e bf16 peak
    hbm_bw: float = 819e9
    ici_bw: float = 4.5e10  # per-link bytes/s (v5e 2D torus, one direction)
    hbm_bytes: float = 16e9
    topology: Optional[object] = None  # parallel.topology.TorusTopology


def enumerate_layouts(
    n_devices: int, spec: ModelSpec, batch_size: int
) -> List[Layout]:
    """Legal (dp, pp, tp) factorizations of the device count."""
    out = []
    for tp in range(1, n_devices + 1):
        if n_devices % tp or spec.num_heads % tp:
            continue
        if spec.num_kv_heads % tp and spec.num_kv_heads > 1:
            continue
        rem = n_devices // tp
        for pp in range(1, rem + 1):
            if rem % pp or spec.num_layers % pp:
                continue
            dp = rem // pp
            if batch_size % dp:
                continue
            mb = pp if pp > 1 else 1
            if pp > 1 and (batch_size // dp) % mb:
                continue
            out.append(Layout(dp, pp, tp, mb))
    return out


def analytic_cost(
    layout: Layout,
    spec: ModelSpec,
    batch_size: int,
    seq_len: int,
    machine: Optional[MachineModel] = None,
    *,
    train: bool = True,
) -> float:
    """Estimated train-step seconds (3x fwd-flops for fwd+bwd);
    ``train=False`` drops the backward factor and sizes the HBM filter for
    bf16 weights only (serving)."""
    m = machine or MachineModel()
    d, f, l, v = (spec.hidden_size, spec.intermediate_size, spec.num_layers,
                  spec.vocab_size)
    tokens = batch_size * seq_len
    # matmul flops per token per layer: qkv+o (4 d^2-ish) + mlp
    mlp_mults = 3 if spec.act == "silu_gate" else 2
    attn_per_tok = l * 2 * (
        d * (spec.num_heads + 2 * spec.num_kv_heads) * spec.head_dim
        + spec.num_heads * spec.head_dim * d
    )
    ffn_per_tok = l * 2 * mlp_mults * d * f + 2 * d * v
    flops_per_tok = attn_per_tok + ffn_per_tok
    bwd = 3 if train else 1
    total_flops = bwd * flops_per_tok * tokens
    if layout.hybrid_ffn:
        # attention on model only (data replicates it); FFN + head on
        # model*data — the per-op-degree hybrid
        compute = bwd * tokens * (
            attn_per_tok / (m.chip_flops * layout.pipe * layout.model)
            + ffn_per_tok / (m.chip_flops * layout.pipe * layout.model
                             * layout.data)
        )
    else:
        compute = total_flops / (
            m.chip_flops * layout.data * layout.pipe * layout.model)

    # TP: 2 allreduces per layer per microbatch pass (activations B*T*D)
    comm = 0.0
    topo = m.topology
    n_params = l * (4 * d * d + mlp_mults * d * f) + v * d
    if topo is not None:
        # per-axis ring collectives over the torus (DCN spill for axes
        # that don't fit) — parallel/topology.TorusTopology
        if layout.model > 1:
            bytes_act = 2 * l * tokens * d * 2 / (layout.data * layout.pipe)
            comm += topo.all_reduce_time(bytes_act, layout.model)
        if layout.data > 1:
            comm += topo.all_reduce_time(2 * n_params * 4, layout.data)
        bubble = 1.0
        if layout.pipe > 1:
            mb = layout.num_microbatches
            bubble = (mb + layout.pipe - 1) / mb
            comm += 2 * (layout.pipe - 1) * topo.ppermute_time(
                tokens * d * 2 / layout.data)
    else:
        # hybrid_ffn: the data axis carries FFN TP, not DP — activations
        # reshard across model*data at the attention/FFN boundary and
        # there is NO gradient allreduce over it
        tp_eff = (layout.model * layout.data if layout.hybrid_ffn
                  else layout.model)
        dp_eff = 1 if layout.hybrid_ffn else layout.data
        if tp_eff > 1:
            bytes_ar = (2 * l * tokens * d * 2 * 2
                        * (tp_eff - 1) / tp_eff)
            comm += bytes_ar / (m.ici_bw * dp_eff * layout.pipe)
        # DP: gradient allreduce of all params
        if dp_eff > 1:
            comm += (2 * n_params * 4
                     * (dp_eff - 1) / dp_eff) / m.ici_bw
        # PP bubble: (P-1)/(M+P-1) of the pipe is idle; plus inter-stage
        # activation hops (fwd + bwd) over ICI
        bubble = 1.0
        if layout.pipe > 1:
            mb = layout.num_microbatches
            bubble = (mb + layout.pipe - 1) / mb
            comm += (
                2 * (layout.pipe - 1) * tokens * d * 2
                / (m.ici_bw * layout.data)
            )

    # HBM capacity filter: params(+grads+adam when training) per device
    shard = layout.model * layout.pipe * (
        layout.data if layout.hybrid_ffn else 1)
    bytes_per_dev = n_params * (16 if train else 2) / shard
    if bytes_per_dev > m.hbm_bytes:
        return float("inf")
    return compute * bubble + comm


def measure_layout(
    step_factory: Callable[[Layout], Callable[[], None]],
    layout: Layout,
    *,
    warmup: int = 1,
    reps: int = 3,
) -> float:
    """Compile + time the real step for a layout (measure_operator_cost)."""
    try:
        step = step_factory(layout)
        for _ in range(warmup):
            step()
        t0 = time.perf_counter()
        for _ in range(reps):
            step()
        return (time.perf_counter() - t0) / reps
    except Exception:
        # a candidate that fails to build OR run (compile error, OOM) is
        # skipped, not fatal to the search (round-3 review)
        return float("inf")


def optimize_layout(
    spec: ModelSpec,
    step_factory: Callable[[Layout], Callable[[], None]],
    *,
    n_devices: Optional[int] = None,
    batch_size: int = 8,
    seq_len: int = 128,
    measure_top_k: int = 3,
    machine: Optional[MachineModel] = None,
) -> Tuple[Layout, List[Dict]]:
    """Pick the fastest layout; returns (best, report).

    ``step_factory(layout)`` must return a zero-arg callable running one real
    (blocking) training/serving step under that layout.
    """
    n = n_devices or len(jax.devices())
    candidates = enumerate_layouts(n, spec, batch_size)
    if not candidates:
        raise ValueError(f"no legal layouts for {n} devices")
    ranked = sorted(
        candidates,
        key=lambda lo: analytic_cost(lo, spec, batch_size, seq_len, machine),
    )
    report = []
    best, best_t = None, float("inf")
    for i, lo in enumerate(ranked):
        # measure the analytic top-k, then keep going until something
        # actually ran (a factory may reject layouts it can't build)
        if i >= measure_top_k and best is not None:
            break
        t = measure_layout(step_factory, lo)
        report.append({
            "layout": str(lo),
            "analytic_s": analytic_cost(lo, spec, batch_size, seq_len, machine),
            "measured_s": t,
        })
        if t < best_t:
            best, best_t = lo, t
    return best, report


def layout_mesh(layout: Layout, n_devices: Optional[int] = None):
    """Build the mesh a Layout describes."""
    from flexflow_tpu.parallel.mesh import make_mesh

    return make_mesh(data=layout.data, pipe=layout.pipe, model=layout.model)


def optimize_train_layout(
    spec: ModelSpec,
    params,
    optimizer,
    *,
    batch_size: int,
    seq_len: int,
    loss: str = "sparse_categorical_crossentropy",
    n_devices: Optional[int] = None,
    measure_top_k: int = 3,
    log_fn: Callable[[str], None] = print,
) -> Tuple[Layout, List[Dict]]:
    """Measured layout search for the Trainer (``Trainer(mesh="auto")``).

    Builds a real Trainer per candidate layout and times one train step on
    synthetic data — the reference runs graph_optimize inside every
    ``FFModel::compile`` (model.cc:3636-3641); here the product entry points
    call this before building their step functions."""
    import numpy as np

    from flexflow_tpu.training.trainer import Trainer

    vocab = spec.vocab_size
    rng = np.random.RandomState(0)
    toks = rng.randint(1, vocab, size=(batch_size, seq_len)).astype(np.int32)
    labels = np.roll(toks, -1, axis=1)

    def step_factory(layout: Layout):
        mesh = layout_mesh(layout)
        tr = Trainer(
            spec, params, optimizer, mesh=mesh,
            pipeline_stages=layout.pipe if layout.pipe > 1 else 1,
            num_microbatches=layout.num_microbatches,
            loss=loss,
        )

        def run():
            tr.train_step(toks, labels)
            jax.block_until_ready(tr.params)

        return run

    best, report = optimize_layout(
        spec, step_factory, n_devices=n_devices, batch_size=batch_size,
        seq_len=seq_len, measure_top_k=measure_top_k,
    )
    log_fn(f"[auto-parallel] chose layout {best} "
           f"(measured {len(report)} candidates)")
    for r in report:
        log_fn(f"[auto-parallel]   {r['layout']}: "
               f"analytic {r['analytic_s']:.4g}s measured "
               f"{r['measured_s']:.4g}s")
    return best, report


def optimize_serving_layout(
    spec: ModelSpec,
    params,
    *,
    batch_size: int,
    max_seq_len: int,
    cache_dtype=None,
    n_devices: Optional[int] = None,
    measure_top_k: int = 2,
    log_fn: Callable[[str], None] = print,
) -> Tuple[Layout, List[Dict]]:
    """Measured serving-layout search (``LLM.compile(auto_parallel=True)``,
    CLI ``-auto-parallelism``): candidates are TPxPP factorizations (serving
    keeps data == 1 like the reference, inference_manager.cc:69), costed
    analytically then timed on a real decode step."""
    import jax.numpy as jnp
    import numpy as np

    n = n_devices or len(jax.devices())
    dtype = cache_dtype if cache_dtype is not None else jnp.bfloat16

    def step_factory(layout: Layout):
        from flexflow_tpu.ops.sampling import SamplingConfig
        from flexflow_tpu.serving.engine import InferenceEngine
        from flexflow_tpu.serving.pp_engine import PipelineInferenceEngine

        mesh = layout_mesh(layout)
        if layout.pipe > 1:
            eng = PipelineInferenceEngine(
                spec, params, mesh=mesh,
                max_requests_per_batch=batch_size, max_seq_len=max_seq_len,
                cache_dtype=dtype,
            )
        else:
            eng = InferenceEngine(
                spec, params, max_requests_per_batch=batch_size,
                max_seq_len=max_seq_len, cache_dtype=dtype,
                mesh=mesh if n > 1 else None,
                hybrid_ffn=layout.hybrid_ffn,
            )
        lens = np.full((batch_size,), 8, np.int32)
        toks = np.ones((batch_size,), np.int32)
        key = jax.random.PRNGKey(0)
        scfg = SamplingConfig.greedy(batch_size)

        def run():
            eng.decode(lens, toks, key, scfg)

        return run

    candidates = [
        lo for lo in enumerate_layouts(n, spec, batch_size) if lo.data == 1
    ]
    # per-op hybrid candidates (Unity per-op degrees): when uniform TP is
    # capped below the device count (kv_heads / head divisibility), the
    # leftover factor shards the FFN only
    for lo in list(candidates):
        if lo.pipe != 1 or lo.model >= n:
            continue
        rem = n // lo.model
        if rem > 1 and spec.intermediate_size % (lo.model * rem) == 0:
            candidates.append(Layout(rem, 1, lo.model, hybrid_ffn=True))
    if not candidates:
        raise ValueError(f"no legal serving layouts for {n} devices")
    ranked = sorted(
        candidates,
        key=lambda lo: analytic_cost(lo, spec, batch_size, max_seq_len,
                                     train=False),
    )
    report, best, best_t = [], None, float("inf")
    for i, lo in enumerate(ranked):
        if i >= measure_top_k and best is not None:
            break
        t = measure_layout(step_factory, lo)
        report.append({
            "layout": str(lo),
            "analytic_s": analytic_cost(lo, spec, batch_size, max_seq_len,
                                        train=False),
            "measured_s": t,
        })
        if t < best_t and t != float("inf"):
            best, best_t = lo, t
    if best is None:
        # every measured candidate failed: fall back to single device so
        # compile() degrades instead of crashing (round-3 review)
        best = Layout(1, 1, 1)
        log_fn("[auto-parallel] all measured candidates failed; falling "
               "back to single-device layout")
    log_fn(f"[auto-parallel] serving layout {best} "
           f"(measured {len(report)} candidates)")
    return best, report


# ---------------------------------------------------------------------------
# per-op cost cache + simulated runtime (reference Simulator analog)
# ---------------------------------------------------------------------------


class OpCostCache:
    """Measured per-op cost cache (reference ``measure_operator_cost``,
    include/flexflow/simulator.h:690-780: each op's kernels are timed
    on-device once and memoized by an op+config hash).

    Keys are hashable op descriptors (kind, shapes, dtype, degree); values
    are measured seconds. ``measure`` compiles+times a thunk on first use.
    """

    def __init__(self):
        self._cache: Dict[tuple, float] = {}

    def __len__(self):
        return len(self._cache)

    def measure(self, key: tuple, thunk: Callable[[], None],
                *, warmup: int = 1, reps: int = 3) -> float:
        if key in self._cache:
            return self._cache[key]
        try:
            for _ in range(warmup):
                thunk()
            t0 = time.perf_counter()
            for _ in range(reps):
                thunk()
            t = (time.perf_counter() - t0) / reps
        except Exception:
            t = float("inf")
        self._cache[key] = t
        return t

    def get(self, key: tuple) -> Optional[float]:
        return self._cache.get(key)


def _op_descriptors(spec: ModelSpec, layout: Layout, batch_size: int,
                    seq_len: int) -> List[tuple]:
    """Per-layer op list under a layout (shapes AFTER sharding): the unit of
    the reference's per-op cost accounting."""
    d = spec.hidden_size
    f = spec.intermediate_size // layout.model
    h = spec.num_heads // layout.model if spec.num_heads % layout.model == 0 \
        else spec.num_heads
    rows = batch_size // layout.data * seq_len
    mlp_mults = 3 if spec.act == "silu_gate" else 2
    ops = [
        ("matmul", rows, d, h * spec.head_dim),                # qkv (q part)
        ("matmul", rows, d, 2 * (spec.num_kv_heads * spec.head_dim
                                 // max(1, layout.model))),    # kv
        ("matmul", rows, h * spec.head_dim, d),                # o proj
        ("attn", rows // max(seq_len, 1), h, seq_len, spec.head_dim),
        ("matmul", rows, d, mlp_mults * f),                    # up/gate
        ("matmul", rows, f, d),                                # down
    ]
    return ops


def simulate_runtime(
    spec: ModelSpec,
    layout: Layout,
    batch_size: int,
    seq_len: int,
    cache: OpCostCache,
    *,
    machine: Optional[MachineModel] = None,
    train: bool = True,
) -> float:
    """Per-op-measured step estimate (reference ``simulate_runtime``,
    simulator.h:706-727: task-graph simulation over measured op costs +
    machine-model transfer costs; on TPU the graph is a per-layer chain, so
    the critical path is the sum of measured op costs x layers x fwd/bwd
    factor, plus the analytic collective terms).
    """
    import jax.numpy as jnp

    m = machine or MachineModel()
    total = 0.0
    for desc in _op_descriptors(spec, layout, batch_size, seq_len):
        if desc[0] == "matmul":
            _, rows, k, n = desc
            if min(rows, k, n) <= 0:
                continue

            def thunk(rows=rows, k=k, n=n):
                a = jnp.ones((rows, k), jnp.bfloat16)
                b = jnp.ones((k, n), jnp.bfloat16)
                jax.block_until_ready(jax.jit(
                    lambda a, b: a @ b)(a, b))

            total += cache.measure(desc, thunk)
        elif desc[0] == "attn":
            _, b, h, s, dh = desc
            if min(b, h, s, dh) <= 0:
                continue

            def thunk(b=b, h=h, s=s, dh=dh):
                q = jnp.ones((max(b, 1), h, s, dh), jnp.bfloat16)

                def attn(q):
                    sc = jnp.einsum("bhqd,bhkd->bhqk", q, q)
                    return jnp.einsum(
                        "bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1), q)

                jax.block_until_ready(jax.jit(attn)(q))

            total += cache.measure(desc, thunk)
    total *= spec.num_layers // layout.pipe  # per-stage layer count
    if train:
        total *= 3.0  # fwd + ~2x bwd (reference's fwd/bwd kernel pairing)
    # collective + bubble terms from the analytic machine model
    comm_only = analytic_cost(layout, spec, batch_size, seq_len, m)
    flops_only = analytic_cost(
        layout, spec, batch_size, seq_len,
        MachineModel(chip_flops=m.chip_flops, ici_bw=float("inf"),
                     hbm_bw=m.hbm_bw, hbm_bytes=m.hbm_bytes),
    )
    comm = max(comm_only - flops_only, 0.0)
    bubble = 1.0
    if layout.pipe > 1:
        mb = layout.num_microbatches
        bubble = (mb + layout.pipe - 1) / mb
    return total * bubble + comm


# ---------------------------------------------------------------------------
# memory-constrained search (reference graph.cc:2126-2221)
# ---------------------------------------------------------------------------


def estimate_memory(
    layout: Layout, spec: ModelSpec, batch_size: int, seq_len: int,
    *, train: bool = True,
) -> float:
    """Per-device bytes under a layout: params (+grads+Adam moments when
    training) + activation working set (with pipeline microbatching)."""
    d, f, l, v = (spec.hidden_size, spec.intermediate_size, spec.num_layers,
                  spec.vocab_size)
    mlp_mults = 3 if spec.act == "silu_gate" else 2
    n_params = l * (
        d * (spec.num_heads + 2 * spec.num_kv_heads) * spec.head_dim
        + spec.num_heads * spec.head_dim * d + mlp_mults * d * f
    ) + v * d
    shard = layout.model * layout.pipe
    state_mult = 16 if train else 2  # bf16 params + f32 grads/moments
    param_bytes = n_params * state_mult / shard
    rows = batch_size // layout.data * seq_len
    if layout.pipe > 1:
        rows //= layout.num_microbatches
    act_bytes = rows * d * 2 * (l // layout.pipe) * (4 if train else 1)
    return param_bytes + act_bytes


def memory_constrained_search(
    spec: ModelSpec,
    *,
    n_devices: int,
    batch_size: int,
    seq_len: int,
    memory_budget_bytes: float,
    machine: Optional[MachineModel] = None,
    train: bool = True,
    iters: int = 16,
) -> Tuple[Optional[Layout], List[Dict]]:
    """Best layout whose per-device memory fits the budget.

    Reference: the memory-constrained Unity search binary-searches a
    Lagrange multiplier ``lambda`` on the combined objective
    ``run_time + lambda * memory`` until the optimum satisfies the budget
    (graph.cc:2126-2221). The same loop here over the layout enumeration:
    lambda rises while the optimum is over budget, falls otherwise — the
    returned layout is the fastest one meeting the constraint (None if no
    layout fits).
    """
    candidates = enumerate_layouts(n_devices, spec, batch_size)
    if not candidates:
        return None, []
    mems = {lo: estimate_memory(lo, spec, batch_size, seq_len, train=train)
            for lo in candidates}
    runts = {lo: analytic_cost(lo, spec, batch_size, seq_len, machine)
             for lo in candidates}
    report = [
        {"layout": str(lo), "analytic_s": runts[lo], "mem_gb": mems[lo] / 1e9}
        for lo in candidates
    ]
    feasible = [lo for lo in candidates if mems[lo] <= memory_budget_bytes]
    if not feasible:
        return None, report
    lam_lo, lam_hi = 0.0, 1.0
    # grow lambda until the combined optimum is feasible
    for _ in range(iters):
        best = min(candidates, key=lambda lo: runts[lo] + lam_hi * mems[lo])
        if mems[best] <= memory_budget_bytes:
            break
        lam_hi *= 8.0
    # binary search the threshold lambda (reference's bisection)
    for _ in range(iters):
        lam = 0.5 * (lam_lo + lam_hi)
        best = min(candidates, key=lambda lo: runts[lo] + lam * mems[lo])
        if mems[best] <= memory_budget_bytes:
            lam_hi = lam
        else:
            lam_lo = lam
    best = min(candidates, key=lambda lo: runts[lo] + lam_hi * mems[lo])
    if mems[best] > memory_budget_bytes:
        best = min(feasible, key=lambda lo: runts[lo])
    return best, report
