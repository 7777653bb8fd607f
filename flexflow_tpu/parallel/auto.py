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

    def __str__(self):
        return (f"dp={self.data} pp={self.pipe} tp={self.model} "
                f"mb={self.num_microbatches}")


@dataclasses.dataclass
class MachineModel:
    """Analytic machine description (reference SimpleMachineModel analog)."""

    chip_flops: float = 197e12  # v5e bf16 peak
    hbm_bw: float = 819e9
    ici_bw: float = 4.5e10  # per-link bytes/s (v5e 2D torus, one direction)
    hbm_bytes: float = 16e9


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
) -> float:
    """Estimated train-step seconds (3x fwd-flops for fwd+bwd)."""
    m = machine or MachineModel()
    d, f, l, v = (spec.hidden_size, spec.intermediate_size, spec.num_layers,
                  spec.vocab_size)
    tokens = batch_size * seq_len
    # matmul flops per token per layer: qkv+o (4 d^2-ish) + mlp
    mlp_mults = 3 if spec.act == "silu_gate" else 2
    flops_per_tok = l * 2 * (
        d * (spec.num_heads + 2 * spec.num_kv_heads) * spec.head_dim
        + spec.num_heads * spec.head_dim * d
        + mlp_mults * d * f
    ) + 2 * d * v
    total_flops = 3 * flops_per_tok * tokens
    compute = total_flops / (m.chip_flops * layout.data * layout.pipe * layout.model)

    # TP: 2 allreduces per layer per microbatch pass (activations B*T*D)
    comm = 0.0
    if layout.model > 1:
        bytes_ar = 2 * l * tokens * d * 2 * 2 * (layout.model - 1) / layout.model
        comm += bytes_ar / (m.ici_bw * layout.data * layout.pipe)
    # DP: gradient allreduce of all params
    n_params = l * (4 * d * d + mlp_mults * d * f) + v * d
    if layout.data > 1:
        comm += (2 * n_params * 4 * (layout.data - 1) / layout.data) / m.ici_bw
    # PP bubble: (P-1)/(M+P-1) of the pipe is idle; plus inter-stage
    # activation hops (fwd + bwd) over ICI
    bubble = 1.0
    if layout.pipe > 1:
        mb = layout.num_microbatches
        bubble = (mb + layout.pipe - 1) / mb
        comm += (
            2 * (layout.pipe - 1) * tokens * d * 2 / (m.ici_bw * layout.data)
        )

    # HBM capacity filter: params(+grads+adam) per device
    bytes_per_dev = n_params * 16 / (layout.model * layout.pipe)
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
    except Exception:
        return float("inf")
    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(reps):
        step()
    return (time.perf_counter() - t0) / reps


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
