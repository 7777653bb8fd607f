"""Profiling hooks: per-step timing + XLA trace capture.

TPU-native analog of the reference's ``--profiling`` per-op cudaEvent timing
(/root/reference/src/ops/kernels/linear_kernels.cu:144-178) and the Legion
profiler. Under XLA whole-step programs, per-op timing comes from the XLA
profiler trace (``capture_trace``); the step timer gives the per-iteration
wall/device numbers the reference prints per kernel wrapper.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StepTimer:
    """Accumulates per-phase wall times (prefill/decode/spec-step/...)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> List[str]:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(
                f"[Profile] {name}: total {tot * 1e3:.2f} ms, "
                f"count {n}, mean {tot / n * 1e3:.3f} ms"
            )
        return lines


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """XLA profiler trace (view in TensorBoard/xprof). May be unsupported on
    some remote-tunnel device backends; failures are reported, not raised."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover
        print(f"[Profile] trace capture unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
