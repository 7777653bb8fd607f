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


def per_op_profile(spec, params, *, batch: int = 1, seq: int = 32,
                   cache_len: int = 128, reps: int = 10):
    """Per-OP forward timing in the reference's per-kernel style
    (/root/reference/src/ops/kernels/linear_kernels.cu:144-178: every kernel
    wrapper brackets itself with cudaEvents under --profiling).

    XLA fuses a whole step into one program, so in-step per-op times are
    not observable from the host; this dispatches each operator of one
    decoder layer as its OWN compiled program (RMSNorm, Linear qkv,
    attention, Linear o, MLP, LMHead) and times it — the measured cost of
    each op unfused, which is what the reference's brackets report (its
    kernels are unfused too). Returns reference-style report lines.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexflow_tpu.models import decoder
    from flexflow_tpu.ops import attention as attn_lib

    layer0 = jax.tree.map(lambda a: a[0], params["layers"])
    rng = np.random.RandomState(0)
    toks = jnp.asarray(
        rng.randint(1, spec.vocab_size, size=(batch, seq)), jnp.int32)
    positions = jnp.broadcast_to(
        jnp.arange(seq, dtype=jnp.int32)[None], (batch, seq))
    h = decoder._embed(spec, params, toks, positions)
    dt_c = h.dtype
    q = jnp.asarray(rng.randn(batch, seq, spec.num_heads, spec.head_dim), dt_c)
    k = jnp.asarray(
        rng.randn(batch, seq, spec.num_kv_heads, spec.head_dim), dt_c)
    ck = jnp.asarray(rng.randn(
        batch, spec.num_kv_heads, spec.head_dim, cache_len), dt_c)
    lens = jnp.full((batch,), cache_len - seq, jnp.int32)

    ops = {
        "RMSNorm" if spec.norm == "rmsnorm" else "LayerNorm": (
            jax.jit(lambda p, x: decoder._norm(
                spec, x, p["ln1_scale"], p.get("ln1_bias"))),
            (layer0, h),
        ),
        "Linear (qkv)": (
            jax.jit(lambda p, x: decoder._qkv(spec, p, x)), (layer0, h)),
        "IncMultiHeadSelfAttention": (
            jax.jit(lambda qq, kk, vv, c1, c2, ll: attn_lib.split_cached_attention(
                qq, c1, c2, kk, vv, ll)),
            (q, k, k, ck, ck, lens),
        ),
        "Linear (o_proj)": (
            jax.jit(lambda p, a: decoder._attn_out(spec, p, a)), (layer0, q)),
        "MLP (gate/up/down)" if spec.act == "silu_gate" else "MLP": (
            jax.jit(lambda p, x: decoder._mlp(spec, p, x)), (layer0, h)),
        "Embedding": (
            jax.jit(lambda pp, t: decoder._embed(spec, pp, t, positions)),
            (params, toks),
        ),
        "LMHead (linear)": (
            jax.jit(lambda pp, x: decoder._unembed(spec, pp, x)), (params, h)),
    }
    lines = []
    for name, (fn, args) in ops.items():
        try:
            out = fn(*args)
            jax.block_until_ready(out)  # compile + warmup
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / reps * 1e3
        except Exception as e:  # op not applicable to this spec
            lines.append(f"[Profile] {name}: skipped ({type(e).__name__})")
            continue
        lines.append(
            f"[Profile] {name} forward time = {ms:.4f}ms "
            f"(B={batch} T={seq} S={cache_len}, per layer)"
        )
    return lines
