"""Device timing that survives the axon-tunnel TPU backend.

On the tunneled single-chip backend, ``jax.block_until_ready`` resolves before
the device actually finishes (measured: a chain of 8k matmuls "completed" at
30 PFLOP/s), so naive timing loops measure dispatch, not compute. The only
reliable sync is a device->host fetch — which itself carries a large
round-trip latency (~hundreds of ms cold).

``time_chained`` therefore times N *chained* invocations (each output feeds
the next input, forcing serial device execution) with ONE tiny fetch at the
end, amortizing the RTT. Use ``chain`` to adapt functions whose output can't
feed their input directly.
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import time
from typing import Callable

import jax


def time_chained(
    step: Callable,  # state -> state (device arrays)
    init_state,
    *,
    iters: int = 30,
    warmup: int = 2,
) -> float:
    """Mean seconds per ``step`` over ``iters`` chained device executions."""
    state = init_state
    for _ in range(warmup):
        state = step(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    _sync(state)
    return (time.perf_counter() - t0) / iters


def _sync(state) -> None:
    leaf = jax.tree_util.tree_leaves(state)[0]
    jax.device_get(jax.numpy.ravel(leaf)[:1])
