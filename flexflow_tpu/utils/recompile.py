"""RecompileState — adaptive reconfiguration with bucketed re-jit.

TPU-native analog of the reference's RecompileState
(/root/reference/include/flexflow/recompile.h:26-40 + the MoE example's
mid-training expert-capacity adaptation): a user-provided ``trigger``
inspects runtime state each step; when it fires, ``alter`` mutates the
model/engine configuration and the NEXT step recompiles.

Why the design differs: the reference mutates op attributes in place and
re-runs its compiler. Under XLA every program is compiled for STATIC
shapes, so "recompile" here means moving to a different static
configuration BUCKET — jit itself keys its cache on the static argument,
so returning to a previously-seen bucket is free (cache hit), and only
genuinely new buckets pay a compile. That bucketing is also why the
MoE serving path never needs this at all: ``ops/moe.py`` routes with
``lax.ragged_dot`` grouped GEMMs and drops NO tokens regardless of load
(exact, unlike the reference's alpha-capacity drops) — documented there as
the design answer to the reference's adaptive expert capacity.

Usage::

    rs = RecompileState(
        trigger=lambda state: state["overflow_frac"] > 0.1,
        alter=lambda state: state.update(
            capacity_factor=round_up_bucket(state["capacity_factor"] * 1.5)),
    )
    for step in range(n):
        metrics = train_step(capacity_factor=state["capacity_factor"])
        rs.step(state)   # fires trigger/alter; counts recompilations
"""

from __future__ import annotations

from typing import Callable


def round_up_bucket(x: float, buckets=(1.0, 1.25, 1.5, 2.0, 3.0, 4.0)) -> float:
    """Snap a capacity factor to the static bucket grid (bounds the compile
    count the way prefill/window buckets do elsewhere in the framework)."""
    for b in buckets:
        if x <= b:
            return b
    return buckets[-1]


class RecompileState:
    """Trigger/alter pair evaluated per step (recompile.h:26-40)."""

    def __init__(self, trigger: Callable[..., bool],
                 alter: Callable[..., None]):
        self.trigger_func = trigger
        self.alter_func = alter
        self.recompilations = 0

    def trigger(self, *args, **kw) -> bool:
        return bool(self.trigger_func(*args, **kw))

    def alter(self, *args, **kw) -> None:
        self.alter_func(*args, **kw)
        self.recompilations += 1

    def step(self, *args, **kw) -> bool:
        """Evaluate the trigger; on fire, run alter. Returns whether the
        configuration changed (i.e. the next jitted step will recompile
        unless its bucket was seen before)."""
        if self.trigger(*args, **kw):
            self.alter(*args, **kw)
            return True
        return False
