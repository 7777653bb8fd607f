"""Optimizers: SGD (momentum/weight-decay/nesterov) and Adam.

TPU-native equivalent of /root/reference/src/runtime/optimizer.cc +
optimizer_kernel.cu. The reference has two sync paths — parameter-server
``ps_update_task`` and ``nccl_update_task`` (gradient allreduce fused into the
update kernel, optimizer_kernel.cu:91,203). Under GSPMD the data-parallel
gradient psum is inserted by XLA inside the same jitted step, so the fused
"allreduce inside update" behavior is the default here.

Implemented directly (not via optax) so the update math matches the reference
kernels exactly; the API accepts optax-style (init, update) too.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    velocity: Any


@dataclasses.dataclass(frozen=True)
class SGDOptimizer:
    """SGD with momentum/weight decay (reference optimizer.h:28-66)."""

    lr: float = 0.01
    momentum: float = 0.0
    nesterov: bool = False
    weight_decay: float = 0.0

    def init(self, params) -> SGDState:
        zeros = jax.tree.map(jnp.zeros_like, params) if self.momentum else None
        return SGDState(velocity=zeros)

    def update(self, grads, state: SGDState, params) -> Tuple[Any, SGDState]:
        if not self.momentum:
            new_params = jax.tree.map(
                lambda p, g: p - self.lr * (g + self.weight_decay * p), params, grads
            )
            return new_params, state

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_v = treedef.flatten_up_to(state.velocity)
        new_p, new_v = [], []
        for p, g, v in zip(flat_p, flat_g, flat_v):
            g = g + self.weight_decay * p
            v = self.momentum * v + g
            step = g + self.momentum * v if self.nesterov else v
            new_p.append(p - self.lr * step)
            new_v.append(v)
        return treedef.unflatten(new_p), SGDState(velocity=treedef.unflatten(new_v))


class AdamState(NamedTuple):
    step: jnp.ndarray
    m: Any
    v: Any


@dataclasses.dataclass(frozen=True)
class AdamOptimizer:
    """Adam (reference optimizer.h:68-110, optimizer_kernel.cu adam kernels)."""

    lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0

    def init(self, params) -> AdamState:
        return AdamState(
            step=jnp.zeros((), jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params),
            v=jax.tree.map(jnp.zeros_like, params),
        )

    def update(self, grads, state: AdamState, params) -> Tuple[Any, AdamState]:
        step = state.step + 1
        b1t = 1.0 - self.beta1 ** step.astype(jnp.float32)
        b2t = 1.0 - self.beta2 ** step.astype(jnp.float32)

        def upd(p, g, m, v):
            g = g + self.weight_decay * p
            m = self.beta1 * m + (1 - self.beta1) * g
            v = self.beta2 * v + (1 - self.beta2) * jnp.square(g)
            mhat = m / b1t
            vhat = v / b2t
            return p - self.lr * mhat / (jnp.sqrt(vhat) + self.eps), m, v

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        new_p, new_m, new_v = [], [], []
        for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
            a, b, c = upd(p, g, m, v)
            new_p.append(a)
            new_m.append(b)
            new_v.append(c)
        return (
            treedef.unflatten(new_p),
            AdamState(step=step, m=treedef.unflatten(new_m), v=treedef.unflatten(new_v)),
        )
