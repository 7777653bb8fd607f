"""Activation functions and fused MLP gates.

TPU-native equivalent of the reference's ElementUnary op
(/root/reference/src/ops/element_unary.cu) and the SwiGLU gate fusion
(/root/reference/src/ops/sigmoid_silu_multi.cu). All of these fuse into the
adjacent matmuls under XLA, so plain jnp is speed-of-light here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    # erf-based gelu (HF "gelu")
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x):
    # tanh-approximate gelu (HF "gelu_new" / "gelu_pytorch_tanh")
    return jax.nn.gelu(x, approximate=True)


def relu(x):
    return jnp.maximum(x, 0)


def sigmoid_silu_multi(gate, up):
    """SwiGLU gate: silu(gate) * up.

    Reference: src/ops/sigmoid_silu_multi.cu (SigmoidSiluMulti fused op).
    """
    return silu(gate) * up


ACTIVATIONS = {
    "silu": silu,
    "gelu": gelu,
    "gelu_new": gelu_new,
    "relu": relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


def get_activation(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Unknown activation {name!r}") from None
