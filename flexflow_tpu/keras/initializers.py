"""Keras initializers (reference python/flexflow/keras/initializers.py).

Layers accept ``kernel_initializer=``; the FFModel DSL applies them at
compile-time parameter init (reference initializer.cc task analogs).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class Initializer:
    def __call__(self, shape, fan_in, fan_out, key):
        raise NotImplementedError


class DefaultInitializer(Initializer):
    """Layer-type default (glorot for kernels) — reference initializers.py:26."""

    def __call__(self, shape, fan_in, fan_out, key):
        return GlorotUniform()(shape, fan_in, fan_out, key)


class Zeros(Initializer):
    def __call__(self, shape, fan_in, fan_out, key):
        return jnp.zeros(shape)


class GlorotUniform(Initializer):
    def __init__(self, seed=None):
        self.seed = seed

    def __call__(self, shape, fan_in, fan_out, key):
        if self.seed is not None:
            key = jax.random.PRNGKey(self.seed)
        limit = np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


class RandomUniform(Initializer):
    def __init__(self, minval=-0.05, maxval=0.05, seed=None):
        self.minval, self.maxval, self.seed = minval, maxval, seed

    def __call__(self, shape, fan_in, fan_out, key):
        if self.seed is not None:
            key = jax.random.PRNGKey(self.seed)
        return jax.random.uniform(
            key, shape, jnp.float32, self.minval, self.maxval
        )


class RandomNormal(Initializer):
    def __init__(self, mean=0.0, stddev=0.05, seed=None):
        self.mean, self.stddev, self.seed = mean, stddev, seed

    def __call__(self, shape, fan_in, fan_out, key):
        if self.seed is not None:
            key = jax.random.PRNGKey(self.seed)
        return self.mean + self.stddev * jax.random.normal(key, shape)
