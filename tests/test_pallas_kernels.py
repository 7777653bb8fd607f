"""Pallas kernel correctness vs the jnp reference implementations (interpret
mode on CPU; the real-TPU validation runs in benches/scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu.ops.pallas.quant_matmul import quant_matmul
from flexflow_tpu.quant import dequantize, quantize


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_matmul_matches_dequant(bits):
    key = jax.random.PRNGKey(0)
    d, f, b = 256, 512, 8
    w = jax.random.normal(key, (d, f), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, d), jnp.float32)
    qa = quantize(w, bits=bits, group_size=64, compute_dtype=jnp.float32)

    want = x @ dequantize(qa)
    got = quant_matmul(x, qa, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=1e-2)


def test_quant_matmul_head_layout():
    # wq-style unit: [D, H, Dh] with contraction on D
    d, h, dh = 128, 4, 32
    w = jax.random.normal(jax.random.PRNGKey(2), (d, h, dh), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, d), jnp.float32)
    qa = quantize(w, bits=8, group_size=64, compute_dtype=jnp.float32)
    want = jnp.tensordot(x, dequantize(qa), axes=1)
    got = quant_matmul(x, qa, interpret=True)
    assert got.shape == (2, 3, h, dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=1e-2)


def test_quant_matmul_wo_layout():
    # wo-style unit: [H, Dh, D] contracting (H, Dh)
    h, dh, d = 4, 32, 128
    w = jax.random.normal(jax.random.PRNGKey(4), (h, dh, d), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, h, dh), jnp.float32)
    qa = quantize(
        w, bits=8, group_size=64, contract_dims=2, compute_dtype=jnp.float32
    )
    want = jnp.tensordot(x, dequantize(qa), axes=2)
    got = quant_matmul(x, qa, interpret=True)
    assert got.shape == (2, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=1e-2)


def test_decode_attention_matches_reference():
    from flexflow_tpu.ops.attention import cached_attention
    from flexflow_tpu.ops.pallas.decode_attention import decode_attention

    b, s, h, kh, d = 4, 64, 8, 2, 32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.float32)
    kc = jax.random.normal(ks[1], (b, s, kh, d), jnp.float32)
    vc = jax.random.normal(ks[2], (b, s, kh, d), jnp.float32)
    lens = jnp.asarray([5, 17, 0, 33], jnp.int32)

    # reference path: new token already written at position lens
    want = cached_attention(q, kc, vc, cache_lens=lens)
    got = decode_attention(q[:, 0], kc, vc, lens, interpret=True)[:, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
