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
    from flexflow_tpu.ops.attention import split_cached_attention
    from flexflow_tpu.ops.pallas.decode_attention import decode_attention

    b, s, h, kh, d = 4, 64, 8, 2, 32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (b, 1, h, d), jnp.float32)
    kc = jax.random.normal(ks[1], (b, kh, d, s), jnp.float32)
    vc = jax.random.normal(ks[2], (b, kh, d, s), jnp.float32)
    k_self = jax.random.normal(ks[3], (b, 1, kh, d), jnp.float32)
    v_self = jax.random.normal(ks[4], (b, 1, kh, d), jnp.float32)
    lens = jnp.asarray([5, 17, 0, 33], jnp.int32)

    # split-cache form: committed cache + the decode token's own K/V in-register
    want = split_cached_attention(q, kc, vc, k_self, v_self, cache_lens=lens)
    got = decode_attention(
        q[:, 0], kc, vc, k_self[:, 0], v_self[:, 0], lens, interpret=True
    )[:, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_forward_cached_kv_window_write():
    """forward_cached writes the step's KV into [write_start, write_start+T)
    of every layer's cache slot (the unrolled-DUS path; reference
    update_kv_cache_kernel semantics)."""
    from flexflow_tpu import specs
    from flexflow_tpu.models import decoder, params as params_lib

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=64, hidden_size=16,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=8,
        intermediate_size=32, max_position_embeddings=64, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)
    cache = decoder.init_kv_cache(spec, 3, 32, jnp.float32)
    lens = jnp.asarray([4, 0, 9], jnp.int32)
    tokens = jnp.asarray([[1, 2], [3, 4], [5, 6]], jnp.int32)

    _, new_cache = decoder.forward_cached(spec, params, tokens, cache, lens)
    got = np.array(new_cache.k)
    # untouched outside the written windows
    base = np.asarray(cache.k)
    for bb, st in enumerate([4, 0, 9]):
        w = got[:, bb, :, :, st:st + 2]
        assert np.any(w != 0), f"slot {bb}: window not written"
        got[:, bb, :, :, st:st + 2] = base[:, bb, :, :, st:st + 2]
    np.testing.assert_allclose(got, base)


def test_split_cached_attention_matches_write_then_attend():
    """split (read-only cache + in-register new KV) == legacy write-then-attend."""
    from flexflow_tpu.ops.attention import cached_attention, split_cached_attention

    b, s, t, h, kh, d = 3, 32, 4, 4, 2, 16
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    kc = jax.random.normal(ks[1], (b, s, kh, d), jnp.float32)
    vc = jax.random.normal(ks[2], (b, s, kh, d), jnp.float32)
    kn = jax.random.normal(ks[3], (b, t, kh, d), jnp.float32)
    vn = jax.random.normal(ks[4], (b, t, kh, d), jnp.float32)
    lens = jnp.asarray([5, 0, 20], jnp.int32)

    # legacy path: write new tokens at lens + arange(t), attend over cache
    bidx = jnp.arange(b)[:, None]
    wpos = lens[:, None] + jnp.arange(t)[None, :]
    kc_w = kc.at[bidx, wpos].set(kn)
    vc_w = vc.at[bidx, wpos].set(vn)
    want = cached_attention(q, kc_w, vc_w, cache_lens=lens)
    # split path takes the [B, KH, D, S] cache layout
    got = split_cached_attention(
        q, kc.transpose(0, 2, 3, 1), vc.transpose(0, 2, 3, 1), kn, vn,
        cache_lens=lens,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("kh", [4, 1, 8])  # GQA, MQA, MHA (h=8)
def test_flash_prefill_matches_reference(kh):
    from flexflow_tpu.ops.attention import prefill_attention
    from flexflow_tpu.ops.pallas.flash_prefill import flash_prefill

    b, s, h, d = 2, 256, 8, 32
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, d), jnp.float32)
    lens = jnp.asarray([s, 100], jnp.int32)

    got = flash_prefill(q, k, v, lens, block_q=64, block_k=128, interpret=True)
    want = jnp.stack(
        [prefill_attention(q[i], k[i], v[i], length=lens[i]) for i in range(b)]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )




def test_quant_matmul_indexed_matches_sliced():
    """Layer-indexed kernel over stacked [L, ...] carriers: every layer's
    rows must be bitwise-identical to the per-layer kernel on the sliced
    unit (same dequant math and blocking — the property that lets the
    serving forward stream tiles from the stacked buffers with no copy)."""
    import jax.tree_util as jtu

    from flexflow_tpu.ops.pallas.quant_matmul import (
        quant_matmul, quant_matmul_indexed,
    )

    L, d, f, b = 3, 256, 512, 4
    for bits in (4, 8):
        w = jax.random.normal(jax.random.PRNGKey(bits), (L, d, f), jnp.float32)
        qa = quantize(w, bits=bits, group_size=64, batch_dims=1,
                      compute_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(7), (b, d), jnp.float32)
        for l in range(L):
            got = quant_matmul_indexed(x, qa, jnp.int32(l), interpret=True)
            qa_l = jtu.tree_map(lambda a: a[l], qa)
            want = quant_matmul(x, qa_l, interpret=True)
            assert np.array_equal(np.asarray(got), np.asarray(want)), (
                bits, l)
