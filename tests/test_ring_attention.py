"""Ring attention / context parallelism vs single-device attention.

Context parallelism EXCEEDS the reference (no CP/ring attention there —
SURVEY.md §2.3); gate is exactness against the unsharded computation, the
same internal-consistency philosophy as the reference's TP-vs-PP diffs
(cpp_inference_tests.sh:205-215).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexflow_tpu.ops import attention as attn_lib
from flexflow_tpu.ops import ring_attention as ring
from flexflow_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def seq_mesh():
    return make_mesh(1, 1, 1, seq=4)


def _qkv(key, s, h, kh, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (s, h, d), dtype),
        jax.random.normal(kk, (s, kh, d), dtype),
        jax.random.normal(kv, (s, kh, d), dtype),
    )


@pytest.mark.parametrize("kh", [8, 2, 1])  # MHA, GQA, MQA
def test_ring_prefill_matches_single_device(seq_mesh, kh):
    q, k, v = _qkv(jax.random.PRNGKey(0), 64, 8, kh, 16)
    want = attn_lib.prefill_attention(q, k, v)
    got = ring.context_parallel_prefill(seq_mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_prefill_respects_length(seq_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(1), 64, 4, 4, 16)
    length = jnp.int32(37)
    want = attn_lib.prefill_attention(q, k, v, length=length)
    got = ring.context_parallel_prefill(seq_mesh, q, k, v, length=length)
    # positions >= length attend only to the valid prefix in both paths
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_prefill_bf16(seq_mesh):
    q, k, v = _qkv(jax.random.PRNGKey(2), 128, 4, 4, 32, jnp.bfloat16)
    want = attn_lib.prefill_attention(q, k, v)
    got = ring.context_parallel_prefill(seq_mesh, q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


@pytest.mark.parametrize("t", [1, 4])  # decode, tree verify
def test_cp_cached_decode_matches_split(seq_mesh, t):
    b, h, kh, d, s = 2, 4, 2, 16, 64
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (b, t, h, d))
    k_cache = jax.random.normal(ks[1], (b, kh, d, s))
    v_cache = jax.random.normal(ks[2], (b, kh, d, s))
    k_new = jax.random.normal(ks[3], (b, t, kh, d))
    v_new = jax.random.normal(ks[4], (b, t, kh, d))
    cache_lens = jnp.asarray([13, 48], jnp.int32)

    want = attn_lib.split_cached_attention(
        q, k_cache, v_cache, k_new, v_new, cache_lens
    )
    got = ring.context_parallel_decode(
        seq_mesh, q, k_cache, v_cache, k_new, v_new, cache_lens
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_cp_cached_decode_tree_mask(seq_mesh):
    """Tree-verify-style non-causal in-flight mask survives the CP merge."""
    b, t, h, kh, d, s = 1, 5, 2, 2, 16, 64
    ks = jax.random.split(jax.random.PRNGKey(4), 5)
    q = jax.random.normal(ks[0], (b, t, h, d))
    k_cache = jax.random.normal(ks[1], (b, kh, d, s))
    v_cache = jax.random.normal(ks[2], (b, kh, d, s))
    k_new = jax.random.normal(ks[3], (b, t, kh, d))
    v_new = jax.random.normal(ks[4], (b, t, kh, d))
    cache_lens = jnp.asarray([20], jnp.int32)
    # token-tree: 0 -> {1, 2}, 1 -> 3, 2 -> 4 (siblings don't see each other)
    nm = np.zeros((t, t), bool)
    for i in range(t):
        nm[i, i] = True
    nm[1, 0] = nm[2, 0] = True
    nm[3, [0, 1]] = True
    nm[4, [0, 2]] = True
    new_mask = jnp.asarray(nm)[None]

    want = attn_lib.split_cached_attention(
        q, k_cache, v_cache, k_new, v_new, cache_lens, new_mask=new_mask
    )
    got = ring.context_parallel_decode(
        seq_mesh, q, k_cache, v_cache, k_new, v_new, cache_lens, new_mask=new_mask
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_seq_axis_composes_with_model_axis():
    """2-way TP x 4-way CP mesh: ring prefill still exact (seq collectives
    must not leak across the model axis)."""
    mesh = make_mesh(1, 1, 2, seq=4)
    q, k, v = _qkv(jax.random.PRNGKey(5), 64, 4, 4, 16)
    want = attn_lib.prefill_attention(q, k, v)
    got = ring.context_parallel_prefill(mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
