"""Property-based tests for the INT4/INT8 weight-only quantization layouts.

Invariants pinned here (reference analog: the packed-weight layouts of
/root/reference/src/ops/kernels/decompress_kernels.cu and the repack logic in
/root/reference/src/runtime/file_loader.cc:417-670):

- quantize -> dequantize restores the logical shape exactly, for any batch
  dims / contract dims split, including when quantize pads the out dim
  (rest_pad) for wide Pallas blocks.
- round-to-nearest error bound: |deq - w| <= scale/2 per element.
- the Pallas fused kernel (interpret mode on CPU) computes exactly
  x @ dequantize(qa) modulo bf16 accumulation differences.
- QuantizedArray is a well-formed pytree: flatten/unflatten roundtrips all
  aux data (rest_pad included) so jit/scan/donation see a stable treedef.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from flexflow_tpu.ops.pallas import quant_matmul as qmm
from flexflow_tpu.quant import dequantize, quantize

SETTINGS = dict(max_examples=25, deadline=None)


def _weights(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * 0.1


@st.composite
def layout(draw):
    bits = draw(st.sampled_from([4, 8]))
    gs = draw(st.sampled_from([32, 64, 128]))
    # int4 packs planar halves: D/2 must be whole groups
    groups_per_half = draw(st.integers(1, 4))
    d = gs * groups_per_half * 2
    rest = draw(st.sampled_from([16, 32, 96, 128]))
    return bits, gs, d, rest


@given(layout(), st.integers(0, 10_000))
@settings(**SETTINGS)
def test_roundtrip_shape_and_bound(lay, key):
    bits, gs, d, rest = lay
    w = _weights(key, (d, rest))
    qa = quantize(w, bits=bits, group_size=gs, compute_dtype=jnp.float32)
    deq = np.asarray(dequantize(qa))
    assert deq.shape == w.shape
    scale = np.repeat(np.asarray(qa.scale)[..., : rest], gs, axis=0)
    assert (np.abs(deq - np.asarray(w)) <= scale / 2 + 1e-6).all()


@given(layout(), st.integers(1, 3), st.integers(0, 10_000))
@settings(**SETTINGS)
def test_batch_dims_match_independent(lay, nb, key):
    bits, gs, d, rest = lay
    w = _weights(key, (nb, d, rest))
    qa = quantize(
        w, bits=bits, group_size=gs, batch_dims=1, compute_dtype=jnp.float32
    )
    deq = np.asarray(dequantize(qa))
    assert deq.shape == w.shape
    for i in range(nb):
        qi = quantize(w[i], bits=bits, group_size=gs, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(deq[i], np.asarray(dequantize(qi)))


@given(
    st.sampled_from([4, 8]),
    st.sampled_from([513, 640, 1000, 1024]),  # spans pad / no-pad out dims
    st.integers(0, 10_000),
)
@settings(max_examples=10, deadline=None)
def test_rest_pad_is_invisible(bits, rest, key):
    d = 1024  # >=1024 with rest>=512 triggers the 512-multiple pad
    w = _weights(key, (d, rest))
    qa = quantize(w, bits=bits, group_size=128, compute_dtype=jnp.float32)
    assert qa.rest_pad == (-rest) % 512
    assert qa.q.shape[-1] == rest + qa.rest_pad
    deq = np.asarray(dequantize(qa))
    assert deq.shape == (d, rest)
    scale = np.repeat(np.asarray(qa.scale)[:, :rest], 128, axis=0)
    assert (np.abs(deq - np.asarray(w)) <= scale / 2 + 1e-6).all()
    # padded columns carry exact zeros so they can never leak into outputs
    if qa.rest_pad and bits == 8:
        assert not np.asarray(qa.q)[:, rest:].any()


@given(st.sampled_from([4, 8]), st.integers(1, 8), st.integers(0, 10_000))
@settings(max_examples=8, deadline=None)
def test_pallas_kernel_matches_dequant_dot(bits, b, key):
    d, rest = 1024, 512  # smallest Pallas-eligible shape (interpret on CPU)
    w = _weights(key, (d, rest))
    qa = quantize(w, bits=bits, group_size=128, compute_dtype=jnp.bfloat16)
    assert qmm.pallas_eligible(qa)
    x = jax.random.normal(jax.random.PRNGKey(key + 1), (b, d), jnp.bfloat16)
    want = jnp.dot(
        x.astype(jnp.float32), dequantize(qa).astype(jnp.float32)
    )
    got = qmm.quant_matmul(x, qa, interpret=True).astype(jnp.float32)
    assert got.shape == (b, rest)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        atol=0.05 * float(jnp.max(jnp.abs(want))), rtol=0,
    )


@given(layout(), st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_pytree_roundtrip(lay, key):
    bits, gs, d, rest = lay
    qa = quantize(
        _weights(key, (d, rest)), bits=bits, group_size=gs,
        compute_dtype=jnp.float32,
    )
    leaves, treedef = jax.tree_util.tree_flatten(qa)
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.shape == qa.shape
    assert back.rest_pad == qa.rest_pad
    assert back.bits == qa.bits and back.group_size == qa.group_size
    np.testing.assert_array_equal(
        np.asarray(dequantize(back)), np.asarray(dequantize(qa))
    )
