"""benchmarks/spec_pair: verifier-embeds-draft construction is function-preserving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarks.spec_pair import embed_draft_in_verifier, perturb_params
from flexflow_tpu import specs
from flexflow_tpu.models import decoder
from flexflow_tpu.models import params as params_lib


def _spec(d, l, h, kh, f, v=128):
    return specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=v, hidden_size=d, num_layers=l,
        num_heads=h, num_kv_heads=kh, head_dim=d // h if h * (d // h) == d else 16,
        intermediate_size=f, max_position_embeddings=256, norm_eps=1e-6,
    )


def test_embedded_verifier_matches_draft_logits():
    dspec = _spec(32, 2, 2, 2, 64)
    vspec = _spec(64, 4, 4, 4, 160)
    assert dspec.head_dim == vspec.head_dim == 16
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(0), jnp.float32)
    vparams = embed_draft_in_verifier(dspec, dparams, vspec, dtype=jnp.float32)

    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 128)
    positions = jnp.broadcast_to(jnp.arange(9)[None], (2, 9)).astype(jnp.int32)
    ld, _ = decoder.forward(dspec, dparams, tokens, positions)
    lv, _ = decoder.forward(vspec, vparams, tokens, positions)
    # identical up to the rmsnorm-eps width mismatch (~1e-5 relative)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(ld), rtol=2e-3,
                               atol=2e-3)
    assert np.array_equal(np.argmax(lv, -1), np.argmax(ld, -1))


def test_embedded_verifier_cached_decode_matches():
    dspec = _spec(32, 2, 2, 2, 64)
    vspec = _spec(64, 3, 4, 4, 96)
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(2), jnp.float32)
    vparams = embed_draft_in_verifier(dspec, dparams, vspec, dtype=jnp.float32)

    dcache = decoder.init_kv_cache(dspec, 2, 32, jnp.float32)
    vcache = decoder.init_kv_cache(vspec, 2, 32, jnp.float32)
    lens = jnp.array([5, 3], jnp.int32)
    toks = jnp.array([[7], [9]], jnp.int32)
    # warm both caches with the same short history
    hist = jax.random.randint(jax.random.PRNGKey(3), (2, 5), 0, 128)
    _, dcache = decoder.forward_cached(dspec, dparams, hist, dcache,
                                       jnp.zeros(2, jnp.int32))
    _, vcache = decoder.forward_cached(vspec, vparams, hist, vcache,
                                       jnp.zeros(2, jnp.int32))
    ld, _ = decoder.forward_cached(dspec, dparams, toks, dcache, lens)
    lv, _ = decoder.forward_cached(vspec, vparams, toks, vcache, lens)
    assert np.array_equal(np.argmax(lv, -1), np.argmax(ld, -1))
    np.testing.assert_allclose(np.asarray(lv), np.asarray(ld), rtol=2e-3,
                               atol=2e-3)


def test_gqa_grouping_embeds():
    dspec = _spec(32, 1, 2, 1, 64)  # G = 2
    vspec = _spec(64, 2, 4, 2, 96)  # G = 2
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(4), jnp.float32)
    vparams = embed_draft_in_verifier(dspec, dparams, vspec, dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 6), 0, 128)
    positions = jnp.arange(6)[None].astype(jnp.int32)
    ld, _ = decoder.forward(dspec, dparams, tokens, positions)
    lv, _ = decoder.forward(vspec, vparams, tokens, positions)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(ld), rtol=2e-3,
                               atol=2e-3)


def test_gqa_group_mismatch_rejected():
    dspec = _spec(32, 1, 2, 2, 64)  # G = 1
    vspec = _spec(64, 1, 4, 2, 96)  # G = 2
    dparams = params_lib.init_params(dspec, jax.random.PRNGKey(6), jnp.float32)
    with pytest.raises(AssertionError):
        embed_draft_in_verifier(dspec, dparams, vspec)


def test_perturb_params_changes_weights_not_norms():
    dspec = _spec(32, 2, 2, 2, 64)
    p = params_lib.init_params(dspec, jax.random.PRNGKey(7), jnp.float32)
    q = perturb_params(p, 0.05, jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(q["layers"]["wq"]),
                           np.asarray(p["layers"]["wq"]))
    assert np.array_equal(np.asarray(q["layers"]["ln1_scale"]),
                          np.asarray(p["layers"]["ln1_scale"]))
    # relative scale of the noise is ~eps
    dw = np.asarray(q["layers"]["wu"], np.float32) - np.asarray(
        p["layers"]["wu"], np.float32)
    assert 0.01 < dw.std() / np.asarray(p["layers"]["wu"]).std() < 0.2


def test_fast_quant_matches_reference_construction():
    """fast_quantized_verifier must produce carriers BIT-IDENTICAL to
    quantizing the full embedded construction (the analytic zero-group
    encoding it relies on)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from benchmarks.spec_pair import (
        embed_draft_in_verifier, fast_quantized_verifier, quantize_and_upload,
    )
    from flexflow_tpu import specs
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.quant.weight_only import QuantizedArray

    D = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=600, hidden_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=128,
        intermediate_size=512, max_position_embeddings=256, norm_eps=1e-6,
    )
    V = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=600, hidden_size=1024,
        num_layers=4, num_heads=8, num_kv_heads=8, head_dim=128,
        intermediate_size=2048, max_position_embeddings=256, norm_eps=1e-6,
    )
    dp = params_lib.init_params(D, jax.random.PRNGKey(0), jnp.float32)

    def cmp(path, a, b):
        if isinstance(a, QuantizedArray):
            assert (a.shape, a.bits, a.group_size, a.rest_pad,
                    a.batch_dims, a.contract_dims) == (
                b.shape, b.bits, b.group_size, b.rest_pad,
                b.batch_dims, b.contract_dims), path
            np.testing.assert_array_equal(
                np.asarray(a.q), np.asarray(b.q), err_msg=path)
            np.testing.assert_allclose(
                np.asarray(a.scale), np.asarray(b.scale), rtol=1e-6,
                err_msg=path)
            if a.offset is not None:
                np.testing.assert_allclose(
                    np.asarray(a.offset), np.asarray(b.offset), rtol=1e-6,
                    atol=1e-18, err_msg=path)
        else:
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                err_msg=path)

    for bits in (8, 4):
        vnp = embed_draft_in_verifier(D, dp, V, as_numpy=True)
        ref = quantize_and_upload(vnp, V, bits)
        fast = fast_quantized_verifier(D, dp, V, bits)
        for k in ref:
            if k == "layers":
                for kk in ref["layers"]:
                    cmp(f"{bits}:layers.{kk}", ref["layers"][kk],
                        fast["layers"][kk])
            else:
                cmp(f"{bits}:{k}", ref[k], fast[k])
