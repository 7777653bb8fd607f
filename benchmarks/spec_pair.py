"""Synthetic (verifier, draft) model pair for speculative-decoding benchmarks.

Problem: this environment has zero egress, so the reference's benchmark pair
(LLaMA-2-7B verifier + llama-160m draft, cpp_inference_tests.sh:131-153) can't
be downloaded, and two independently random-initialized models never agree —
draft acceptance would be ~0 and no scheduler could show its real speedup.

Construction: **embed the draft inside the verifier**. The verifier is a
full-size model (every weight byte streams from HBM, every MXU pass runs)
whose weights are block-structured so that the extra hidden dims / heads /
FFN columns / layers contribute exactly zero to the residual stream:

- embed_tokens[:, dd:] = 0 -> hidden state lives in the first ``dd`` dims.
- active layers (l < Ld): draft blocks in the top-left corner of every
  projection, zeros elsewhere; RMSNorm scales carry a sqrt(dd/dv) correction
  because the norm averages h^2 over the full (mostly-zero) width.
- extra layers (l >= Ld): zero wk/wv/wo and wg/wu/wd -> attention output and
  MLP output are exactly zero; the residual passes through unchanged.
- extra q/kv heads: zero projections -> zero attention output.

The verifier's function is then (up to the norm-eps rounding, ~1e-5 rel) the
draft's function, so token-level agreement is 1.0. Realistic agreement is
dialed in by perturbing the DRAFT's weights (``perturb_params``): the bench
calibrates the noise scale so per-token argmax agreement lands in the regime
published for real pairs (SpecInfer: ~3.5-4.5 accepted tokens/step at
width 3 / depth 8). Verifier cost is real; draft cost is real; only their
*relationship* is synthetic — which is exactly the quantity a speedup gate
needs to control.

Requires llama-style specs: rmsnorm (layernorm's mean-subtraction would mix
zero and nonzero dims), silu_gate MLP, no biases, same head_dim/rope/vocab.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.specs import ModelSpec


def _check(dspec: ModelSpec, vspec: ModelSpec) -> None:
    assert dspec.norm == vspec.norm == "rmsnorm", "rmsnorm only (see docstring)"
    assert dspec.act == vspec.act == "silu_gate"
    assert dspec.pos == vspec.pos == "rope"
    assert dspec.head_dim == vspec.head_dim
    assert dspec.rope_theta == vspec.rope_theta
    assert dspec.vocab_size == vspec.vocab_size
    assert not dspec.qkv_bias and not vspec.qkv_bias
    assert dspec.hidden_size <= vspec.hidden_size
    assert dspec.num_layers <= vspec.num_layers
    assert dspec.num_heads <= vspec.num_heads
    assert dspec.num_kv_heads <= vspec.num_kv_heads
    assert dspec.intermediate_size <= vspec.intermediate_size
    assert dspec.norm_eps == vspec.norm_eps
    assert dspec.embed_scale == vspec.embed_scale == 1.0
    # q-head -> kv-head grouping must line up on the draft's heads: with
    # G = H/KH equal in both models, draft head i maps to draft kv head i//G
    assert (dspec.num_heads * vspec.num_kv_heads
            == vspec.num_heads * dspec.num_kv_heads), "GQA group mismatch"


def embed_draft_in_verifier(
    dspec: ModelSpec, dparams, vspec: ModelSpec, dtype=jnp.bfloat16
):
    """Return verifier params computing the draft's function at full size."""
    _check(dspec, vspec)
    dd, dv = dspec.hidden_size, vspec.hidden_size
    ld, lv = dspec.num_layers, vspec.num_layers
    hd, hv = dspec.num_heads, vspec.num_heads
    kd, kv_ = dspec.num_kv_heads, vspec.num_kv_heads
    fd, fv = dspec.intermediate_size, vspec.intermediate_size
    dh = dspec.head_dim
    alpha = float(np.sqrt(dd / dv))  # rmsnorm width correction

    dl = dparams["layers"]

    def emb(shape, src, idx):
        out = np.zeros(shape, np.float32)
        out[idx] = np.asarray(src, np.float32)
        return jnp.asarray(out, dtype)

    s_ld = np.s_[:ld]
    layers = {
        "ln1_scale": emb((lv, dv), np.asarray(dl["ln1_scale"], np.float32) * alpha,
                         (s_ld, np.s_[:dd])),
        "ln2_scale": emb((lv, dv), np.asarray(dl["ln2_scale"], np.float32) * alpha,
                         (s_ld, np.s_[:dd])),
        "wq": emb((lv, dv, hv, dh), dl["wq"], (s_ld, np.s_[:dd], np.s_[:hd])),
        "wk": emb((lv, dv, kv_, dh), dl["wk"], (s_ld, np.s_[:dd], np.s_[:kd])),
        "wv": emb((lv, dv, kv_, dh), dl["wv"], (s_ld, np.s_[:dd], np.s_[:kd])),
        "wo": emb((lv, hv, dh, dv), dl["wo"], (s_ld, np.s_[:hd], np.s_[:], np.s_[:dd])),
        "wg": emb((lv, dv, fv), dl["wg"], (s_ld, np.s_[:dd], np.s_[:fd])),
        "wu": emb((lv, dv, fv), dl["wu"], (s_ld, np.s_[:dd], np.s_[:fd])),
        "wd": emb((lv, fv, dv), dl["wd"], (s_ld, np.s_[:fd], np.s_[:dd])),
    }
    # extra layers' norm scales: value irrelevant (their block outputs are
    # zero), but keep them 1.0 so activations stay finite
    for k in ("ln1_scale", "ln2_scale"):
        arr = np.array(layers[k], np.float32)  # writable copy
        arr[ld:] = 1.0
        layers[k] = jnp.asarray(arr, dtype)

    head = dparams.get("lm_head")
    if head is None:  # tied draft embedding
        head = jnp.asarray(dparams["embed_tokens"], jnp.float32).T
    params = {
        "embed_tokens": emb((vspec.vocab_size, dv), dparams["embed_tokens"],
                            (np.s_[:], np.s_[:dd])),
        "layers": layers,
        "final_norm_scale": emb(
            (dv,), np.asarray(dparams["final_norm_scale"], np.float32) * alpha,
            np.s_[:dd]),
        "lm_head": emb((dv, vspec.vocab_size), head, (np.s_[:dd], np.s_[:])),
    }
    return params


def perturb_params(params, eps: float, key: jax.Array):
    """Add per-tensor relative Gaussian noise: p + eps * std(p) * N(0,1).

    Applied to the draft so (verifier, draft) disagree at a controlled rate;
    norm scales and zero-std tensors are left untouched.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        std = float(jnp.std(leaf.astype(jnp.float32)))
        if std == 0.0 or leaf.ndim < 2:  # skip norms/bias vectors
            out.append(leaf)
            continue
        noise = jax.random.normal(k, leaf.shape, jnp.float32) * (eps * std)
        out.append((leaf.astype(jnp.float32) + noise).astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
