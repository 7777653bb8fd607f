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

import functools
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import jax
import jax.numpy as jnp
import numpy as np

from typing import Sequence

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
    dspec: ModelSpec, dparams, vspec: ModelSpec, dtype=jnp.bfloat16,
    *, as_numpy: bool = False,
):
    """Return verifier params computing the draft's function at full size.

    ``as_numpy=True`` keeps every leaf as a host float32 ndarray (no device
    transfer) — used by the 7B quantized build, which quantizes leaves on
    the host CPU backend before uploading int8/int4 carriers (a 7B bf16
    verifier would not fit HBM un-quantized)."""
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
        return out if as_numpy else jnp.asarray(out, dtype)

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
        layers[k] = arr if as_numpy else jnp.asarray(arr, dtype)

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


def quantize_and_upload(vnp, vspec: ModelSpec, bits: int,
                        group_size: int = 128):
    """Quantize host verifier leaves on the CPU backend and upload carriers.

    Split from :func:`build_quantized_verifier` so one (expensive, ~27 GB)
    host build can feed several quantizations (INT8 + INT4 benches)."""
    from flexflow_tpu.quant.weight_only import QuantizedArray, quantize_params

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vq = quantize_params(vspec, vnp, bits, group_size=group_size)

    tpu = jax.devices()[0]

    def upload(leaf):
        if isinstance(leaf, QuantizedArray):
            return jax.device_put(leaf, tpu)
        return jax.device_put(jnp.asarray(leaf, jnp.bfloat16), tpu)

    return jax.tree.map(
        upload, vq, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )


def build_quantized_verifier(
    dspec: ModelSpec,
    dparams,
    vspec: ModelSpec,
    bits: int,
    *,
    noise_eps: float = 0.0,
    seed: int = 1,
    group_size: int = 128,
):
    """7B-class INT8/INT4 verifier from the embedded construction.

    Exercises the BASELINE.json quantized configs (LLaMA-2-7B INT8/INT4):
    every projection streams int8/int4 bytes through the quantized matmul
    path. The verifier is NOT the draft's exact function here — quantization
    error (plus optional explicit ``noise_eps`` on the host leaves)
    decorrelates it from the draft, so acceptance is a measured property of
    two genuinely different models, addressing the round-1 "embedded
    self-draft" critique.

    Build path: host numpy leaves -> quantize on the CPU backend (a 7B bf16
    verifier would not fit HBM) -> upload int8/int4 carriers.
    """
    import numpy as _np

    vnp = embed_draft_in_verifier(dspec, dparams, vspec, as_numpy=True)
    if noise_eps:
        rng = _np.random.RandomState(seed)
        def addnoise(leaf):
            if leaf.ndim < 2:
                return leaf
            std = float(leaf.std())
            if std == 0.0:
                return leaf
            leaf += rng.standard_normal(leaf.shape).astype(_np.float32) * (
                noise_eps * std
            )
            return leaf
        vnp = jax.tree.map(addnoise, vnp)
    return quantize_and_upload(vnp, vspec, bits, group_size)


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



def _fast_quant_leaf(shape, block, bits, group_size=128):
    """Quantize an embedded-construction leaf WITHOUT touching its zeros.

    The logical leaf [*B, D, R] (contraction flattened to D, rest flattened
    to R) is zero outside the corner block [..., :db, :rb] = ``block``.
    Produces carriers BIT-IDENTICAL to ``weight_only.quantize`` of the full
    leaf (gated by tests/test_spec_pair.py): zero groups encode analytically
    (int8: q=0, scale=1e-12; int4: byte 0x80 = packed (0,0) nibbles,
    scale=1e-12, low offset 0 / high offset 8e-12), so only the draft-sized
    block is actually quantized — seconds instead of minutes at 7B.
    """
    from flexflow_tpu.quant.weight_only import QuantizedArray, _pick_group_size

    lead = tuple(shape[:-2])
    d, r = shape[-2], shape[-1]
    db, rb = block.shape[-2], block.shape[-1]
    g = _pick_group_size(d, group_size, bits)
    assert db % g == 0, (db, g)
    rest_pad = (-r) % 512 if (d >= 1024 and r >= 512) else 0
    rp = r + rest_pad
    blk = block.astype(np.float32)

    if bits == 8:
        q = np.zeros(lead + (d, rp), np.int8)
        scale = np.full(lead + (d // g, rp), 1e-12, np.float32)
        bg = blk.reshape(lead + (db // g, g, rb))
        amax = np.abs(bg).max(axis=-2, keepdims=True)
        s = np.maximum(amax / 127.0, 1e-12)
        qb = np.clip(np.round(bg / s), -127, 127).astype(np.int8)
        q[..., :db, :rb] = qb.reshape(lead + (db, rb))
        scale[..., : db // g, :rb] = s[..., 0, :]
        return QuantizedArray(
            q=jnp.asarray(q), scale=jnp.asarray(scale), offset=None,
            bits=8, group_size=g, shape=tuple(shape), batch_dims=len(lead),
            contract_dims=1, dtype=jnp.bfloat16, rest_pad=rest_pad,
        )

    assert db <= d // 2, "draft block must live in the low half-plane"
    # background: qv == 0 in both nibbles -> byte 0 | ((0 ^ 8) << 4) = 0x80
    q = np.full(lead + (d // 2, rp), 0x80, np.uint8)
    scale = np.full(lead + (d // g, rp), 1e-12, np.float32)
    offset = np.zeros(lead + (d // g, rp), np.float32)
    gh = (d // g) // 2
    offset[..., gh:, :] = 8.0 * 1e-12
    bg = blk.reshape(lead + (db // g, g, rb))
    lo = bg.min(axis=-2, keepdims=True)
    hi = bg.max(axis=-2, keepdims=True)
    s = np.maximum((hi - lo) / 15.0, 1e-12)
    qv = np.clip(np.round((bg - lo) / s), 0, 15).astype(np.uint8)
    # draft rows pair with zero high-half rows: byte = qv | 0x80
    q[..., :db, :rb] = (qv.reshape(lead + (db, rb)) | 0x80).astype(np.uint8)
    scale[..., : db // g, :rb] = s[..., 0, :]
    offset[..., : db // g, :rb] = lo[..., 0, :]
    return QuantizedArray(
        q=jnp.asarray(q), scale=jnp.asarray(scale),
        offset=jnp.asarray(offset),
        bits=4, group_size=g, shape=tuple(shape), batch_dims=len(lead),
        contract_dims=1, dtype=jnp.bfloat16, rest_pad=rest_pad,
    )


def fast_quantized_verifier(dspec: ModelSpec, dparams, vspec: ModelSpec,
                            bits: int, group_size: int = 128):
    """Quantized 7B verifier built directly from the DRAFT's weights.

    Same carriers as ``quantize_and_upload(embed_draft_in_verifier(...))``
    — validated leaf-for-leaf by tests/test_spec_pair.py — but with no
    27 GB host intermediate and no full-leaf quantization pass.
    """
    import dataclasses as _dc

    _check(dspec, vspec)
    dd, dv = dspec.hidden_size, vspec.hidden_size
    ld, lv = dspec.num_layers, vspec.num_layers
    hd, kd = dspec.num_heads, dspec.num_kv_heads
    fd, fv = dspec.intermediate_size, vspec.intermediate_size
    dh = dspec.head_dim
    alpha = float(np.sqrt(dd / dv))
    dl = {k: np.asarray(v, np.float32) for k, v in dparams["layers"].items()}
    tpu = jax.devices()[0]

    def pad_layers(block):
        out = np.zeros((lv,) + block.shape[1:], np.float32)
        out[:ld] = block
        return out

    # logical (unit) shapes of the verifier leaves, as quantize() sees them
    logical = {
        "wq": (lv, dv, vspec.num_heads, dh),
        "wk": (lv, dv, vspec.num_kv_heads, dh),
        "wv": (lv, dv, vspec.num_kv_heads, dh),
        "wo": (lv, vspec.num_heads, dh, dv),
        "wg": (lv, dv, fv),
        "wu": (lv, dv, fv),
        "wd": (lv, fv, dv),
        "lm_head": (dv, vspec.vocab_size),
    }

    def quant(name, flat_shape, block):
        qa = _fast_quant_leaf(flat_shape, block, bits, group_size)
        return _dc.replace(
            qa,
            q=jax.device_put(qa.q, tpu),
            scale=jax.device_put(qa.scale, tpu),
            offset=(
                jax.device_put(qa.offset, tpu)
                if qa.offset is not None else None
            ),
            shape=logical[name],
            contract_dims=2 if name == "wo" else 1,
        )

    layers = {
        "wq": quant("wq", (lv, dv, vspec.num_heads * dh),
                    pad_layers(dl["wq"].reshape(ld, dd, hd * dh))),
        "wk": quant("wk", (lv, dv, vspec.num_kv_heads * dh),
                    pad_layers(dl["wk"].reshape(ld, dd, kd * dh))),
        "wv": quant("wv", (lv, dv, vspec.num_kv_heads * dh),
                    pad_layers(dl["wv"].reshape(ld, dd, kd * dh))),
        "wo": quant("wo", (lv, vspec.num_heads * dh, dv),
                    pad_layers(dl["wo"].reshape(ld, hd * dh, dd))),
        "wg": quant("wg", (lv, dv, fv), pad_layers(dl["wg"])),
        "wu": quant("wu", (lv, dv, fv), pad_layers(dl["wu"])),
        "wd": quant("wd", (lv, fv, dv), pad_layers(dl["wd"])),
    }

    ln1 = np.ones((lv, dv), np.float32)
    ln1[:ld, :dd] = dl["ln1_scale"] * alpha
    ln1[:ld, dd:] = 0.0
    ln2 = np.ones((lv, dv), np.float32)
    ln2[:ld, :dd] = dl["ln2_scale"] * alpha
    ln2[:ld, dd:] = 0.0
    layers["ln1_scale"] = jax.device_put(jnp.asarray(ln1, jnp.bfloat16), tpu)
    layers["ln2_scale"] = jax.device_put(jnp.asarray(ln2, jnp.bfloat16), tpu)

    head = dparams.get("lm_head")
    if head is None:
        head = jnp.asarray(dparams["embed_tokens"], jnp.float32).T
    emb = np.zeros((vspec.vocab_size, dv), np.float32)
    emb[:, :dd] = np.asarray(dparams["embed_tokens"], np.float32)
    fn = np.zeros((dv,), np.float32)
    fn[:dd] = np.asarray(dparams["final_norm_scale"], np.float32) * alpha
    return {
        "embed_tokens": jax.device_put(jnp.asarray(emb, jnp.bfloat16), tpu),
        "layers": layers,
        "final_norm_scale": jax.device_put(
            jnp.asarray(fn, jnp.bfloat16), tpu),
        "lm_head": quant("lm_head", (dv, vspec.vocab_size),
                         np.asarray(head, np.float32)),
    }


def quantization_matched_draft(dspec: ModelSpec, dparams, bits: int,
                               group_size: int = 128, dtype=jnp.bfloat16):
    """Draft carrying EXACTLY the verifier's quantization error.

    The embedded verifier leaf is zero outside the draft block and the
    block is group-aligned (``_fast_quant_leaf`` asserts ``db % g == 0``),
    so its per-(group, column) scales over the draft rows equal those of
    quantizing the draft leaf alone with the same grouping. Hence
    ``dequantize(quantize(draft_leaf))`` reproduces the verifier's
    dequantized draft block bit-for-bit, and a draft built from those
    dequantized values diverges from the quantized verifier only through
    extra-dimension leakage plus whatever ``perturb_params`` noise is
    added — a controlled, published-pair-like agreement regime. Without
    this matching, the draft's fresh bf16 weights differ from the
    verifier by the (uncorrelated) quantization error itself: measured
    on-chip round 3 at INT4 that collapsed greedy agreement to 0.35 on
    the bench's (degenerate-loop) continuations -> 1.9 verified
    tokens/step and a 0.795x spec "speedup".
    """
    from flexflow_tpu.quant.weight_only import dequantize, quantize

    dl = dparams["layers"]

    def match(leaf, contract_dims=1):
        qa = quantize(jnp.asarray(leaf, jnp.float32), bits,
                      group_size=group_size, batch_dims=1,
                      contract_dims=contract_dims, compute_dtype=dtype)
        return dequantize(qa).astype(dtype)

    layers = dict(dl)
    for k in ("wq", "wk", "wv", "wg", "wu", "wd"):
        layers[k] = match(dl[k])
    layers["wo"] = match(dl["wo"], contract_dims=2)

    head = dparams.get("lm_head")
    if head is None:  # tied draft embedding: the verifier quantizes the
        head = jnp.asarray(dparams["embed_tokens"], jnp.float32).T
    qa = quantize(jnp.asarray(head, jnp.float32), bits,
                  group_size=group_size, batch_dims=0, contract_dims=1,
                  compute_dtype=dtype)
    out = dict(dparams)
    out["layers"] = layers
    out["lm_head"] = dequantize(qa).astype(dtype)
    return out


def markov_batch(rng: np.ndarray, perm: np.ndarray, batch: int, seq: int,
                 p_follow: float = 0.95):
    """Seeded order-1 Markov sequences: next = perm[cur] w.p. ``p_follow``,
    else uniform. The sharpening corpus (see :func:`sharpen_draft`)."""
    v = perm.shape[0]
    out = np.empty((batch, seq), np.int32)
    out[:, 0] = rng.randint(1, v, size=batch)
    follow = rng.rand(batch, seq) < p_follow
    rand_next = rng.randint(1, v, size=(batch, seq))
    for t in range(1, seq):
        out[:, t] = np.where(follow[:, t], perm[out[:, t - 1]],
                             rand_next[:, t])
    return out


def sharpen_draft(dspec: ModelSpec, dparams, *, steps: int = 800,
                  batch: int = 16, seq: int = 256, lr: float = 1e-3,
                  seed: int = 11, p_follow: float = 0.95,
                  checkpoints: Sequence[int] = (),
                  log_fn=None):
    """Briefly train the draft on a seeded synthetic bigram corpus.

    Why: a random-INIT pair is argmax-tie-dense (near-uniform logits), so
    the 20-token prefix gate between the decode- and tree-verify-shaped
    programs fails on pure numeric jitter — flips the REFERENCE never sees
    because trained checkpoints are confident. ~150 Adam steps on an
    order-1 Markov stream make the model confidently predict ``perm[cur]``
    from ANY context (a learned bigram map), giving trained-model-like
    argmax margins; verifier confidence then comes for free through the
    embedding construction. Acceptance is re-calibrated afterwards with
    ``perturb_params`` noise (the measured knob), so the published-pair
    agreement regime is preserved while tie flips vanish.

    Fully deterministic from ``seed``; runs in ~seconds on one chip.
    """
    from flexflow_tpu.models.decoder import forward as decoder_forward
    from flexflow_tpu.training.losses import sparse_categorical_crossentropy
    from flexflow_tpu.training.optimizers import AdamOptimizer

    rng = np.random.RandomState(seed)
    perm = rng.permutation(dspec.vocab_size).astype(np.int32)
    params32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), dparams)
    opt = AdamOptimizer(lr=lr)
    state = opt.init(params32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, state, toks):
        def loss_fn(p):
            positions = jnp.broadcast_to(
                jnp.arange(toks.shape[1], dtype=jnp.int32)[None],
                toks.shape)
            logits, _ = decoder_forward(dspec, p, toks, positions)
            return sparse_categorical_crossentropy(
                logits[:, :-1], toks[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = opt.update(grads, state, params)
        return params, state, loss

    loss = None
    ckpts = {}
    for i in range(steps):
        toks = jnp.asarray(
            markov_batch(rng, perm, batch, seq, p_follow))
        params32, state, loss = step(params32, state, toks)
        if (i + 1) % 5 == 0:
            # block: an unbounded dispatch queue holds each queued step's
            # ~1 GB logits transient and OOMs HBM (observed at ~step 300)
            jax.block_until_ready(loss)
        if log_fn and (i + 1) % 50 == 0:
            log_fn(f"sharpen step {i+1}/{steps} loss {float(loss):.3f}")
        if (i + 1) in checkpoints:
            # earlier checkpoints of the SAME run = the weak/strong same-
            # family relationship of real (draft, verifier) pairs; the
            # step gap is the acceptance knob
            ckpts[i + 1] = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16), params32)
    final = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params32)
    if checkpoints:
        ckpts[steps] = final
        return final, ckpts
    return final
