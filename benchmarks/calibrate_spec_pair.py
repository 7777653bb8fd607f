"""Calibrate the synthetic (verifier, draft) pair's per-token agreement.

Builds the embedded pair (benchmarks/spec_pair.py), generates a greedy
continuation with the verifier, then measures teacher-forced argmax agreement
of noise-perturbed drafts on that on-distribution context — the knob that
sets speculative acceptance. Prints agreement per noise level; pick the eps
whose agreement matches real published pairs (~0.75-0.85/token).

    python -u -m benchmarks.calibrate_spec_pair
"""


from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.spec_pair import embed_draft_in_verifier, perturb_params
from flexflow_tpu import specs
from flexflow_tpu.models import decoder
from flexflow_tpu.models import params as params_lib

DRAFT = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=32000, hidden_size=768,
    num_layers=12, num_heads=12, num_kv_heads=12, head_dim=64,
    intermediate_size=3072, max_position_embeddings=2048, norm_eps=1e-6,
)
VERIFIER = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=32000, hidden_size=2048,
    num_layers=24, num_heads=32, num_kv_heads=32, head_dim=64,
    intermediate_size=5632, max_position_embeddings=2048, norm_eps=1e-6,
)


def build_pair(seed=0, dtype=jnp.bfloat16):
    dparams = params_lib.init_params(DRAFT, jax.random.PRNGKey(seed), dtype)
    vparams = embed_draft_in_verifier(DRAFT, dparams, VERIFIER, dtype)
    return dparams, vparams


def main():
    print("devices:", jax.devices(), flush=True)
    dparams, vparams = build_pair()

    # greedy continuation by the verifier from a tiny random prompt
    rng = np.random.RandomState(0)
    n_ctx, n_gen = 8, 192
    seq = list(rng.randint(1, 32000, size=n_ctx))
    cache = decoder.init_kv_cache(VERIFIER, 1, 512, jnp.bfloat16)

    @jax.jit
    def step(params, tokens, cache, lens):
        logits, cache = decoder.forward_cached(
            VERIFIER, params, tokens, cache, lens)
        return jnp.argmax(logits[:, -1], -1), cache

    lens = jnp.zeros((1,), jnp.int32)
    toks = jnp.asarray([seq], jnp.int32)
    nxt, cache = step(vparams, toks, cache, lens)
    lens = lens + n_ctx

    @jax.jit
    def step1(params, tok, cache, lens):
        logits, cache = decoder.forward_cached(
            VERIFIER, params, tok[:, None], cache, lens)
        return jnp.argmax(logits[:, 0], -1), cache

    for _ in range(n_gen):
        seq.append(int(nxt[0]))
        nxt, cache = step1(vparams, nxt, cache, lens)
        lens = lens + 1
    seq.append(int(nxt[0]))
    print(f"generated {n_gen} on-distribution tokens", flush=True)

    # teacher-forced agreement of perturbed drafts on that sequence
    tokens = jnp.asarray([seq], jnp.int32)
    positions = jnp.arange(len(seq), dtype=jnp.int32)[None]
    v_logits, _ = decoder.forward(VERIFIER, vparams, tokens, positions)
    v_arg = np.asarray(jnp.argmax(v_logits[0, n_ctx:-1], -1))

    base_logits, _ = decoder.forward(DRAFT, dparams, tokens, positions)
    base_arg = np.asarray(jnp.argmax(base_logits[0, n_ctx:-1], -1))
    print(f"eps=0.000 agreement={np.mean(base_arg == v_arg):.3f} "
          "(embedding sanity: should be ~1.0)", flush=True)

    for eps in (0.005, 0.01, 0.02, 0.04, 0.08):
        dp = perturb_params(dparams, eps, jax.random.PRNGKey(42))
        logits, _ = decoder.forward(DRAFT, dp, tokens, positions)
        arg = np.asarray(jnp.argmax(logits[0, n_ctx:-1], -1))
        print(f"eps={eps:.3f} agreement={np.mean(arg == v_arg):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
