"""Stochastic speculative verification (sampling-mode SpecInfer).

The greedy walk in ``speculative.py`` accepts a draft token iff it equals the
LLM argmax — lossless for greedy decoding but wrong when requests sample
(temperature/top-p/top-k). This module adds multi-round stochastic
verification over the token tree (the reference ships the greedy gate only —
src/runtime/request_manager.cc ``traverse_verify_tree`` — so this exceeds
reference capability).

The draft proposes each node's children DETERMINISTICALLY (beam-search top-k
of the SSM), so the proposal distribution for child token ``x`` is a delta at
``x``, and the exact accept rule ``min(1, p(x)/q(x))`` with ``q = onehot(x)``
becomes:

    accept x with probability p(x);
    on rejection, condition the target: p <- normalize(p with p[x] = 0);
    if no child survives, emit a sample from the final residual.

This is a decomposition of sampling from ``p`` into sequential Bernoulli
trials — accept x1 w.p. p(x1); else x2 w.p. p(x2)/(1-p(x1)) so the marginal
of emitting x2 is exactly p(x2); the residual sample covers the rest — hence
every emitted token is distributed EXACTLY per the target distribution at its
node, for any draft tree. (The classic ``min(1, p/q)`` rule with the SSM's
dense q is exact only for proposals SAMPLED from q; applying it to top-k
proposals over-accepts low-p tokens the draft is overconfident about.)

Greedy rows need no special casing: ``ops.sampling.target_probs`` gives them
a one-hot target, under which accept-with-p(x) is 1 iff ``x`` equals the
argmax and the residual stays the same one-hot — the walk reproduces the
lossless greedy walk bit-for-bit (pinned by tests/test_spec_sampling.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def tree_sample_walk(
    p_probs: jnp.ndarray,  # [B, T, V] f32 target dist at every tree slot
    tree_tokens: jnp.ndarray,  # [B, T] i32 (slot 0 = root)
    tree_parents: jnp.ndarray,  # [B, T] i32 (parent slot; -1 for root)
    key: jax.Array,
    *,
    width: int,
    depth: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Walk the verified tree with stochastic acceptance.

    Returns ``(produced [B, depth+1], n_acc [B], from_slots [B, T])`` with the
    same contract as the greedy walk in ``SpecEngine``: ``produced[:, :n_acc]``
    are the emitted tokens (last one is the bonus/residual sample, whose KV is
    not in the cache), and ``from_slots`` feeds the KV commit (identity beyond
    the accepted path).
    """
    b, t, v = p_probs.shape
    assert t == 1 + width * depth

    produced = jnp.zeros((b, depth + 1), jnp.int32)
    from_slots = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[None], (b, t)
    )
    cur = jnp.zeros((b,), jnp.int32)
    alive = jnp.ones((b,), bool)
    n_acc = jnp.zeros((b,), jnp.int32)
    p = p_probs[:, 0]  # residual target at the current node

    for i in range(depth + 1):
        accepted = jnp.zeros((b,), bool)
        acc_tok = jnp.zeros((b,), jnp.int32)
        acc_slot = jnp.zeros((b,), jnp.int32)
        if i < depth:
            for j in range(width):
                c = 1 + i * width + j  # candidate child slot at depth i+1
                x = tree_tokens[:, c]
                is_child = (tree_parents[:, c] == cur) & alive & ~accepted
                px = jnp.take_along_axis(p, x[:, None], axis=1)[:, 0]
                key, sub = jax.random.split(key)
                u = jax.random.uniform(sub, (b,))
                acc = is_child & (u < px)
                accepted |= acc
                acc_tok = jnp.where(acc, x, acc_tok)
                acc_slot = jnp.where(acc, jnp.int32(c), acc_slot)
                # condition the target on the rejection: zero out x
                rej = is_child & ~acc
                onehot_x = jax.nn.one_hot(x, v, dtype=p.dtype)
                r = p * (1.0 - onehot_x)
                z = jnp.sum(r, axis=-1, keepdims=True)
                p_res = jnp.where(z > 1e-9, r / jnp.maximum(z, 1e-9), p)
                p = jnp.where(rej[:, None], p_res, p)

        # emit: accepted child token, else a sample from the residual target
        # (the bonus token — its KV is not in the cache; it seeds the next
        # iteration's root exactly like the greedy walk's last argmax)
        key, sub = jax.random.split(key)
        logp = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-38)), -jnp.inf)
        bonus = jax.random.categorical(sub, logp, axis=-1).astype(jnp.int32)
        emit = jnp.where(accepted, acc_tok, bonus)
        produced = produced.at[:, i].set(emit)
        n_acc = n_acc + alive.astype(jnp.int32)
        if i < depth:
            from_slots = from_slots.at[:, i + 1].set(
                jnp.where(accepted, acc_slot, jnp.int32(i + 1))
            )
            # moving to the accepted child refreshes the target there
            p_child = jnp.take_along_axis(
                p_probs, acc_slot[:, None, None], axis=1
            )[:, 0]
            p = jnp.where(accepted[:, None], p_child, p)
            cur = jnp.where(accepted, acc_slot, cur)
            alive = alive & accepted

    return produced, n_acc, from_slots
