"""Token-tree merging for multi-SSM speculation (reference merge_dfs_trees).

The reference verifies ALL draft models' speculation trees in one LLM pass:
each SSM's beam tree is flattened depth-first and merged into a single token
tree, deduplicating shared prefixes, capped at MAX_SPEC_TREE_TOKEN_NUM
(/root/reference/src/runtime/request_manager.cc ``merge_dfs_trees`` /
``traverse_beam_tree``, batch_config.h:77). This module is the host-side
equivalent: pure numpy over the per-engine (tokens, parents) tree layout of
``SpecEngine.draft_tree``.

Merged trees are irregular, so they flow through the engine's generic
verify/commit path (explicit parents + ancestor matrix) rather than the
fixed width*depth slot layout of the single-SSM fused step.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def merge_dfs_trees(
    trees: Sequence[Tuple[np.ndarray, np.ndarray]],
    cap: int,
    pad_to: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge per-SSM trees (same root) into one deduplicated token tree.

    trees: per SSM, ``(tokens [T_i], parents [T_i])`` for ONE request; slot 0
        is the shared root (the last committed token) with parent -1; parents
        always precede children.
    cap: max merged nodes (root included) — the reference's spec-tree cap.
    pad_to: fixed output size for compile-shape stability; padding slots get
        token 0, parent -2 (matches no node, so they are never accepted and
        attend only themselves during verification).

    Returns ``(tokens [pad_to], parents [pad_to], depths [pad_to])``.
    """
    assert cap <= pad_to
    out_tokens = [int(trees[0][0][0])]
    out_parents = [-1]
    out_depths = [0]
    # (merged parent, token) -> merged slot: shared-prefix dedup
    index = {}
    for tokens, parents in trees:
        assert int(tokens[0]) == out_tokens[0], "trees must share the root"
        slot_map = {0: 0}  # this tree's slot -> merged slot
        for s in range(1, len(tokens)):
            p = int(parents[s])
            if p not in slot_map:  # parent's subtree was dropped at the cap
                continue
            mp = slot_map[p]
            key = (mp, int(tokens[s]))
            if key in index:
                slot_map[s] = index[key]
                continue
            if len(out_tokens) >= cap:
                continue
            m = len(out_tokens)
            out_tokens.append(int(tokens[s]))
            out_parents.append(mp)
            out_depths.append(out_depths[mp] + 1)
            index[key] = m
            slot_map[s] = m

    t = np.zeros(pad_to, np.int32)
    p = np.full(pad_to, -2, np.int32)
    d = np.zeros(pad_to, np.int32)
    n = len(out_tokens)
    t[:n] = out_tokens
    p[:n] = out_parents
    d[:n] = out_depths
    return t, p, d


def merge_batch(
    per_ssm: Sequence[Tuple[np.ndarray, np.ndarray]],
    cap: int,
    pad_to: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched merge: per_ssm is a list of ``(tokens [B, T_i], parents
    [B, T_i])``; returns ``(tokens, parents, depths)`` each [B, pad_to]."""
    b = per_ssm[0][0].shape[0]
    toks, pars, deps = [], [], []
    for r in range(b):
        t, p, d = merge_dfs_trees(
            [(tk[r], pr[r]) for tk, pr in per_ssm], cap, pad_to
        )
        toks.append(t)
        pars.append(p)
        deps.append(d)
    return np.stack(toks), np.stack(pars), np.stack(deps)
