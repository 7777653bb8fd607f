"""Tree-based speculative decoding (SpecInfer): SSM draft + token-tree verify.

TPU-native rebuild of the reference's speculative serving loop
(/root/reference/src/runtime/request_manager.cc:3083 ``serve_spec_infer``):

- draft phase = beam-tree expansion on the small SSM — the reference's
  SpecIncMultiHeadSelfAttention + BeamTopK loop over depths
  (request_manager.cc:3148-3160, src/ops/spec_inc_multihead_self_attention.cu,
  src/ops/beam_topk.cu). Here each depth is one jitted cached-forward of the
  [B, W] beam tips, writing draft KV into caller-chosen tree slots with an
  explicit ancestor kv-mask, followed by on-device BeamTopK expansion.
- tree flatten/merge = ``prepare_next_batch_verify``'s ``traverse_beam_tree`` +
  ``merge_dfs_trees`` (request_manager.cc:1923, ~1990-2350). Our tree layout is
  fixed: slot 0 = root (last committed token), slot 1+(d-1)*W+w = beam w at
  depth d; ancestor sets double as the reference's ``BitMask``
  (batch_config.h:122-136).
- verify phase = TreeIncMultiHeadSelfAttention: ONE cached forward of the LLM
  over all tree tokens with the tree-topology mask
  (src/ops/tree_inc_multihead_self_attention.cu), greedy argmax per node.
- accept/commit = the reference's ``committed_tokens`` (from, to) KV
  compaction (batch_config.h:156-163): the host walks the tree along the LLM's
  greedy choices (lossless — output is bit-identical to incremental greedy
  decoding), then one jitted gather/scatter compacts accepted KV entries to
  contiguous positions in BOTH the LLM and draft caches.

Per-iteration host<->device traffic: [B, W] tokens/parents per draft depth and
[B, T] verify argmaxes — the analog of the reference shipping BatchConfigs
by-value through Legion futures.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.models import decoder
from flexflow_tpu.models.decoder import KVCache
from flexflow_tpu.ops import sampling as sampling_lib
from flexflow_tpu.serving.spec_sampling import tree_sample_walk
from flexflow_tpu.specs import ModelSpec

# Reference caps: beam width <= 3, depth <= 8, tree <= 64 tokens
# (batch_config.h:75-77,196-197).
MAX_SPEC_TREE_TOKEN_NUM = 64


def tree_size(width: int, depth: int) -> int:
    return 1 + width * depth


def make_depths_vec(width: int, depth: int) -> jnp.ndarray:
    """Per-tree-slot depth [tree]: slot 0 = 0; 1+(d-1)*W+w = d."""
    t = tree_size(width, depth)
    depths_vec = jnp.zeros((t,), jnp.int32)
    for _d in range(1, depth + 1):
        depths_vec = depths_vec.at[1 + (_d - 1) * width: 1 + _d * width].set(_d)
    return depths_vec


def build_draft_phase(ssm_spec: ModelSpec, width: int, depth: int):
    """Build the device-resident draft-tree expansion (traceable function).

    Returns ``draft_phase(ssm_params, ssm_cache, cache_lens, roots) ->
    (tree_tokens [B,T], tree_parents [B,T], anc_self [B,T,T],
    (buf_k, buf_v) [L,B,T,KH,D])``. The tree KV stays in-register (never
    written to the draft cache); the depth loop is statically unrolled
    (depth <= 8) so tree-buffer writes are static-index updates.
    Shared by SpecEngine and PipelineSpecEngine (pp_spec.py)."""
    w, dmax = width, depth
    tree = tree_size(w, dmax)
    depths_vec = make_depths_vec(w, dmax)

    def draft_phase(ssm_params, ssm_cache, cache_lens, roots, staged=None,
                    blk=None):
        """``staged``: in-register KV of tokens accepted EARLIER IN THIS
        HORIZON but not yet committed to the cache (the staged-horizon
        flow — one cache write per horizon instead of per iteration).
        Two forms:

        - (stage_k, stage_v, counts): COMPACTED staging — stage_k/v
          [L, B, C, KH, D]; column j holds the token at absolute position
          cache_lens + j, valid iff j < counts[b].
        - (stage_k, stage_v, valid [B, C], pos [B, C]) with ``blk``: RAW
          staging — the horizon's tree blocks stacked uncompacted. The
          draft WRITES its tree KV straight into columns
          [blk, blk+tree) of the staging buffers and attends through ONE
          buffer (mask = prior accepted columns + in-block ancestors) —
          no per-depth concatenation of staging and tree buffers (the
          concats cost ~2-4 ms/iteration at 7B; probe_r5_specattr r5).
          Returns the UPDATED staging buffers as the kv aux.
        """
        b = cache_lens.shape[0]
        sl, skh, sd = (ssm_spec.num_layers,
                       ssm_spec.num_kv_heads, ssm_spec.head_dim)
        cdt = ssm_cache.k.dtype
        raw = staged is not None and len(staged) == 4
        if staged is None:
            base_lens = cache_lens
            s_k = s_v = None
            cap = 0
        elif raw:
            assert blk is not None, "raw staging needs the block offset"
            s_k, s_v, stage_valid, stage_pos = staged
            cap = s_k.shape[2]
            counts = jnp.sum(stage_valid.astype(jnp.int32), axis=1)
            base_lens = cache_lens + counts
        else:
            s_k, s_v, counts = staged
            cap = s_k.shape[2]
            base_lens = cache_lens + counts
            stage_cols = jnp.arange(cap, dtype=jnp.int32)
            stage_valid = stage_cols[None, :] < counts[:, None]  # [B, C]
            stage_pos = cache_lens[:, None] + stage_cols[None, :]

        if staged is None:
            logits, (k0, v0) = decoder.forward_cached(
                ssm_spec, ssm_params, roots[:, None], ssm_cache,
                cache_lens, write_cache=False)
        else:
            logits, (k0, v0) = decoder.forward_cached(
                ssm_spec, ssm_params, roots[:, None], ssm_cache,
                cache_lens, positions=base_lens[:, None],
                tree_mask=jnp.ones((b, 1, 1), bool),
                extra_kv=(s_k, s_v), extra_mask=stage_valid[:, None, :],
                extra_positions=stage_pos, write_cache=False)
        if raw:
            # block-resident tree KV: the staging buffers double as the
            # tree buffers for this iteration's block
            s_k = jax.lax.dynamic_update_slice(
                s_k, k0.astype(cdt), (0, 0, blk, 0, 0))
            s_v = jax.lax.dynamic_update_slice(
                s_v, v0.astype(cdt), (0, 0, blk, 0, 0))
            # position scaffolding for in-block attention
            pos_all = jax.lax.dynamic_update_slice(
                stage_pos, base_lens[:, None] + depths_vec[None, :],
                (0, blk))
            buf_k = buf_v = None
        else:
            buf_k = jnp.zeros((sl, b, tree, skh, sd), cdt)
            buf_v = jnp.zeros((sl, b, tree, skh, sd), cdt)
            buf_k = buf_k.at[:, :, 0:1].set(k0.astype(cdt))
            buf_v = buf_v.at[:, :, 0:1].set(v0.astype(cdt))
        logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), -1)
        beam_logp, beam_tokens = jax.lax.top_k(logp, w)
        beam_tokens = beam_tokens.astype(jnp.int32)

        anc = jnp.zeros((b, w, tree), bool).at[:, :, 0].set(True)
        tree_tokens = jnp.zeros((b, tree), jnp.int32).at[:, 0].set(roots)
        tree_parents = jnp.full((b, tree), -1, jnp.int32)
        abs_parents = jnp.zeros((b, w), jnp.int32)  # parents of cur beams
        eye_w = jnp.broadcast_to(jnp.eye(w, dtype=bool)[None], (b, w, w))

        for d in range(1, dmax + 1):
            base = 1 + (d - 1) * w
            tree_tokens = tree_tokens.at[:, base:base + w].set(beam_tokens)
            tree_parents = tree_parents.at[:, base:base + w].set(
                abs_parents if d > 1 else jnp.zeros((b, w), jnp.int32))
            positions = jnp.broadcast_to(
                (base_lens + d)[:, None], (b, w)).astype(jnp.int32)
            if staged is None:
                ex_kv = (buf_k, buf_v)
                ex_mask = anc
                ex_pos = cache_lens[:, None] + depths_vec[None, :]
            elif raw:
                # one buffer: prior accepted columns + in-block ancestors
                ex_kv = (s_k, s_v)
                ex_mask = jax.lax.dynamic_update_slice(
                    jnp.broadcast_to(stage_valid[:, None, :], (b, w, cap)),
                    anc, (0, 0, blk))
                ex_pos = pos_all
            else:
                ex_kv = (jnp.concatenate([s_k, buf_k], axis=2),
                         jnp.concatenate([s_v, buf_v], axis=2))
                ex_mask = jnp.concatenate(
                    [jnp.broadcast_to(stage_valid[:, None, :], (b, w, cap)),
                     anc], axis=-1)
                ex_pos = jnp.concatenate(
                    [stage_pos,
                     base_lens[:, None] + depths_vec[None, :]], axis=1)
            logits, (kd, vd) = decoder.forward_cached(
                ssm_spec, ssm_params, beam_tokens, ssm_cache,
                cache_lens, positions=positions, tree_mask=eye_w,
                extra_kv=ex_kv, extra_mask=ex_mask,
                # tree slot c sits at lens + depth(c) (alibi)
                extra_positions=ex_pos,
                write_cache=False)
            if raw:
                s_k = jax.lax.dynamic_update_slice(
                    s_k, kd.astype(cdt), (0, 0, blk + base, 0, 0))
                s_v = jax.lax.dynamic_update_slice(
                    s_v, vd.astype(cdt), (0, 0, blk + base, 0, 0))
            else:
                buf_k = buf_k.at[:, :, base:base + w].set(kd.astype(cdt))
                buf_v = buf_v.at[:, :, base:base + w].set(vd.astype(cdt))
            if d == dmax:
                break
            self_slots = base + jnp.arange(w, dtype=jnp.int32)
            anc_self = anc | (
                jnp.arange(tree)[None, None, :] == self_slots[None, :, None]
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            cand_logp, cand_tok = jax.lax.top_k(logp, w)  # [B, W, W]
            total = beam_logp[:, :, None] + cand_logp
            new_logp, flat_idx = jax.lax.top_k(total.reshape(b, w * w), w)
            parents = (flat_idx // w).astype(jnp.int32)
            beam_tokens = jnp.take_along_axis(
                cand_tok.reshape(b, w * w), flat_idx, axis=-1
            ).astype(jnp.int32)
            beam_logp = new_logp
            anc = jnp.take_along_axis(anc_self, parents[:, :, None], axis=1)
            abs_parents = base + parents

        # --- ancestor matrix from parents (static loop; parent < child) ---
        anc_self = jnp.zeros((b, tree, tree), bool)
        anc_self = anc_self.at[:, 0, 0].set(True)
        for c in range(1, tree):
            parent = tree_parents[:, c]  # [B], always < c
            parent_row = jnp.take_along_axis(
                anc_self, parent[:, None, None].clip(0)
                * jnp.ones((1, 1, tree), jnp.int32), axis=1)[:, 0]
            row = parent_row.at[:, c].set(True)
            anc_self = anc_self.at[:, c].set(row)
        if raw:
            # raw mode: the staging buffers ARE the tree buffers
            return tree_tokens, tree_parents, anc_self, (s_k, s_v)
        return tree_tokens, tree_parents, anc_self, (buf_k, buf_v)

    return draft_phase


def commit_from_buffer(cache, cache_lens, buf_k, buf_v, path_slots):
    """Write the accepted tree columns from in-register buffers into the
    cache at [lens, lens+n) — one batch-uniform window commit (n = depth+1
    static; junk beyond n_acc is overwritten by the next iteration before
    it can ever be attended)."""
    idx = path_slots[None, :, :, None, None]  # [1, B, n, 1, 1]
    gk = jnp.take_along_axis(buf_k, idx, axis=2)  # [L, B, n, KH, D]
    gv = jnp.take_along_axis(buf_v, idx, axis=2)
    upd_k = gk.transpose(0, 1, 3, 4, 2).astype(cache.k.dtype)
    upd_v = gv.transpose(0, 1, 3, 4, 2).astype(cache.v.dtype)
    upd_k, upd_v = jax.lax.optimization_barrier((upd_k, upd_v))
    ck, cv = decoder.commit_kv_windows(
        cache.k, cache.v, upd_k, upd_v, cache_lens
    )
    return KVCache(k=ck, v=cv)


def greedy_accept_walk(expected, tree_tokens, tree_parents, depth):
    """Greedy tree acceptance: walk the tree along the verifier's argmax
    choices (lossless vs incremental greedy decoding).

    Returns (produced [B, depth+1], n_acc [B], from_slots [B, tree]).
    """
    b, tree = tree_tokens.shape
    cur = jnp.zeros((b,), jnp.int32)
    alive = jnp.ones((b,), bool)
    n_acc = jnp.ones((b,), jnp.int32)
    produced = jnp.zeros((b, depth + 1), jnp.int32)
    from_slots = jnp.broadcast_to(
        jnp.arange(tree, dtype=jnp.int32)[None], (b, tree))
    for i in range(depth + 1):
        exp = jnp.take_along_axis(expected, cur[:, None], axis=1)[:, 0]
        produced = produced.at[:, i].set(exp)
        if i == depth:
            break
        match = (tree_parents == cur[:, None]) & (
            tree_tokens == exp[:, None])
        found = jnp.any(match, axis=-1) & alive
        child = jnp.argmax(match, axis=-1).astype(jnp.int32)
        from_slots = from_slots.at[:, i + 1].set(
            jnp.where(found, child, i + 1))
        n_acc = n_acc + found.astype(jnp.int32)
        cur = jnp.where(found, child, cur)
        alive = found
    return produced, n_acc, from_slots


@jax.jit
def _apply_overrides_jit(lens, roots, mask, new_lens, new_roots):
    return (
        jnp.where(mask, new_lens, lens),
        jnp.where(mask, new_roots, roots),
    )


class SpecEngine:
    """Compiled device functions for draft expansion, verify, and KV commit."""

    def __init__(
        self,
        llm_spec: ModelSpec,
        llm_params,
        ssm_spec: ModelSpec,
        ssm_params,
        *,
        beam_width: int = 3,
        beam_depth: int = 8,
        max_requests_per_batch: int = 8,
        max_seq_len: int = 256,
        cache_dtype=jnp.bfloat16,
        mesh=None,
        pp_mesh=None,
    ):
        """``mesh``: multi-chip serving — LLM and SSM params get TP
        shardings, both KV caches shard slots/"data" x heads/"model", host
        inputs replicate (see InferenceEngine.__doc__).

        ``pp_mesh``: a mesh with a pipe axis > 1 — the verifier runs
        stage-resident through the pipeline (PipelineSpecEngine); handled by
        the factory in serve.py/pp_spec. Passing it here is an error so a
        pipe-axis mesh can never silently replicate verifier weights
        (round-2 VERDICT #3)."""
        if pp_mesh is not None:
            raise NotImplementedError(
                "SpecEngine does not stage over a pipe axis; construct "
                "serving.pp_spec.PipelineSpecEngine (LLM.compile routes "
                "there automatically)"
            )
        assert llm_spec.vocab_size == ssm_spec.vocab_size, "vocab mismatch"
        t = tree_size(beam_width, beam_depth)
        assert t <= MAX_SPEC_TREE_TOKEN_NUM, (
            f"tree {t} exceeds cap {MAX_SPEC_TREE_TOKEN_NUM}"
        )
        self.llm_spec, self.ssm_spec = llm_spec, ssm_spec
        self.mesh = mesh
        if mesh is not None:
            from flexflow_tpu.parallel.sharding import replicated, shard_params

            llm_params = shard_params(llm_spec, llm_params, mesh)
            ssm_params = shard_params(ssm_spec, ssm_params, mesh)
            self._replicated = replicated(mesh)
            self._mesh_local = all(
                d.process_index == jax.process_index()
                for d in mesh.devices.flat
            )
            self._to_replicated = jax.jit(
                lambda x: x, out_shardings=self._replicated
            )
        else:
            self._replicated = None
            self._mesh_local = True
        from flexflow_tpu.config import config as _ffconfig

        if _ffconfig.fuse_qkv and mesh is None:
            # fused wqkv/wgu carriers (see InferenceEngine.__init__); both
            # draft and verifier flip together so decode, draft expansion
            # and tree-verify stay mutually consistent
            llm_params = decoder.fuse_qkv_params(llm_spec, llm_params)
            ssm_params = decoder.fuse_qkv_params(ssm_spec, ssm_params)
        self.llm_params, self.ssm_params = llm_params, ssm_params
        self.width, self.depth, self.tree = beam_width, beam_depth, t
        self.max_requests = max_requests_per_batch
        self.max_seq_len = max_seq_len

        self.llm_cache = decoder.init_kv_cache(
            llm_spec, max_requests_per_batch, max_seq_len, cache_dtype
        )
        self.ssm_cache = decoder.init_kv_cache(
            ssm_spec, max_requests_per_batch, max_seq_len, cache_dtype
        )
        if mesh is not None:
            from flexflow_tpu.parallel.sharding import kv_cache_sharding

            for attr in ("llm_cache", "ssm_cache"):
                c = getattr(self, attr)
                cs = kv_cache_sharding(mesh, c)
                setattr(self, attr, KVCache(
                    k=jax.device_put(c.k, cs), v=jax.device_put(c.v, cs)))

        w, d_max, tree = self.width, self.depth, self.tree

        # ---- prefill (shared with incremental path) ----
        @functools.partial(jax.jit, static_argnames=("spec_name",))
        def prefill_fn(params, tokens, length, spec_name):
            spec = self.llm_spec if spec_name == "llm" else self.ssm_spec
            positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
            logits, kv = decoder.forward(
                spec, params, tokens, positions, lengths=length[None],
                return_kv=True,
            )
            last = jnp.take_along_axis(
                logits, (length - 1)[None, None, None], axis=1
            )[:, 0]
            k, v = kv
            return last[0], (k[:, 0], v[:, 0])

        @functools.partial(jax.jit, donate_argnums=(0,))
        def insert_fn(cache, k_new, v_new, slot):
            return decoder.insert_kv(cache, k_new, v_new, slot, jnp.int32(0))

        @functools.partial(
            jax.jit, donate_argnums=(2, 3), static_argnames=("greedy",)
        )
        def prefill_both_batch_fn(llm_params, ssm_params, llm_cache, ssm_cache,
                                  tokens, lengths, slots, key, scfg,
                                  greedy=True):
            """Batched admission for BOTH models in one dispatch: LLM + SSM
            prompt forwards, cache inserts, and first-token selection (the
            reference admits whole batches into its BatchConfig prompt phase;
            per-request per-model dispatches paid host latency 2x each)."""
            nb, bucket = tokens.shape
            positions = jnp.broadcast_to(
                jnp.arange(bucket, dtype=jnp.int32)[None], (nb, bucket))
            logits, (lk, lv) = decoder.forward(
                self.llm_spec, llm_params, tokens, positions,
                lengths=lengths, return_kv=True)
            _, (sk, sv) = decoder.forward(
                self.ssm_spec, ssm_params, tokens, positions,
                lengths=lengths, return_kv=True)
            last = jnp.take_along_axis(
                logits, (lengths - 1)[:, None, None], axis=1)[:, 0]  # [NB, V]

            def write(cache, k, v):
                k_t = k.transpose(0, 1, 3, 4, 2).astype(cache.k.dtype)
                v_t = v.transpose(0, 1, 3, 4, 2).astype(cache.v.dtype)
                ck, cv = decoder.commit_kv_windows(
                    cache.k, cache.v, k_t, v_t,
                    jnp.zeros((nb,), jnp.int32), slots,
                )
                return KVCache(k=ck, v=cv)

            llm_cache = write(llm_cache, lk, lv)
            ssm_cache = write(ssm_cache, sk, sv)
            if greedy:
                toks = jnp.argmax(last, axis=-1).astype(jnp.int32)
            else:
                toks = sampling_lib.sample(last, key, scfg)
            return toks, llm_cache, ssm_cache

        # ---- draft root: feed the root token, return top-W expansions ----
        def root_core(params, cache, cache_lens, root_tokens):
            logits, cache = decoder.forward_cached(
                self.ssm_spec, params, root_tokens[:, None], cache, cache_lens
            )
            logp = jax.nn.log_softmax(
                logits[:, 0].astype(jnp.float32), axis=-1
            )  # [B, V]
            beam_logp, toks = jax.lax.top_k(logp, w)  # [B, W]
            return toks.astype(jnp.int32), beam_logp, cache

        @functools.partial(jax.jit, donate_argnums=(1,))
        def draft_root_fn(params, cache, cache_lens, root_tokens):
            return root_core(params, cache, cache_lens, root_tokens)

        # ---- draft expand one depth (d may be traced: used inside the
        # fused scan as well as the per-depth jitted wrapper) ----
        def expand_core(params, cache, cache_lens, beam_tokens, beam_logp, anc, d):
            b = beam_tokens.shape[0]
            s = cache.max_seq_len
            slot_base = 1 + (d - 1) * w
            self_slots = slot_base + jnp.arange(w, dtype=jnp.int32)  # [W]
            anc_self = anc | (
                jnp.arange(tree)[None, None, :] == self_slots[None, :, None]
            )  # [B, W, tree] including self

            # cache mask: committed prefix + ancestor tree slots (already
            # written at earlier depths). Self is NOT in the cache under the
            # split-attention design — it joins in-register via tree_mask.
            kv_pos = jnp.arange(s, dtype=jnp.int32)[None, None, :]  # [1,1,S]
            committed = kv_pos < cache_lens[:, None, None]  # [B,1,S]
            rel = kv_pos - cache_lens[:, None, None]  # [B,1,S]
            in_tree = (rel >= 0) & (rel < tree)
            rel_c = jnp.clip(rel, 0, tree - 1)
            tree_allowed = jnp.take_along_axis(
                anc, jnp.broadcast_to(rel_c, (b, w, s)), axis=-1
            ) & in_tree
            kv_mask = committed | tree_allowed  # [B, W, S]
            # in-flight mask: each beam attends only itself among the W
            # current tokens (siblings are never ancestors)
            new_mask = jnp.broadcast_to(jnp.eye(w, dtype=bool)[None], (b, w, w))

            positions = cache_lens[:, None] + d  # [B, 1] -> broadcast
            positions = jnp.broadcast_to(positions, (b, w)).astype(jnp.int32)

            logits, cache = decoder.forward_cached(
                self.ssm_spec, params, beam_tokens, cache, cache_lens,
                positions=positions, kv_mask=kv_mask, tree_mask=new_mask,
                write_start=cache_lens + slot_base,
            )  # [B, W, V]

            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            cand_logp, cand_tok = jax.lax.top_k(logp, w)  # [B, W, W]
            total = beam_logp[:, :, None] + cand_logp  # [B, W, W]
            flat = total.reshape(b, w * w)
            new_logp, flat_idx = jax.lax.top_k(flat, w)  # [B, W]
            parents = (flat_idx // w).astype(jnp.int32)  # index into old beams
            new_tokens = jnp.take_along_axis(
                cand_tok.reshape(b, w * w), flat_idx, axis=-1
            ).astype(jnp.int32)
            new_anc = jnp.take_along_axis(
                anc_self, parents[:, :, None], axis=1
            )  # [B, W, tree]
            return new_tokens, parents, new_logp, new_anc, cache

        @functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("d",))
        def draft_expand_fn(params, cache, cache_lens, beam_tokens, beam_logp,
                            anc, d):
            return expand_core(params, cache, cache_lens, beam_tokens,
                               beam_logp, anc, d)

        # ---- LLM tree verification ----
        def verify_logits_core(
            params, cache, cache_lens, tree_tokens, tree_depths, anc_self
        ):
            """tree_tokens [B, T] in slot order; anc_self [B, T, T] incl. self."""
            b = tree_tokens.shape[0]
            positions = cache_lens[:, None] + tree_depths  # [B, T]
            # split-attention: committed prefix from the cache (default
            # kv_mask) + the tree's ancestor matrix among the T in-flight
            # tokens (the reference BitMask, batch_config.h:122-136); tree KV
            # lands at window [lens, lens+tree) (default write_start)
            logits, cache = decoder.forward_cached(
                self.llm_spec, params, tree_tokens, cache, cache_lens,
                positions=positions.astype(jnp.int32), tree_mask=anc_self,
            )
            return logits, cache  # [B, T, V]

        def verify_core(params, cache, cache_lens, tree_tokens, tree_depths, anc_self):
            logits, cache = verify_logits_core(
                params, cache, cache_lens, tree_tokens, tree_depths, anc_self
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        @functools.partial(jax.jit, donate_argnums=(1,))
        def verify_fn(params, cache, cache_lens, tree_tokens, tree_depths,
                      anc_self):
            return verify_core(params, cache, cache_lens, tree_tokens,
                               tree_depths, anc_self)

        # ---- KV commit: compact accepted tree slots to contiguous positions ----
        def commit_core(cache, cache_lens, from_slots):
            """cache[..., len+i] <- cache[..., len+from_slots[b,i]] for i < tree.

            from_slots is identity-padded beyond the accepted count; stale
            writes land in the scratch region which is never attended.
            Cache layout [L, B, KH, D, S] (S minor — see decoder.KVCache).

            Structure: small GATHER of the [B, T] accepted columns, then ONE
            batch-uniform window commit (decoder.commit_kv_windows — the
            shift-one-hot select; per-slot DUS chains and at[...].set
            scatters both degrade to full-cache-per-slot traffic, see the
            commit_kv_windows docstring). Reference analog: committed_tokens
            KV compaction, batch_config.h:156-163.
            """
            ll, b, kh, dh, s = cache.k.shape
            t = from_slots.shape[1]  # tree size (merged trees may differ)
            src = jnp.minimum(cache_lens[:, None] + from_slots, s - 1)  # [B,T]
            bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
            # advanced indices on non-adjacent axes (1, 4) move the [B, T]
            # index block to the front: gathered shape [B, T, L, KH, D]
            gk = cache.k[:, bidx, :, :, src].transpose(2, 0, 3, 4, 1)
            gv = cache.v[:, bidx, :, :, src].transpose(2, 0, 3, 4, 1)
            # -> [L, B, KH, D, T]. Materialize the gathers BEFORE the commit:
            # without the barrier XLA defers them into the consumers,
            # keeping the cache live across the first write and copying the
            # whole multi-GB buffer (cost analysis: 3.2 GB accessed vs 0.3).
            gk, gv = jax.lax.optimization_barrier((gk, gv))
            ck, cv = decoder.commit_kv_windows(
                cache.k, cache.v, gk, gv, cache_lens
            )
            return KVCache(k=ck, v=cv)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def commit_fn(cache, cache_lens, from_slots):
            return commit_core(cache, cache_lens, from_slots)

        # ---- draft-cache catch-up (multi-SSM rotation): feed committed
        # tokens this SSM has not yet processed (reference analog: each SSM
        # re-initializes on committed tokens in prepare_next_batch_init) ----
        @functools.partial(jax.jit, donate_argnums=(1,))
        def catchup_fn(params, cache, ssm_lens, tokens):
            _, cache = decoder.forward_cached(
                self.ssm_spec, params, tokens, cache, ssm_lens
            )
            return cache

        # ---- FUSED speculative iteration: draft tree + verify + accept +
        # commit as ONE XLA program (the whole reference serve_spec_infer
        # inner loop, request_manager.cc:3123-3174, as a single trace) ----
        #
        # In-register tree KV: neither the draft nor the verifier writes tree
        # tokens into its multi-GB cache. Tree KV lives in small
        # [L, B, tree, KH, D] buffers (draft) / the forward's returned new-KV
        # stack (verifier); acceptance commits ONLY the accepted <=depth+1
        # columns. This removes every dynamic multi-column cache write except
        # the one commit — the writes were rewriting the whole cache through
        # XLA's misaligned-lane DUS path (measured ~45 ms/iteration on a
        # 1.8B verifier before; the caches are donated and stay in place now).
        dmax = self.depth
        depths_vec = make_depths_vec(w, dmax)
        # draft tree build / accept walk / buffer commit: module-level
        # implementations shared with PipelineSpecEngine (pp_spec.py)
        draft_phase = build_draft_phase(self.ssm_spec, w, dmax)

        def verify_logits_reg(params, cache, cache_lens, tree_tokens,
                              tree_depths, anc_self, staged=None):
            """Tree verification WITHOUT cache writes: returns the logits and
            the tree tokens' per-layer KV stack [L, B, T, KH, D].

            ``staged``: horizon-accepted tokens not yet committed to the
            cache — compacted (s_k, s_v, counts) or raw
            (s_k, s_v, valid, pos) form, see draft_phase."""
            b, t_ = tree_tokens.shape
            if staged is None:
                positions = cache_lens[:, None] + tree_depths
                return decoder.forward_cached(
                    self.llm_spec, params, tree_tokens, cache, cache_lens,
                    positions=positions.astype(jnp.int32), tree_mask=anc_self,
                    write_cache=False)
            if len(staged) == 4:
                s_k, s_v, stage_valid, stage_pos = staged
                cap = s_k.shape[2]
                counts = jnp.sum(stage_valid.astype(jnp.int32), axis=1)
            else:
                s_k, s_v, counts = staged
                cap = s_k.shape[2]
                stage_cols = jnp.arange(cap, dtype=jnp.int32)
                stage_valid = stage_cols[None, :] < counts[:, None]  # [B, C]
                stage_pos = cache_lens[:, None] + stage_cols[None, :]
            base_lens = cache_lens + counts
            positions = base_lens[:, None] + tree_depths
            return decoder.forward_cached(
                self.llm_spec, params, tree_tokens, cache, cache_lens,
                positions=positions.astype(jnp.int32), tree_mask=anc_self,
                extra_kv=(s_k, s_v),
                extra_mask=jnp.broadcast_to(
                    stage_valid[:, None, :], (b, t_, cap)),
                extra_positions=stage_pos,
                write_cache=False)

        def _append_staged(stage_k, stage_v, buf_k, buf_v, path, counts,
                           n_acc):
            """Append the accepted tree columns to the horizon staging
            buffers at offset ``counts`` (per slot). One-hot placement on
            the small [.., C, ..] buffers — the per-iteration analog of
            commit_kv_windows at ~1/40 the traffic of a full-cache commit."""
            idx = path[None, :, :, None, None]  # [1, B, P, 1, 1]
            gk = jnp.take_along_axis(buf_k, idx, axis=2)  # [L, B, P, KH, D]
            gv = jnp.take_along_axis(buf_v, idx, axis=2)
            b, p = path.shape
            cap = stage_k.shape[2]
            cols = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
            # [B, P, C]: col c receives accepted token p iff c == counts+p
            # and p < n_acc
            onehot = (cols == (counts[:, None] + jnp.arange(p)[None, :])
                      [:, :, None]) & (
                jnp.arange(p)[None, :, None] < n_acc[:, None, None])
            oh = onehot.astype(stage_k.dtype)
            # f32 caches need the exact multi-pass mode — the default
            # one-pass bf16 MXU decomposition would truncate the values
            # (same discipline as decoder.commit_kv_windows)
            prec = (None if stage_k.dtype == jnp.bfloat16
                    else jax.lax.Precision.HIGHEST)
            shifted_k = jnp.einsum(
                "lbpkd,bpc->lbckd", gk.astype(stage_k.dtype), oh,
                preferred_element_type=stage_k.dtype, precision=prec)
            shifted_v = jnp.einsum(
                "lbpkd,bpc->lbckd", gv.astype(stage_v.dtype), oh,
                preferred_element_type=stage_v.dtype, precision=prec)
            covered = jnp.any(onehot, axis=1)  # [B, C]
            cmask = covered[None, :, :, None, None]
            return (jnp.where(cmask, shifted_k, stage_k),
                    jnp.where(cmask, shifted_v, stage_v))

        def fused_step_body(llm_params, ssm_params, llm_cache, ssm_cache,
                            cache_lens, roots, window=None):
            b = cache_lens.shape[0]
            # length-aware cache read (bit-exact; see _staged_horizon)
            if window is not None and window < ssm_cache.k.shape[-1]:
                ssm_read = KVCache(k=ssm_cache.k[..., :window],
                                   v=ssm_cache.v[..., :window])
            else:
                ssm_read = ssm_cache
            if window is not None and window < llm_cache.k.shape[-1]:
                llm_read = KVCache(k=llm_cache.k[..., :window],
                                   v=llm_cache.v[..., :window])
            else:
                llm_read = llm_cache
            tree_tokens, tree_parents, anc_self, ssm_buf = draft_phase(
                ssm_params, ssm_read, cache_lens, roots)

            # --- verify (in-register tree KV) ---
            logits, llm_buf = verify_logits_reg(
                llm_params, llm_read, cache_lens, tree_tokens,
                jnp.broadcast_to(depths_vec[None], (b, tree)), anc_self)
            expected = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            # --- greedy accept walk (vectorized over slots) ---
            produced, n_acc, from_slots = greedy_accept_walk(
                expected, tree_tokens, tree_parents, dmax)

            # --- commit accepted KV from the in-register buffers ---
            path = from_slots[:, :dmax + 1]
            llm_cache = commit_from_buffer(
                llm_cache, cache_lens, *llm_buf, path)
            ssm_cache = commit_from_buffer(
                ssm_cache, cache_lens, *ssm_buf, path)

            next_roots = jnp.take_along_axis(
                produced, (n_acc - 1)[:, None], axis=1)[:, 0]
            return produced, n_acc, next_roots, llm_cache, ssm_cache

        @functools.partial(jax.jit, donate_argnums=(2, 3),
                           static_argnames=("window",))
        def fused_step_fn(llm_params, ssm_params, llm_cache, ssm_cache,
                          cache_lens, roots, window=None):
            return fused_step_body(llm_params, ssm_params, llm_cache,
                                   ssm_cache, cache_lens, roots,
                                   window=window)

        def _staged_horizon(llm_params, ssm_params, llm_cache, ssm_cache,
                            cache_lens, roots, n, walk_xs, walk_fn,
                            window=None):
            """n fused iterations with STAGED commit: accepted KV lives in
            small in-register staging buffers across the horizon and the
            multi-GB caches are written ONCE at the end — the per-iteration
            full-cache commit was ~5 ms of a 40 ms iteration at 7B.
            ``walk_fn(logits, tree_tokens, tree_parents, xs) -> (produced,
            n_acc, from_slots)`` abstracts greedy vs sampling acceptance.

            ``window`` (static, >= max(cache_lens)): draft + verify attend
            against a hoisted [.., :window] slice of each cache instead of
            the full [S] extent — cache_lens is FIXED across the horizon
            (in-horizon KV rides the staging buffers), so the windowed read
            is bit-exact; the end-of-horizon commit targets the FULL caches.
            Same structure as InferenceEngine.decode_n_fn (ROADMAP r4 #1).

            RAW staging layout (round 5): iteration i's whole tree KV lands
            UNCOMPACTED at staging columns [i*tree, (i+1)*tree); per-column
            validity/positions track which tree slots were accepted. The r4
            design compacted accepted columns every iteration via one-hot
            einsums over the full [L, B, cap, KH, D] buffers — measured
            3.07 ms/iteration at 7B (probe_r5_specattr), and the cost grew
            with the horizon (why h16 never beat h8). Raw staging replaces
            that with one [L, B, tree, KH, D] dynamic-update per iteration
            plus tiny [B, tree] bookkeeping; attention reads ~2x the staged
            columns (0.1-0.3 ms) and ONE compaction einsum runs per horizon
            before the cache commit.
            """
            b = cache_lens.shape[0]
            if window is not None and window < llm_cache.k.shape[-1]:
                llm_read = KVCache(k=llm_cache.k[..., :window],
                                   v=llm_cache.v[..., :window])
            else:
                llm_read = llm_cache
            if window is not None and window < ssm_cache.k.shape[-1]:
                ssm_read = KVCache(k=ssm_cache.k[..., :window],
                                   v=ssm_cache.v[..., :window])
            else:
                ssm_read = ssm_cache
            cap = n * tree  # raw columns: one tree block per iteration
            sdt = ssm_cache.k.dtype
            ldt = llm_cache.k.dtype
            sl, skh, sd = (self.ssm_spec.num_layers,
                           self.ssm_spec.num_kv_heads, self.ssm_spec.head_dim)
            ll_, lkh, ld_ = (self.llm_spec.num_layers,
                             self.llm_spec.num_kv_heads,
                             self.llm_spec.head_dim)
            r_ssm_k = jnp.zeros((sl, b, cap, skh, sd), sdt)
            r_ssm_v = jnp.zeros((sl, b, cap, skh, sd), sdt)
            r_llm_k = jnp.zeros((ll_, b, cap, lkh, ld_), ldt)
            r_llm_v = jnp.zeros((ll_, b, cap, lkh, ld_), ldt)
            valid0 = jnp.zeros((b, cap), bool)
            pos0 = jnp.zeros((b, cap), jnp.int32)
            counts0 = jnp.zeros((b,), jnp.int32)
            iota_n = jnp.arange(n, dtype=jnp.int32)
            xs = (iota_n, walk_xs) if walk_xs is not None else iota_n

            def body(carry, xs_i):
                (r_llm_k, r_llm_v, r_ssm_k, r_ssm_v, valid, pos, counts,
                 roots) = carry
                if walk_xs is not None:
                    i, xi = xs_i
                else:
                    i, xi = xs_i, None
                col = i * tree
                tree_tokens, tree_parents, anc_self, ssm_stage = draft_phase(
                    ssm_params, ssm_read, cache_lens, roots,
                    staged=(r_ssm_k, r_ssm_v, valid, pos), blk=col)
                # block-resident: the draft already wrote its tree KV into
                # staging columns [col, col+tree)
                r_ssm_k, r_ssm_v = ssm_stage
                logits, llm_buf = verify_logits_reg(
                    llm_params, llm_read, cache_lens, tree_tokens,
                    jnp.broadcast_to(depths_vec[None], (b, tree)), anc_self,
                    staged=(r_llm_k, r_llm_v, valid, pos))
                produced, n_acc, from_slots = walk_fn(
                    logits, tree_tokens, tree_parents, xi)
                path = from_slots[:, :dmax + 1]  # [B, P]

                # raw staging write: iteration i's whole verifier tree block
                r_llm_k = jax.lax.dynamic_update_slice(
                    r_llm_k, llm_buf[0].astype(ldt), (0, 0, col, 0, 0))
                r_llm_v = jax.lax.dynamic_update_slice(
                    r_llm_v, llm_buf[1].astype(ldt), (0, 0, col, 0, 0))
                # [B, tree] validity + absolute positions of this block:
                # slot s accepted iff path[:, k] == s for some k < n_acc
                pidx = jnp.arange(dmax + 1, dtype=jnp.int32)
                oh = (path[:, :, None]
                      == jnp.arange(tree, dtype=jnp.int32)[None, None, :])
                oh = oh & (pidx[None, :, None] < n_acc[:, None, None])
                vblock = jnp.any(oh, axis=1)  # [B, tree]
                k_of = jnp.argmax(oh, axis=1).astype(jnp.int32)  # [B, tree]
                pblock = cache_lens[:, None] + counts[:, None] + k_of
                valid = jax.lax.dynamic_update_slice(valid, vblock, (0, col))
                pos = jax.lax.dynamic_update_slice(pos, pblock, (0, col))

                next_roots = jnp.take_along_axis(
                    produced, (n_acc - 1)[:, None], axis=1)[:, 0]
                return (r_llm_k, r_llm_v, r_ssm_k, r_ssm_v, valid, pos,
                        counts + n_acc, next_roots), (produced, n_acc)

            (r_llm_k, r_llm_v, r_ssm_k, r_ssm_v, valid, pos, counts,
             roots_out), (produced, n_acc) = jax.lax.scan(
                body,
                (r_llm_k, r_llm_v, r_ssm_k, r_ssm_v, valid0, pos0, counts0,
                 roots),
                xs, length=n)

            # ONE compaction per cache per horizon: gather the accepted raw
            # columns into commit order (dst column = pos - cache_lens),
            # then ONE window commit (junk beyond counts[b] lands past the
            # committed length — never attended, overwritten later)
            ccap = n * (dmax + 1)
            oh = (valid[:, :, None]
                  & ((pos - cache_lens[:, None])[:, :, None]
                     == jnp.arange(ccap, dtype=jnp.int32)[None, None, :]))

            # commit-region bound: every write lands in [min(lens),
            # max(lens)+ccap), and ``window`` >= max(lens) by contract — so
            # the shift-one-hot commit (2x traffic over whatever it runs on,
            # commit_kv_windows docstring) can run on a STATIC [.., :wb2]
            # slice and paste back in place, paying window-fraction traffic
            # instead of full-cache (measured 45.7 ms for a full-cache 7B
            # commit — the dominant per-horizon overhead, chk_spec2 r5)
            s_full = llm_cache.k.shape[-1]
            wb2 = (min(s_full, int(window) + ccap)
                   if window is not None else s_full)

            def commit_stage(cache, rk, rv):
                ohc = oh.astype(cache.k.dtype)
                prec = (None if cache.k.dtype == jnp.bfloat16
                        else jax.lax.Precision.HIGHEST)
                sk = jnp.einsum("lbpkd,bpc->lbckd", rk.astype(cache.k.dtype),
                                ohc, preferred_element_type=cache.k.dtype,
                                precision=prec)
                sv = jnp.einsum("lbpkd,bpc->lbckd", rv.astype(cache.v.dtype),
                                ohc, preferred_element_type=cache.v.dtype,
                                precision=prec)
                upd_k = sk.transpose(0, 1, 3, 4, 2)
                upd_v = sv.transpose(0, 1, 3, 4, 2)
                upd_k, upd_v = jax.lax.optimization_barrier((upd_k, upd_v))
                if wb2 < cache.k.shape[-1]:
                    ck_w, cv_w = decoder.commit_kv_windows(
                        cache.k[..., :wb2], cache.v[..., :wb2],
                        upd_k, upd_v, cache_lens)
                    ck = jax.lax.dynamic_update_slice(
                        cache.k, ck_w, (0, 0, 0, 0, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cache.v, cv_w, (0, 0, 0, 0, 0))
                else:
                    ck, cv = decoder.commit_kv_windows(
                        cache.k, cache.v, upd_k, upd_v, cache_lens)
                return KVCache(k=ck, v=cv)

            llm_cache = commit_stage(llm_cache, r_llm_k, r_llm_v)
            ssm_cache = commit_stage(ssm_cache, r_ssm_k, r_ssm_v)
            return (produced, n_acc, cache_lens + counts, roots_out,
                    llm_cache, ssm_cache)

        def _greedy_walk_xs(logits, tree_tokens, tree_parents, xs):
            expected = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return greedy_accept_walk(
                expected, tree_tokens, tree_parents, dmax)

        @functools.partial(
            jax.jit, donate_argnums=(2, 3), static_argnames=("n", "window")
        )
        def fused_step_n_fn(llm_params, ssm_params, llm_cache, ssm_cache,
                            cache_lens, roots, n, window=None):
            """n fused speculative iterations as one device-resident scan
            (spec horizon): lens/roots feed back on device; host fetches
            [n, B, depth+1] produced tokens + [n, B] counts once. Staged
            commit: the caches are written once per horizon."""
            return _staged_horizon(
                llm_params, ssm_params, llm_cache, ssm_cache,
                cache_lens, roots, n, None, _greedy_walk_xs, window=window)

        # ---- SAMPLING-mode fused iteration: stochastic multi-round
        # verification (spec_sampling.tree_sample_walk) instead of the
        # greedy argmax gate — every emitted token is distributed exactly
        # per the request's temperature/top-p/top-k target ----
        def fused_sample_step_body(llm_params, ssm_params, llm_cache,
                                   ssm_cache, cache_lens, roots, key, scfg):
            b = cache_lens.shape[0]
            tree_tokens, tree_parents, anc_self, ssm_buf = draft_phase(
                ssm_params, ssm_cache, cache_lens, roots)
            logits, llm_buf = verify_logits_reg(
                llm_params, llm_cache, cache_lens, tree_tokens,
                jnp.broadcast_to(depths_vec[None], (b, tree)), anc_self)
            v = logits.shape[-1]
            scfg_t = sampling_lib.SamplingConfig(
                temperature=jnp.repeat(scfg.temperature, tree),
                top_p=jnp.repeat(scfg.top_p, tree),
                top_k=jnp.repeat(scfg.top_k, tree),
            )
            p_tree = sampling_lib.target_probs(
                logits.reshape(b * tree, v), scfg_t
            ).reshape(b, tree, v)
            produced, n_acc, from_slots = tree_sample_walk(
                p_tree, tree_tokens, tree_parents, key, width=w, depth=dmax,
            )
            path = from_slots[:, :dmax + 1]
            llm_cache = commit_from_buffer(
                llm_cache, cache_lens, *llm_buf, path)
            ssm_cache = commit_from_buffer(
                ssm_cache, cache_lens, *ssm_buf, path)
            next_roots = jnp.take_along_axis(
                produced, (n_acc - 1)[:, None], axis=1)[:, 0]
            return produced, n_acc, next_roots, llm_cache, ssm_cache

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def fused_sample_step_fn(llm_params, ssm_params, llm_cache, ssm_cache,
                                 cache_lens, roots, key, scfg):
            return fused_sample_step_body(llm_params, ssm_params, llm_cache,
                                          ssm_cache, cache_lens, roots, key,
                                          scfg)

        @functools.partial(
            jax.jit, donate_argnums=(2, 3), static_argnames=("n", "window")
        )
        def fused_sample_step_n_fn(llm_params, ssm_params, llm_cache,
                                   ssm_cache, cache_lens, roots, key, scfg, n,
                                   window=None):
            def sample_walk(logits, tree_tokens, tree_parents, key_i):
                b = tree_tokens.shape[0]
                v = logits.shape[-1]
                scfg_t = sampling_lib.SamplingConfig(
                    temperature=jnp.repeat(scfg.temperature, tree),
                    top_p=jnp.repeat(scfg.top_p, tree),
                    top_k=jnp.repeat(scfg.top_k, tree),
                )
                p_tree = sampling_lib.target_probs(
                    logits.reshape(b * tree, v), scfg_t
                ).reshape(b, tree, v)
                return tree_sample_walk(
                    p_tree, tree_tokens, tree_parents, key_i,
                    width=w, depth=dmax)

            return _staged_horizon(
                llm_params, ssm_params, llm_cache, ssm_cache,
                cache_lens, roots, n, jax.random.split(key, n), sample_walk,
                window=window)

        self._prefill_both_batch = prefill_both_batch_fn
        # uncompiled building blocks (perf probes / custom fusions)
        self._draft_phase_core = draft_phase
        self._verify_logits_reg = verify_logits_reg
        self._append_staged_core = _append_staged
        self._verify_core = verify_core
        self._commit_core = commit_core
        self._depths_vec = depths_vec
        self._catchup = catchup_fn
        self._fused_step = fused_step_fn
        self._fused_step_n = fused_step_n_fn
        self._fused_sample_step = fused_sample_step_fn
        self._fused_sample_step_n = fused_sample_step_n_fn
        self._prefill = prefill_fn
        self._insert = insert_fn
        self._draft_root = draft_root_fn
        self._draft_expand = draft_expand_fn
        self._verify = verify_fn
        self._commit = commit_fn

    # ------------------------------------------------------------------
    # host-facing helpers
    # ------------------------------------------------------------------

    def _h(self, x):
        """Host value -> device array, replicated over the mesh if any
        (see InferenceEngine._h)."""
        arr = x if isinstance(x, jax.Array) else jnp.asarray(x)
        if self._replicated is not None:
            arr = jax.device_put(arr, self._replicated)
        return arr

    def fetch(self, x):
        """Device -> host (all-gathers multi-process-sharded outputs first;
        see InferenceEngine.fetch)."""
        if not self._mesh_local:
            x = self._to_replicated(x)
        return jax.device_get(x)

    def prefill_both(
        self, prompt_tokens: np.ndarray, slot: int, key=None, scfg1=None
    ) -> int:
        """Prefill LLM + SSM caches for a new request; returns first token.

        With (key, scfg1 [1]-shaped SamplingConfig) the first token is
        sampled per the request's config instead of argmax.
        """
        n = len(prompt_tokens)
        bucket = 16
        while bucket < n:
            bucket *= 2
        bucket = min(bucket, self.max_seq_len)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :n] = prompt_tokens
        tokens = self._h(padded)
        length = self._h(jnp.int32(n))

        last_logits, kv = self._prefill(self.llm_params, tokens, length, "llm")
        self.llm_cache = self._insert(self.llm_cache, *kv,
                                      self._h(jnp.int32(slot)))
        if key is not None and scfg1 is not None:
            first = int(sampling_lib.sample(
                last_logits[None].astype(jnp.float32), key, scfg1)[0])
        else:
            first = int(jnp.argmax(last_logits))

        _, kv_s = self._prefill(self.ssm_params, tokens, length, "ssm")
        self.ssm_cache = self._insert(self.ssm_cache, *kv_s,
                                      self._h(jnp.int32(slot)))
        return first

    def prefill_both_batch(self, prompts, slots, key=None, scfg=None):
        """Admit several requests (both caches) in ONE dispatch; returns the
        [NB] first tokens (host ints). ``scfg``: per-admission SamplingConfig
        ([NB] fields) for stochastic first tokens; None = greedy."""
        nb = len(prompts)
        bucket = 16
        longest = max(len(p) for p in prompts)
        while bucket < longest:
            bucket *= 2
        bucket = min(bucket, self.max_seq_len)
        padded = np.zeros((nb, bucket), np.int32)
        lengths = np.zeros((nb,), np.int32)
        for i, p in enumerate(prompts):
            padded[i, :len(p)] = p
            lengths[i] = len(p)
        greedy = scfg is None
        if greedy:
            import flexflow_tpu.ops.sampling as _s

            scfg = _s.SamplingConfig(
                temperature=np.zeros(nb, np.float32),
                top_p=np.ones(nb, np.float32),
                top_k=np.zeros(nb, np.int32))
            key = jax.random.PRNGKey(0)
        toks, self.llm_cache, self.ssm_cache = self._prefill_both_batch(
            self.llm_params, self.ssm_params, self.llm_cache, self.ssm_cache,
            self._h(padded), self._h(lengths),
            self._h(np.asarray(slots, np.int32)), self._h(key),
            jax.tree_util.tree_map(self._h, scfg), greedy=greedy,
        )
        return [int(t) for t in self.fetch(toks)]

    def prefill_ssm_only(self, prompt_tokens: np.ndarray, slot: int) -> None:
        """Prefill only this engine's draft cache (multi-SSM admission)."""
        n = len(prompt_tokens)
        bucket = 16
        while bucket < n:
            bucket *= 2
        bucket = min(bucket, self.max_seq_len)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :n] = prompt_tokens
        _, kv_s = self._prefill(
            self.ssm_params, self._h(padded), self._h(jnp.int32(n)), "ssm"
        )
        self.ssm_cache = self._insert(self.ssm_cache, *kv_s,
                                      self._h(jnp.int32(slot)))

    def catchup(self, ssm_lens: np.ndarray, tokens: np.ndarray) -> None:
        """Advance the draft cache over already-committed tokens.

        tokens [B, C] (zero-padded); rows with no lag pass harmless garbage
        written beyond their valid region (never attended).
        """
        self.ssm_cache = self._catchup(
            self.ssm_params, self.ssm_cache,
            self._h(np.asarray(ssm_lens, np.int32)),
            self._h(np.asarray(tokens, np.int32)),
        )

    def draft_tree(
        self, cache_lens: np.ndarray, root_tokens: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Expand the draft tree for all slots.

        Returns (tree_tokens [B, T], tree_parents [B, T], tree_depths [T]).
        Slot layout: 0 = root; 1+(d-1)*W+w = depth-d beam w. Parent of slot 0
        is -1.
        """
        b, w, dmax, t = len(cache_lens), self.width, self.depth, self.tree
        lens = self._h(np.asarray(cache_lens, np.int32))

        tree_tokens = np.zeros((b, t), np.int32)
        tree_parents = np.full((b, t), -1, np.int32)
        tree_tokens[:, 0] = root_tokens

        beam_tokens, beam_logp, self.ssm_cache = self._draft_root(
            self.ssm_params, self.ssm_cache, lens,
            self._h(np.asarray(root_tokens, np.int32))
        )
        anc = jnp.zeros((b, w, t), dtype=bool).at[:, :, 0].set(True)

        for d in range(1, dmax + 1):
            base = 1 + (d - 1) * w
            tree_tokens[:, base : base + w] = np.asarray(beam_tokens)
            if d == 1:
                tree_parents[:, base : base + w] = 0
            else:
                prev_base = 1 + (d - 2) * w
                tree_parents[:, base : base + w] = prev_base + np.asarray(parents)
            if d == dmax:
                break
            beam_tokens, parents, beam_logp, anc, self.ssm_cache = (
                self._draft_expand(
                    self.ssm_params, self.ssm_cache, lens,
                    beam_tokens, beam_logp, anc, d,
                )
            )

        # last depth's KV still needs writing for commit consistency: expand
        # once more (cheap) so depth==dmax tokens' draft KV exists.
        _, _, _, _, self.ssm_cache = self._draft_expand(
            self.ssm_params, self.ssm_cache, lens, beam_tokens, beam_logp, anc, dmax
        )

        depths = np.zeros(t, np.int32)
        for d in range(1, dmax + 1):
            depths[1 + (d - 1) * w : 1 + d * w] = d
        return tree_tokens, tree_parents, depths

    def verify(
        self,
        cache_lens: np.ndarray,
        tree_tokens: np.ndarray,
        tree_parents: np.ndarray,
        tree_depths: np.ndarray,
    ) -> np.ndarray:
        """LLM tree verification; returns greedy argmax per tree slot [B, T]."""
        b, t = tree_tokens.shape
        anc = np.zeros((b, t, t), bool)
        anc[:, np.arange(t), np.arange(t)] = True
        for s in range(1, t):
            p = tree_parents[:, s]  # [B]
            valid = p >= 0
            anc[valid, s] |= anc[valid, p[valid]]
        depths = np.asarray(tree_depths)
        if depths.ndim == 1:  # shared layout; merged trees pass [B, T]
            depths = depths[None, :].repeat(b, 0)
        out, self.llm_cache = self._verify(
            self.llm_params,
            self.llm_cache,
            self._h(np.asarray(cache_lens, np.int32)),
            self._h(tree_tokens),
            self._h(depths),
            self._h(anc),
        )
        return np.asarray(out)

    def commit(self, cache_lens: np.ndarray, from_slots: np.ndarray) -> None:
        lens = self._h(np.asarray(cache_lens, np.int32))
        fs = self._h(np.asarray(from_slots, np.int32))
        self.llm_cache = self._commit(self.llm_cache, lens, fs)
        self.ssm_cache = self._commit(self.ssm_cache, lens, fs)

    def commit_llm_only(
        self, cache_lens: np.ndarray, from_slots: np.ndarray
    ) -> None:
        """Compact accepted KV in the LLM cache only (merged multi-SSM
        verification: draft caches resync via catch-up over committed
        tokens instead — their tree layouts differ from the merged tree)."""
        self.llm_cache = self._commit(
            self.llm_cache, self._h(np.asarray(cache_lens, np.int32)),
            self._h(np.asarray(from_slots, np.int32)),
        )

    def fused_step(
        self, cache_lens: np.ndarray, root_tokens: np.ndarray, window=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One complete speculative iteration as a single dispatch.

        Returns (produced [B, depth+1], n_acc [B]); both caches committed.
        """
        produced, n_acc, _roots, self.llm_cache, self.ssm_cache = (
            self._fused_step(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                self._h(np.asarray(cache_lens, np.int32)),
                self._h(np.asarray(root_tokens, np.int32)),
                window=window,
            )
        )
        return self.fetch(produced), self.fetch(n_acc)

    def attn_window_bucket(self, max_len: int):
        """Static cache-read window bucket (see InferenceEngine): pow2 from
        128, ``None`` once it reaches the full cache. Must be computed from
        an UPPER BOUND on every active slot's committed length at dispatch
        execution time (pipelined callers add in-flight iterations x
        (depth+1))."""
        w = 128
        m = max(int(max_len), 1)
        while w < m:
            w *= 2
        return None if w >= self.max_seq_len else w

    def fused_step_n(
        self, cache_lens: np.ndarray, root_tokens: np.ndarray, n: int,
        window=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """n device-chained speculative iterations (spec horizon).

        Returns (produced [n, B, depth+1], n_acc [n, B]).
        """
        produced, n_acc, _l, _r, self.llm_cache, self.ssm_cache = (
            self._fused_step_n(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                self._h(np.asarray(cache_lens, np.int32)),
                self._h(np.asarray(root_tokens, np.int32)),
                n, window,
            )
        )
        return self.fetch(produced), self.fetch(n_acc)

    def fused_step_n_async(self, lens_dev, roots_dev, n: int, window=None):
        """Pipelined variant: takes/returns DEVICE lens/roots so the next
        horizon can be dispatched before this one's tokens are fetched
        (the reference scheduler running a step ahead of the devices,
        request_manager.cc:3122-3137). Returns device arrays
        (produced [n, B, d+1], n_acc [n, B], lens_out [B], roots_out [B])."""
        produced, n_acc, lens_out, roots_out, self.llm_cache, self.ssm_cache = (
            self._fused_step_n(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                lens_dev, roots_dev, n, window,
            )
        )
        return produced, n_acc, lens_out, roots_out

    def fused_sample_step_n_async(self, lens_dev, roots_dev, key, scfg, n: int,
                                  window=None):
        """Pipelined sampling-mode horizon (see fused_step_n_async)."""
        produced, n_acc, lens_out, roots_out, self.llm_cache, self.ssm_cache = (
            self._fused_sample_step_n(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                lens_dev, roots_dev,
                self._h(key), jax.tree_util.tree_map(self._h, scfg), n, window,
            )
        )
        return produced, n_acc, lens_out, roots_out

    def apply_slot_overrides(self, lens_dev, roots_dev, mask, new_lens,
                             new_roots):
        """Merge host-side admissions into the device lens/roots feedback
        (fixed [B] shapes -> one compile)."""
        return _apply_overrides_jit(
            lens_dev, roots_dev, self._h(np.asarray(mask, bool)),
            self._h(np.asarray(new_lens, np.int32)),
            self._h(np.asarray(new_roots, np.int32)),
        )

    def fused_sample_step(
        self, cache_lens: np.ndarray, root_tokens: np.ndarray,
        key: jax.Array, scfg,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One speculative iteration with stochastic (sampling) verification.

        scfg: ops.sampling.SamplingConfig with per-slot [B] fields. Greedy
        slots (temperature <= 0) behave exactly like the greedy walk.
        """
        produced, n_acc, _roots, self.llm_cache, self.ssm_cache = (
            self._fused_sample_step(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                self._h(np.asarray(cache_lens, np.int32)),
                self._h(np.asarray(root_tokens, np.int32)),
                self._h(key), jax.tree_util.tree_map(self._h, scfg),
            )
        )
        return self.fetch(produced), self.fetch(n_acc)

    def fused_sample_step_n(
        self, cache_lens: np.ndarray, root_tokens: np.ndarray,
        key: jax.Array, scfg, n: int, window=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """n device-chained sampling-verified speculative iterations."""
        produced, n_acc, _l, _r, self.llm_cache, self.ssm_cache = (
            self._fused_sample_step_n(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                self._h(np.asarray(cache_lens, np.int32)),
                self._h(np.asarray(root_tokens, np.int32)),
                self._h(key), jax.tree_util.tree_map(self._h, scfg), n, window,
            )
        )
        return self.fetch(produced), self.fetch(n_acc)
