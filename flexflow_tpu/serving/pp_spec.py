"""Pipeline-parallel tree-speculative serving: verifier staged over pipe.

The reference's flagship configuration runs spec_infer under PP=4
(/root/reference/tests/inference/cpp_inference_tests.sh:12-100): the big
verifier's layers are binned into pipeline stages while the small draft
model is replicated. TPU-native equivalent:

- verifier layer params + KV cache are stage-stacked ``[P, L/P, ...]`` and
  pipe-sharded exactly like :class:`PipelineInferenceEngine` (each device
  holds 1/P of the verifier);
- the draft (SSM) params + cache are replicated (it is a few percent of the
  verifier's bytes — the reference gives SSMs their own full machine view,
  request_manager.cc ssm registration);
- one fused speculative iteration = draft tree expansion (replicated SPMD
  ops) -> verifier tree-verify through the pipelined tick loop (shard_map,
  in-register tree KV staged per stage, NOT committed) -> greedy/sampled
  accept walk -> per-stage commit of only the accepted columns + replicated
  draft commit. All inside ONE jit; a spec horizon chains n iterations
  device-resident.

Exactness: outputs are bit-identical to the single-device SpecEngine when
both sides use the same carrier layout (gated by tests/test_pp_spec.py with
fuse_qkv pinned OFF — mesh/PP engines always keep split carriers, so with
FFConfig.fuse_qkv on, single-device engines fuse and identity holds only up
to fp reassociation of the projection matmuls). The single-device SpecEngine
is itself lossless vs incremental greedy decoding — composing the
reference's spec-losslessness and TP/PP consistency gates
(cpp_inference_tests.sh:185-215).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flexflow_tpu.models import decoder
from flexflow_tpu.models.decoder import KVCache
from flexflow_tpu.ops import attention as attn_lib
from flexflow_tpu.ops import sampling as sampling_lib
from flexflow_tpu.parallel.mesh import MODEL_AXIS, PIPE_AXIS
from flexflow_tpu.serving.pp_engine import (
    PipelineInferenceEngine,
    _stage_slopes,
)
from flexflow_tpu.serving.spec_sampling import tree_sample_walk
from flexflow_tpu.serving.speculative import (
    MAX_SPEC_TREE_TOKEN_NUM,
    _apply_overrides_jit,
    build_draft_phase,
    commit_from_buffer,
    greedy_accept_walk,
    make_depths_vec,
    tree_size,
)
from flexflow_tpu.specs import ModelSpec


class PipelineSpecEngine:
    """SpecEngine drop-in when pipeline_parallelism_degree > 1.

    Drives the same host surface SpecRequestManager(fused=True) uses:
    ``prefill_both_batch`` / ``fused_step[_n][_async]`` /
    ``fused_sample_step[_n][_async]`` / ``apply_slot_overrides``. The
    unfused host-loop surface (draft_tree/verify/commit) is rejected —
    construct the engine through ``LLM.compile`` which always pairs it with
    a fused manager.
    """

    def __init__(
        self,
        llm_spec: ModelSpec,
        llm_params,
        ssm_spec: ModelSpec,
        ssm_params,
        *,
        mesh: Mesh,
        beam_width: int = 3,
        beam_depth: int = 8,
        max_requests_per_batch: int = 8,
        max_seq_len: int = 256,
        cache_dtype=jnp.bfloat16,
        num_microbatches: Optional[int] = None,
        shared_pp=None,
    ):
        assert llm_spec.vocab_size == ssm_spec.vocab_size, "vocab mismatch"
        t = tree_size(beam_width, beam_depth)
        assert t <= MAX_SPEC_TREE_TOKEN_NUM, (
            f"tree {t} exceeds cap {MAX_SPEC_TREE_TOKEN_NUM}"
        )
        self.llm_spec, self.ssm_spec = llm_spec, ssm_spec
        self.width, self.depth, self.tree = beam_width, beam_depth, t
        self.max_requests = max_requests_per_batch
        self.max_seq_len = max_seq_len
        self.mesh = mesh

        # verifier placement + prefill machinery: the PP inference engine
        # (stage-resident weights + [P, L/P, B, KH, D, S] pipe-sharded
        # cache). ``shared_pp``: multi-SSM engines share ONE staged
        # verifier (weights + cache) instead of restaging per draft
        if shared_pp is not None:
            self._pp = shared_pp
        else:
            self._pp = PipelineInferenceEngine(
                llm_spec, llm_params, mesh=mesh,
                max_requests_per_batch=max_requests_per_batch,
                max_seq_len=max_seq_len, cache_dtype=cache_dtype,
                num_microbatches=num_microbatches,
            )
        self.pp = self._pp.pp
        self.tp = self._pp.tp
        self.num_microbatches = self._pp.num_microbatches
        self.llm_params = self._pp.params
        self._replicated = self._pp._replicated
        self._mesh_local = self._pp._mesh_local
        self._to_replicated = self._pp._to_replicated

        # draft placement: replicated over the whole mesh
        rep = NamedSharding(mesh, P())
        self.ssm_params = jax.device_put(ssm_params, rep)
        ssm_cache = decoder.init_kv_cache(
            ssm_spec, max_requests_per_batch, max_seq_len, cache_dtype
        )
        self.ssm_cache = KVCache(
            k=jax.device_put(ssm_cache.k, rep),
            v=jax.device_put(ssm_cache.v, rep),
        )

        self._build_steps()

    @property
    def llm_cache(self):
        return self._pp.cache

    @llm_cache.setter
    def llm_cache(self, value):
        self._pp.cache = value

    # ------------------------------------------------------------------
    # compiled step functions
    # ------------------------------------------------------------------

    def _build_steps(self):
        llm_spec, ssm_spec = self.llm_spec, self.ssm_spec
        mesh = self.mesh
        pp, m, tp = self.pp, self.num_microbatches, self.tp
        b = self.max_requests
        bm = b // m
        w, dmax, tree = self.width, self.depth, self.tree
        cache_spec = self._pp._cache_spec
        layer_specs = self._pp._layer_specs
        kh_shard = cache_spec[3]
        stg_spec = P(PIPE_AXIS, None, None, kh_shard, None, None)
        depths_vec = make_depths_vec(w, dmax)
        draft_phase = build_draft_phase(ssm_spec, w, dmax)

        def piped_verify(stage_layers, ck, cv, h_mb, pos_mb, lens_mb, anc_mb):
            """Pipelined tree verification (manual region, one stage/device).

            Split-attention against this stage's committed cache rows plus
            the in-flight tree tokens under the ancestor mask; each stage's
            new tree KV is STAGED [L/P, B, KH, D, T], never committed here
            (acceptance decides which columns land)."""
            stage_layers = jax.tree.map(lambda a: a[0], stage_layers)
            ck, cv = ck[0], cv[0]  # [L/P, B, KH_loc, D, S]
            stage = jax.lax.axis_index(PIPE_AXIS)
            slopes = _stage_slopes(llm_spec, tp)

            def stage_body(x, pos, lens, anc, row0):
                ck_mb = jax.lax.dynamic_slice_in_dim(
                    ck, row0, x.shape[0], axis=1)
                cv_mb = jax.lax.dynamic_slice_in_dim(
                    cv, row0, x.shape[0], axis=1)

                def one_layer(hh, xs):
                    layer_p, ck_l, cv_l = xs

                    def attend(q, k, v):
                        q, k = decoder._maybe_rope(llm_spec, q, k, pos)
                        kc = k.astype(ck.dtype)
                        vc = v.astype(cv.dtype)
                        out = attn_lib.split_cached_attention(
                            q, ck_l, cv_l, kc, vc, lens,
                            new_mask=anc,
                            q_positions=pos,
                            slopes=slopes,
                            logit_softcap=llm_spec.attn_logit_softcap,
                        )
                        return out, (kc, vc)

                    hh, kv = decoder._layer(llm_spec, layer_p, hh, attend)
                    return hh, kv

                y, (k_new, v_new) = jax.lax.scan(
                    one_layer, x, (stage_layers, ck_mb, cv_mb))
                return y, k_new, v_new  # k_new [L/P, Bm, T, KH, D]

            ticks = m + pp - 1
            buf = jnp.zeros_like(h_mb[0])
            acc = jnp.zeros_like(h_mb)
            stg_shape = (ck.shape[0], b, ck.shape[2], ck.shape[3], tree)
            stg_k = jnp.zeros(stg_shape, ck.dtype)
            stg_v = jnp.zeros(stg_shape, cv.dtype)

            def tick(carry, i):
                buf, acc, stg_k, stg_v = carry
                incoming = jax.lax.ppermute(
                    buf, PIPE_AXIS, [(s, (s + 1) % pp) for s in range(pp)])
                my_mb = jnp.clip(i - stage, 0, m - 1)
                x_first = jax.lax.dynamic_index_in_dim(
                    h_mb, my_mb, keepdims=False)
                x = jnp.where(stage == 0, x_first, incoming)
                pos = jax.lax.dynamic_index_in_dim(
                    pos_mb, my_mb, keepdims=False)
                lens = jax.lax.dynamic_index_in_dim(
                    lens_mb, my_mb, keepdims=False)
                anc = jax.lax.dynamic_index_in_dim(
                    anc_mb, my_mb, keepdims=False)
                row0 = my_mb * bm
                y, k_new, v_new = stage_body(x, pos, lens, anc, row0)
                upd_k = k_new.transpose(0, 1, 3, 4, 2).astype(stg_k.dtype)
                upd_v = v_new.transpose(0, 1, 3, 4, 2).astype(stg_v.dtype)
                stg_k = jax.lax.dynamic_update_slice(
                    stg_k, upd_k, (0, row0, 0, 0, 0))
                stg_v = jax.lax.dynamic_update_slice(
                    stg_v, upd_v, (0, row0, 0, 0, 0))
                out_idx = jnp.clip(i - (pp - 1), 0, m - 1)
                take = (stage == pp - 1) & (i >= pp - 1)
                acc = jax.lax.cond(
                    take,
                    lambda a: jax.lax.dynamic_update_index_in_dim(
                        a, y, out_idx, 0),
                    lambda a: a,
                    acc,
                )
                return (y, acc, stg_k, stg_v), None

            (_, acc, stg_k, stg_v), _ = jax.lax.scan(
                tick, (buf, acc, stg_k, stg_v), jnp.arange(ticks))
            is_last = (stage == pp - 1).astype(acc.dtype)
            acc = jax.lax.psum(acc * is_last, PIPE_AXIS)
            return acc, stg_k[None], stg_v[None]

        run_verify = jax.shard_map(
            piped_verify,
            mesh=mesh,
            in_specs=(layer_specs, cache_spec, cache_spec, P(), P(), P(), P()),
            out_specs=(P(), stg_spec, stg_spec),
            check_vma=False,
        )

        def piped_commit(ck, cv, stg_k, stg_v, path, lens):
            """Per-stage commit of the accepted tree columns (manual region).

            Gathers ``path``'s columns from this stage's staged tree KV and
            window-commits them at each row's length — 2x the per-stage
            cache slice of traffic, once per iteration."""
            ck, cv = ck[0], cv[0]
            stg_k, stg_v = stg_k[0], stg_v[0]  # [L/P, B, KH, D, T]
            idx = path[None, :, None, None, :]  # [1, B, 1, 1, n]
            gk = jnp.take_along_axis(stg_k, idx, axis=4)
            gv = jnp.take_along_axis(stg_v, idx, axis=4)
            gk, gv = jax.lax.optimization_barrier((gk, gv))
            ck, cv = decoder.commit_kv_windows(ck, cv, gk, gv, lens)
            return ck[None], cv[None]

        run_commit = jax.shard_map(
            piped_commit,
            mesh=mesh,
            in_specs=(cache_spec, cache_spec, stg_spec, stg_spec, P(), P()),
            out_specs=(cache_spec, cache_spec),
            check_vma=False,
        )

        def verify_tree_pp(llm_params, llm_cache, cache_lens, tree_tokens,
                           anc_self):
            """Pipelined tree-verify pass -> (logits [B,T,V], staged KV)."""
            positions = (cache_lens[:, None] + depths_vec[None]).astype(
                jnp.int32)
            h = decoder._embed(llm_spec, llm_params, tree_tokens, positions)
            h_mb = h.reshape(m, bm, tree, -1)
            pos_mb = positions.reshape(m, bm, tree)
            lens_mb = cache_lens.reshape(m, bm)
            anc_mb = anc_self.reshape(m, bm, tree, tree)
            with decoder.manual_tp_axis(MODEL_AXIS):
                h_out, stg_k, stg_v = run_verify(
                    llm_params["layers"], llm_cache.k, llm_cache.v,
                    h_mb, pos_mb, lens_mb, anc_mb,
                )
            logits = decoder._unembed(
                llm_spec, llm_params, h_out.reshape(b, tree, -1))
            return logits, (stg_k, stg_v)

        def commit_pp(llm_cache, cache_lens, stg, path):
            ck, cv = run_commit(
                llm_cache.k, llm_cache.v, stg[0], stg[1], path, cache_lens)
            return KVCache(k=ck, v=cv)

        def fused_step_body(llm_params, ssm_params, llm_cache, ssm_cache,
                            cache_lens, roots):
            tree_tokens, tree_parents, anc_self, ssm_buf = draft_phase(
                ssm_params, ssm_cache, cache_lens, roots)
            logits, stg = verify_tree_pp(
                llm_params, llm_cache, cache_lens, tree_tokens, anc_self)
            expected = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            produced, n_acc, from_slots = greedy_accept_walk(
                expected, tree_tokens, tree_parents, dmax)
            path = from_slots[:, :dmax + 1]
            llm_cache = commit_pp(llm_cache, cache_lens, stg, path)
            ssm_cache = commit_from_buffer(
                ssm_cache, cache_lens, *ssm_buf, path)
            next_roots = jnp.take_along_axis(
                produced, (n_acc - 1)[:, None], axis=1)[:, 0]
            return produced, n_acc, next_roots, llm_cache, ssm_cache

        def fused_sample_step_body(llm_params, ssm_params, llm_cache,
                                   ssm_cache, cache_lens, roots, key, scfg):
            tree_tokens, tree_parents, anc_self, ssm_buf = draft_phase(
                ssm_params, ssm_cache, cache_lens, roots)
            logits, stg = verify_tree_pp(
                llm_params, llm_cache, cache_lens, tree_tokens, anc_self)
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
            llm_cache = commit_pp(llm_cache, cache_lens, stg, path)
            ssm_cache = commit_from_buffer(
                ssm_cache, cache_lens, *ssm_buf, path)
            next_roots = jnp.take_along_axis(
                produced, (n_acc - 1)[:, None], axis=1)[:, 0]
            return produced, n_acc, next_roots, llm_cache, ssm_cache

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def fused_step_fn(llm_params, ssm_params, llm_cache, ssm_cache,
                          cache_lens, roots):
            return fused_step_body(llm_params, ssm_params, llm_cache,
                                   ssm_cache, cache_lens, roots)

        @functools.partial(
            jax.jit, donate_argnums=(2, 3), static_argnames=("n",)
        )
        def fused_step_n_fn(llm_params, ssm_params, llm_cache, ssm_cache,
                            cache_lens, roots, n):
            def body(carry, _):
                llm_cache, ssm_cache, lens, roots = carry
                produced, n_acc, next_roots, llm_cache, ssm_cache = (
                    fused_step_body(llm_params, ssm_params, llm_cache,
                                    ssm_cache, lens, roots))
                return (llm_cache, ssm_cache, lens + n_acc, next_roots), (
                    produced, n_acc)

            (llm_cache, ssm_cache, lens_out, roots_out), (produced, n_acc) = (
                jax.lax.scan(
                    body, (llm_cache, ssm_cache, cache_lens, roots),
                    None, length=n))
            return produced, n_acc, lens_out, roots_out, llm_cache, ssm_cache

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def fused_sample_step_fn(llm_params, ssm_params, llm_cache, ssm_cache,
                                 cache_lens, roots, key, scfg):
            return fused_sample_step_body(llm_params, ssm_params, llm_cache,
                                          ssm_cache, cache_lens, roots, key,
                                          scfg)

        @functools.partial(
            jax.jit, donate_argnums=(2, 3), static_argnames=("n",)
        )
        def fused_sample_step_n_fn(llm_params, ssm_params, llm_cache,
                                   ssm_cache, cache_lens, roots, key, scfg, n):
            def body(carry, key_i):
                llm_cache, ssm_cache, lens, roots = carry
                produced, n_acc, next_roots, llm_cache, ssm_cache = (
                    fused_sample_step_body(llm_params, ssm_params, llm_cache,
                                           ssm_cache, lens, roots, key_i,
                                           scfg))
                return (llm_cache, ssm_cache, lens + n_acc, next_roots), (
                    produced, n_acc)

            (llm_cache, ssm_cache, lens_out, roots_out), (produced, n_acc) = (
                jax.lax.scan(
                    body, (llm_cache, ssm_cache, cache_lens, roots),
                    jax.random.split(key, n)))
            return produced, n_acc, lens_out, roots_out, llm_cache, ssm_cache

        # ---- SSM admission: prompt forward + slot-routed commit ----
        @functools.partial(jax.jit, donate_argnums=(1,))
        def ssm_prefill_batch_fn(ssm_params, ssm_cache, tokens, lengths,
                                 slots):
            nb, bucket = tokens.shape
            positions = jnp.broadcast_to(
                jnp.arange(bucket, dtype=jnp.int32)[None], (nb, bucket))
            _, (sk, sv) = decoder.forward(
                ssm_spec, ssm_params, tokens, positions,
                lengths=lengths, return_kv=True)
            upd_k = sk.transpose(0, 1, 3, 4, 2).astype(ssm_cache.k.dtype)
            upd_v = sv.transpose(0, 1, 3, 4, 2).astype(ssm_cache.v.dtype)
            ck, cv = decoder.commit_kv_windows(
                ssm_cache.k, ssm_cache.v, upd_k, upd_v,
                jnp.zeros((nb,), jnp.int32), slots)
            return KVCache(k=ck, v=cv)

        # ---- draft-cache catch-up (multi-SSM rotation; SpecEngine
        # analog): feed committed tokens this SSM has not yet seen ----
        @functools.partial(jax.jit, donate_argnums=(1,))
        def ssm_catchup_fn(ssm_params, ssm_cache, ssm_lens, tokens):
            _, cache = decoder.forward_cached(
                ssm_spec, ssm_params, tokens, ssm_cache, ssm_lens)
            return cache

        self._fused_step = fused_step_fn
        self._fused_step_n = fused_step_n_fn
        self._fused_sample_step = fused_sample_step_fn
        self._fused_sample_step_n = fused_sample_step_n_fn
        self._ssm_prefill_batch = ssm_prefill_batch_fn
        self._ssm_catchup = ssm_catchup_fn

    # ------------------------------------------------------------------
    # host-facing API (mirrors SpecEngine's fused surface)
    # ------------------------------------------------------------------

    def _h(self, x):
        arr = x if isinstance(x, jax.Array) else jnp.asarray(x)
        return jax.device_put(arr, self._replicated)

    def fetch(self, x):
        if not self._mesh_local:
            x = self._to_replicated(x)
        return jax.device_get(x)

    def prefill_both_batch(self, prompts, slots, key=None, scfg=None):
        """Admit requests into BOTH caches; returns [NB] first tokens.

        Verifier prompts run through the pipelined prefill (stage-resident
        cache writes + first-token sampling); the draft prefills replicated.
        """
        if scfg is None:
            nb = len(prompts)
            scfg = sampling_lib.SamplingConfig(
                temperature=np.zeros(nb, np.float32),
                top_p=np.ones(nb, np.float32),
                top_k=np.zeros(nb, np.int32))
            key = jax.random.PRNGKey(0)
        toks = self._pp.prefill_batch_to_slots_async(
            prompts, slots, key, scfg)

        nb = len(prompts)
        bucket = max(self._pp.prefill_bucket(len(p)) for p in prompts)
        padded = np.zeros((nb, bucket), np.int32)
        lengths = np.ones((nb,), np.int32)
        for i, p in enumerate(prompts):
            padded[i, : len(p)] = p
            lengths[i] = len(p)
        self.ssm_cache = self._ssm_prefill_batch(
            self.ssm_params, self.ssm_cache, self._h(padded),
            self._h(lengths), self._h(np.asarray(slots, np.int32)))
        return [int(t) for t in self.fetch(toks)]

    def prefill_both(self, prompt_tokens, slot, key=None, scfg1=None):
        return self.prefill_both_batch([prompt_tokens], [slot], key, scfg1)[0]

    def prefill_ssm_only(self, prompt_tokens, slot) -> None:
        """Prefill only this engine's (replicated) draft cache — multi-SSM
        admission where the staged verifier cache is shared."""
        n = len(prompt_tokens)
        bucket = self._pp.prefill_bucket(n)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :n] = prompt_tokens
        self.ssm_cache = self._ssm_prefill_batch(
            self.ssm_params, self.ssm_cache, self._h(padded),
            self._h(np.asarray([n], np.int32)),
            self._h(np.asarray([slot], np.int32)))

    def catchup(self, ssm_lens, tokens) -> None:
        """Advance the draft cache over already-committed tokens (the
        multi-SSM rotation's re-commit semantics; see SpecEngine.catchup)."""
        self.ssm_cache = self._ssm_catchup(
            self.ssm_params, self.ssm_cache,
            self._h(np.asarray(ssm_lens, np.int32)),
            self._h(np.asarray(tokens, np.int32)))

    def fused_step(self, cache_lens, root_tokens, window=None):
        produced, n_acc, _roots, self.llm_cache, self.ssm_cache = (
            self._fused_step(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                self._h(np.asarray(cache_lens, np.int32)),
                self._h(np.asarray(root_tokens, np.int32)),
            )
        )
        return self.fetch(produced), self.fetch(n_acc)

    def attn_window_bucket(self, max_len: int):
        """Length-aware windows are not plumbed through the stage-
        resident PP spec programs — full cache reads (see
        PipelineInferenceEngine.attn_window_bucket)."""
        return None

    def fused_step_n(self, cache_lens, root_tokens, n, window=None):
        produced, n_acc, _l, _r, self.llm_cache, self.ssm_cache = (
            self._fused_step_n(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                self._h(np.asarray(cache_lens, np.int32)),
                self._h(np.asarray(root_tokens, np.int32)),
                n,
            )
        )
        return self.fetch(produced), self.fetch(n_acc)

    def fused_step_n_async(self, lens_dev, roots_dev, n, window=None):
        produced, n_acc, lens_out, roots_out, self.llm_cache, self.ssm_cache = (
            self._fused_step_n(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                lens_dev, roots_dev, n,
            )
        )
        return produced, n_acc, lens_out, roots_out

    def fused_sample_step(self, cache_lens, root_tokens, key, scfg):
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

    def fused_sample_step_n(self, cache_lens, root_tokens, key, scfg, n,
                            window=None):
        produced, n_acc, _l, _r, self.llm_cache, self.ssm_cache = (
            self._fused_sample_step_n(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                self._h(np.asarray(cache_lens, np.int32)),
                self._h(np.asarray(root_tokens, np.int32)),
                self._h(key), jax.tree_util.tree_map(self._h, scfg), n,
            )
        )
        return self.fetch(produced), self.fetch(n_acc)

    def fused_sample_step_n_async(self, lens_dev, roots_dev, key, scfg, n,
                                  window=None):
        produced, n_acc, lens_out, roots_out, self.llm_cache, self.ssm_cache = (
            self._fused_sample_step_n(
                self.llm_params, self.ssm_params,
                self.llm_cache, self.ssm_cache,
                lens_dev, roots_dev,
                self._h(key), jax.tree_util.tree_map(self._h, scfg), n,
            )
        )
        return produced, n_acc, lens_out, roots_out

    def apply_slot_overrides(self, lens_dev, roots_dev, mask, new_lens,
                             new_roots):
        return _apply_overrides_jit(
            lens_dev, roots_dev, self._h(np.asarray(mask, bool)),
            self._h(np.asarray(new_lens, np.int32)),
            self._h(np.asarray(new_roots, np.int32)),
        )

    # unfused host-loop surface: not supported under PP (the fused manager
    # is the only driver LLM.compile pairs with this engine)
    def draft_tree(self, *a, **k):
        raise NotImplementedError(
            "unfused speculative loop under PP; use SpecRequestManager("
            "fused=True)")

    verify = draft_tree
    commit = draft_tree
