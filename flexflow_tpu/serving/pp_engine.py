"""Pipeline-parallel serving engine: stage-resident weights + KV cache.

TPU-native replacement for the reference's pipeline-parallel serving
(/root/reference/src/runtime/inference_manager.cc:87-130 — layers binned into
stages by ``transformer_layer_id`` -> ``MachineView.start_device_id``, with
Legion moving activations between stages and pipelining coming from multiple
in-flight batches, request_manager.cc:3122-3137).

Design (mirrors the training pipeline executor, parallel/pipeline.py, but over
the *cached* decode path):

- layer params are stage-stacked ``[P, L/P, ...]`` with the ``[P]`` axis
  sharded over the ``pipe`` mesh axis — each device holds ONLY its own
  stage's layers (1/P of the transformer weights; replaces the round-1
  replicate-over-pipe fallback);
- the KV cache is likewise stage-stacked ``[P, L/P, B, KH, D, S]`` and
  pipe-sharded: each stage owns the KV for its own layers;
- one serving step is a fully-manual ``shard_map`` over ("pipe", "model"):
  the request slots split into M microbatches and M + P - 1 ticks rotate
  activations stage-to-stage with ``lax.ppermute`` (an ICI neighbor hop —
  the analog of Legion's region-dependence data movement). Inter-microbatch
  pipelining gives M/(M+P-1) utilization — the compiled analog of the
  reference's 4-deep in-flight batch queue;
- TP composes inside the manual region: stage layer leaves carry the
  ``model`` axis (Megatron column/row layout) and the decoder emits explicit
  psums via ``decoder.manual_tp_axis`` (the reference's AllReduce op);
- each stage accumulates its new-token KV in a staging buffer across ticks
  and commits ONCE per step via :func:`decoder.commit_kv_windows`.

Embedding / final norm / lm_head are replicated over ``pipe`` (a few percent
of weights) and run outside the manual region, as the reference keeps them
outside the transformer-stage binning.

Serving data parallelism is rejected here exactly like the reference
(``assert data_parallelism_degree == 1``, inference_manager.cc:69); DP
serving without PP is available through the base InferenceEngine.
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
from flexflow_tpu.ops.sampling import SamplingConfig
from flexflow_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS
from flexflow_tpu.parallel.pipeline import _MODEL_AXIS_POS, stage_params
from flexflow_tpu.specs import ModelSpec



def _stage_slopes(spec: ModelSpec, tp: int):
    """Per-TP-shard ALiBi slope slice (call INSIDE the manual region).

    The head-sharding condition must match _staged_layer_specs' wq rule;
    shared by the decode/prefill/chunk tick loops, the overlapped horizon,
    and pp_spec's tree verify (round-3 review: three stale-prone copies)."""
    slopes_full = decoder._alibi_slopes(spec)
    if slopes_full is None:
        return None
    if tp > 1 and spec.num_heads % tp == 0:
        h_loc = spec.num_heads // tp
        return jax.lax.dynamic_slice_in_dim(
            slopes_full, jax.lax.axis_index(MODEL_AXIS) * h_loc, h_loc)
    return slopes_full

def _staged_layer_specs(layers, mesh: Mesh):
    """PartitionSpecs for stage-stacked layer params [P, L/P, ...]."""
    tp = mesh.shape[MODEL_AXIS]

    def leaf_spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        pos = _MODEL_AXIS_POS.get(name)
        parts = [None] * leaf.ndim
        parts[0] = PIPE_AXIS
        if pos is not None and tp > 1 and leaf.shape[pos] % tp == 0:
            parts[pos] = MODEL_AXIS
        return P(*parts)

    return jax.tree_util.tree_map_with_path(leaf_spec, layers)


class PipelineInferenceEngine:
    """Drop-in InferenceEngine replacement when pipeline_parallelism_degree>1.

    Exposes the host-facing surface the RequestManager drives
    (``prefill_batch_to_slots_async`` / ``prefill_to_slot_async`` /
    ``decode`` / ``decode_horizon[_async]`` / ``fetch``).
    """

    def __init__(
        self,
        spec: ModelSpec,
        params,
        *,
        mesh: Mesh,
        max_requests_per_batch: int = 8,
        max_seq_len: int = 256,
        max_tokens_per_batch: int = 0,
        min_prefill_bucket: int = 16,
        cache_dtype=jnp.bfloat16,
        num_microbatches: Optional[int] = None,
        lora=None,
        lora_config=None,
    ):
        self.spec = spec
        self.mesh = mesh
        self.pp = mesh.shape[PIPE_AXIS]
        self.tp = mesh.shape[MODEL_AXIS]
        if mesh.shape[DATA_AXIS] != 1:
            # reference parity: serving asserts data_parallelism_degree == 1
            # (inference_manager.cc:69); DP+PP composition is future work
            raise NotImplementedError(
                "pipeline-parallel serving requires data axis == 1"
            )
        if spec.num_layers % self.pp != 0:
            raise ValueError(
                f"num_layers {spec.num_layers} not divisible by "
                f"pipeline stages {self.pp}"
            )
        m = num_microbatches or self.pp
        if max_requests_per_batch % m:
            raise ValueError(
                f"batch {max_requests_per_batch} not divisible by "
                f"microbatches {m}"
            )
        self.num_microbatches = m
        self.max_requests = max_requests_per_batch
        self.max_seq_len = max_seq_len
        # >0 enables chunked prefill (token-budgeted prompt phase)
        self.max_tokens_per_batch = int(max_tokens_per_batch)
        self.min_prefill_bucket = min_prefill_bucket
        # ---- PEFT: per-request-routed LoRA adapter stacks, stage-stacked
        # like the layers ([L,N,...] -> [P, L/P, N, ...] pipe-sharded). The
        # adapter deltas are computed on LOGICAL projection outputs, so TP>1
        # (locally-sharded projections in the manual region) is rejected.
        self.lora = lora
        if lora is not None:
            if self.tp > 1:
                raise NotImplementedError(
                    "LoRA under pipeline parallelism requires "
                    "tensor_parallelism_degree == 1"
                )
            from flexflow_tpu.peft import lora_scaling

            self.lora_scale = (
                lora_scaling(lora_config) if lora_config else 1.0)
            self.num_adapters = next(iter(lora.values()))["a"].shape[1]
            staged_lora = jax.tree.map(
                lambda a: a.reshape(
                    self.pp, a.shape[0] // self.pp, *a.shape[1:]),
                lora,
            )
            self._lora_specs = jax.tree.map(
                lambda a: P(*([PIPE_AXIS] + [None] * (a.ndim - 1))),
                staged_lora,
            )
            self.lora = jax.device_put(
                staged_lora,
                jax.tree.map(lambda s: NamedSharding(mesh, s),
                             self._lora_specs),
            )
        else:
            self.lora_scale = 1.0
            self.num_adapters = 0

        # ---- place params: layers stage-stacked on pipe, rest replicated
        layers = stage_params(params["layers"], self.pp)
        self._layer_specs = _staged_layer_specs(layers, mesh)
        layers = jax.device_put(
            layers,
            jax.tree.map(lambda s: NamedSharding(mesh, s), self._layer_specs),
        )
        top = {k: v for k, v in params.items() if k != "layers"}
        top = jax.device_put(top, NamedSharding(mesh, P()))
        self.params = {**top, "layers": layers}

        # ---- stage-stacked KV cache [P, L/P, B, KH, D, S]
        kh = spec.num_kv_heads
        kh_shard = MODEL_AXIS if (self.tp > 1 and kh % self.tp == 0) else None
        cshape = (
            self.pp, spec.num_layers // self.pp, max_requests_per_batch,
            kh, spec.head_dim, max_seq_len,
        )
        self._cache_spec = P(PIPE_AXIS, None, None, kh_shard, None, None)
        cshard = NamedSharding(mesh, self._cache_spec)
        self.cache = KVCache(
            k=jax.device_put(jnp.zeros(cshape, cache_dtype), cshard),
            v=jax.device_put(jnp.zeros(cshape, cache_dtype), cshard),
        )
        self._replicated = NamedSharding(mesh, P())
        self._mesh_local = all(
            d.process_index == jax.process_index() for d in mesh.devices.flat
        )
        self._to_replicated = jax.jit(
            lambda x: x, out_shardings=self._replicated
        )

        self._build_steps()

    # ------------------------------------------------------------------
    # compiled step functions
    # ------------------------------------------------------------------

    def _build_steps(self):
        spec = self.spec
        mesh = self.mesh
        pp, m = self.pp, self.num_microbatches
        tp = self.tp
        b = self.max_requests
        bm = b // m
        cache_spec = self._cache_spec
        act = P()  # [M, Bm, T, D] replicated (dp == 1)
        vec2 = P()  # [M, Bm]
        has_lora = self.lora is not None
        lora_scale = self.lora_scale

        def make_piped(mode: str):
            """Pipelined tick loop over the stage layers (manual region).

            Modes:
            - ``decode``: cached attention against this stage's KV; per-row
              commit window at ``starts[row]`` (slots unused).
            - ``prefill``: pure causal self-attention (fresh slots), slot-
              routed commit at position 0 (``slots`` holds slot ids, -1 =
              padding row that writes nothing; starts unused).
            - ``chunk``: chunked prefill — cached attention against the
              already-committed prompt prefix (length ``lens``) with causal
              masking among the chunk's tokens, slot-routed commit at
              ``starts`` (the chunk's offset). The reference's token-budget
              prompt phase (request_manager.cc:860-940).
            """
            prefill = mode == "prefill"

            def piped(stage_layers, ck, cv, h_mb, pos_mb, lens_mb, starts,
                      slots, *extra):
                stage_layers = jax.tree.map(lambda a: a[0], stage_layers)
                ck, cv = ck[0], cv[0]  # [L/P, B, KH_loc, D, S]
                stage = jax.lax.axis_index(PIPE_AXIS)
                t = h_mb.shape[2]
                if has_lora:
                    lora_st, onehot = extra
                    lora_stage = jax.tree.map(lambda a: a[0], lora_st)
                slopes = _stage_slopes(spec, tp)

                def stage_body(x, pos, lens, row0):
                    """This stage's layers on one microbatch.

                    ``row0`` = the microbatch's first request-slot row;
                    cached attention reads only those Bm cache rows.
                    Returns (y, k_new [L/P, Bm, T, KH, D], v_new)."""

                    if prefill:
                        qi = pos[:, :, None]
                        ki = pos[:, None, :]
                        mask = ki <= qi
                        ck_mb = cv_mb = None
                    else:
                        ck_mb = jax.lax.dynamic_slice_in_dim(
                            ck, row0, x.shape[0], axis=1
                        )
                        cv_mb = jax.lax.dynamic_slice_in_dim(
                            cv, row0, x.shape[0], axis=1
                        )

                    if has_lora:
                        oh_mb = jax.lax.dynamic_slice_in_dim(
                            onehot, row0, x.shape[0], axis=0)

                    def one_layer(hh, xs):
                        if prefill:
                            layer_p = xs[0] if has_lora else xs
                        else:
                            layer_p, ck_l, cv_l = xs[:3]
                        if has_lora:
                            layer_p = {
                                **layer_p,
                                "_lora": xs[-1],
                                "_lora_onehot": oh_mb,
                                "_lora_scale": lora_scale,
                            }

                        def attend(q, k, v):
                            q, k = decoder._maybe_rope(spec, q, k, pos)
                            kc = k.astype(ck.dtype)
                            vc = v.astype(cv.dtype)
                            if prefill:
                                out = attn_lib.cached_attention(
                                    q, k, v,
                                    cache_lens=jnp.zeros(
                                        (x.shape[0],), jnp.int32
                                    ),
                                    tree_mask=mask,
                                    q_positions=pos,
                                    slopes=slopes,
                                    logit_softcap=spec.attn_logit_softcap,
                                )
                            else:
                                out = attn_lib.split_cached_attention(
                                    q, ck_l, cv_l, kc, vc, lens,
                                    q_positions=pos,
                                    slopes=slopes,
                                    logit_softcap=spec.attn_logit_softcap,
                                )
                            return out, (kc, vc)

                        hh, kv = decoder._layer(spec, layer_p, hh, attend)
                        return hh, kv

                    xs = (
                        (stage_layers,)
                        if prefill
                        else (stage_layers, ck_mb, cv_mb)
                    )
                    if has_lora:
                        xs = xs + (lora_stage,)
                    elif prefill:
                        xs = stage_layers
                    y, (k_new, v_new) = jax.lax.scan(one_layer, x, xs)
                    return y, k_new, v_new

                ticks = m + pp - 1
                buf = jnp.zeros_like(h_mb[0])
                acc = jnp.zeros_like(h_mb)
                stg_shape = (ck.shape[0], b, ck.shape[2], ck.shape[3], t)
                stg_k = jnp.zeros(stg_shape, ck.dtype)
                stg_v = jnp.zeros(stg_shape, cv.dtype)

                def tick(carry, i):
                    buf, acc, stg_k, stg_v = carry
                    incoming = jax.lax.ppermute(
                        buf, PIPE_AXIS,
                        [(s, (s + 1) % pp) for s in range(pp)],
                    )
                    # stage s processes microbatch (i - s) at tick i
                    my_mb = jnp.clip(i - stage, 0, m - 1)
                    x_first = jax.lax.dynamic_index_in_dim(
                        h_mb, my_mb, keepdims=False
                    )
                    x = jnp.where(stage == 0, x_first, incoming)
                    pos = jax.lax.dynamic_index_in_dim(
                        pos_mb, my_mb, keepdims=False
                    )
                    lens = jax.lax.dynamic_index_in_dim(
                        lens_mb, my_mb, keepdims=False
                    )
                    row0 = my_mb * bm
                    y, k_new, v_new = stage_body(x, pos, lens, row0)
                    # stash this microbatch's new KV at its row offset
                    # (bubble ticks recompute a clipped boundary microbatch;
                    # the duplicate write is idempotent)
                    upd_k = k_new.transpose(0, 1, 3, 4, 2).astype(stg_k.dtype)
                    upd_v = v_new.transpose(0, 1, 3, 4, 2).astype(stg_v.dtype)
                    stg_k = jax.lax.dynamic_update_slice(
                        stg_k, upd_k, (0, row0, 0, 0, 0)
                    )
                    stg_v = jax.lax.dynamic_update_slice(
                        stg_v, upd_v, (0, row0, 0, 0, 0)
                    )
                    out_idx = jnp.clip(i - (pp - 1), 0, m - 1)
                    take = (stage == pp - 1) & (i >= pp - 1)
                    acc = jax.lax.cond(
                        take,
                        lambda a: jax.lax.dynamic_update_index_in_dim(
                            a, y, out_idx, 0
                        ),
                        lambda a: a,
                        acc,
                    )
                    return (y, acc, stg_k, stg_v), None

                (_, acc, stg_k, stg_v), _ = jax.lax.scan(
                    tick, (buf, acc, stg_k, stg_v), jnp.arange(ticks)
                )
                # commit this stage's staged KV for all rows in one pass
                if prefill:
                    ck, cv = decoder.commit_kv_windows(
                        ck, cv, stg_k, stg_v,
                        jnp.zeros((b,), jnp.int32), slots,
                    )
                elif mode == "chunk":
                    ck, cv = decoder.commit_kv_windows(
                        ck, cv, stg_k, stg_v, starts, slots
                    )
                else:
                    ck, cv = decoder.commit_kv_windows(
                        ck, cv, stg_k, stg_v, starts
                    )
                # broadcast the last stage's outputs to every stage
                is_last = (stage == pp - 1).astype(acc.dtype)
                acc = jax.lax.psum(acc * is_last, PIPE_AXIS)
                return acc, ck[None], cv[None]

            in_specs = (
                self._layer_specs, cache_spec, cache_spec,
                act, vec2, vec2, P(), P(),
            )
            if has_lora:
                in_specs = in_specs + (self._lora_specs, P())
            return jax.shard_map(
                piped,
                mesh=mesh,
                in_specs=in_specs,
                out_specs=(act, cache_spec, cache_spec),
                check_vma=False,
            )

        run_decode = make_piped("decode")
        run_prefill = make_piped("prefill")
        run_chunk = make_piped("chunk")

        def pipe_pass(run, params, cache, tokens, positions, lens, starts,
                      slots=None, lora=None, onehot=None):
            """tokens [B, T] -> (h_out [B, T, D], cache)."""
            t = tokens.shape[1]
            h = decoder._embed(spec, params, tokens, positions)
            h_mb = h.reshape(m, bm, t, -1)
            pos_mb = positions.reshape(m, bm, t)
            lens_mb = lens.reshape(m, bm)
            if slots is None:
                slots = jnp.zeros((b,), jnp.int32)
            extra = ()
            if has_lora:
                if onehot is None:
                    onehot = jnp.zeros(
                        (b, self.num_adapters), jnp.float32)
                extra = (lora, onehot)
            with decoder.manual_tp_axis(MODEL_AXIS):
                h_out, ck, cv = run(
                    params["layers"], cache.k, cache.v,
                    h_mb, pos_mb, lens_mb, starts, slots, *extra,
                )
            return h_out.reshape(b, t, -1), KVCache(ck, cv)

        @functools.partial(
            jax.jit, donate_argnums=(1,), static_argnames=("greedy_only",)
        )
        def decode_fn(params, cache, cache_lens, tokens, key, scfg,
                      lora=None, onehot=None, greedy_only=False):
            h_out, cache = pipe_pass(
                run_decode, params, cache, tokens[:, None],
                cache_lens[:, None], cache_lens, cache_lens,
                lora=lora, onehot=onehot,
            )
            logits = decoder._unembed(spec, params, h_out)
            nt = sampling_lib.sample(
                logits[:, 0], key, scfg, greedy_only=greedy_only
            )
            return nt, cache

        @functools.partial(
            jax.jit, donate_argnums=(1,),
            static_argnames=("n", "greedy_only"),
        )
        def decode_n_fn(params, cache, cache_lens, tokens, key, scfg, n,
                        lora=None, onehot=None, greedy_only=False):
            """n chained decode steps (device-resident horizon).

            Each step commits its stage KV (2x the per-stage cache slice —
            1/P of the global cache per device, so per-device traffic stays
            proportional to per-device state)."""

            def step(carry, i):
                cache, toks = carry
                lens_i = cache_lens + i
                h_out, cache = pipe_pass(
                    run_decode, params, cache, toks[:, None],
                    lens_i[:, None], lens_i, lens_i,
                    lora=lora, onehot=onehot,
                )
                logits = decoder._unembed(spec, params, h_out)
                nt = sampling_lib.sample(
                    logits[:, 0], jax.random.fold_in(key, i), scfg,
                    greedy_only=greedy_only,
                )
                return (cache, nt), nt

            (cache, _), out = jax.lax.scan(
                step, (cache, tokens), jnp.arange(n, dtype=jnp.int32)
            )
            return out, cache

        # ---- software-pipelined decode horizon (fills the pipeline) ----
        #
        # The stepwise decode_n runs n separate pipe passes: n*(M+P-1) ticks,
        # utilization M/(M+P-1) per step — the bubble repaid every step. Here
        # the n steps stream CONTINUOUSLY through the stages: stage 0 starts
        # step s+1 microbatch j the tick after step s's microbatch j leaves
        # the last stage (its sampled token rides the same ppermute ring
        # back), so the whole horizon costs n*M + P - 1 ticks — ONE bubble
        # per horizon. This is the compiled analog of the reference keeping
        # 4 batches in flight to fill its pipeline
        # (/root/reference/src/runtime/request_manager.cc:3122-3137).
        #
        # Horizon KV is staged in-register per stage ([L/P, B, KH, D, n+1],
        # column n = scratch for bubble ticks) and attended via
        # split_cached_attention's in-flight columns; ONE cache commit per
        # horizon (2x per-stage cache traffic per n tokens, vs per step).
        # Requires M >= P so the feedback token never arrives late
        # (num_microbatches defaults to P).
        def make_piped_horizon(n, greedy_only):
            ln = spec.num_layers // pp
            nm = n * m

            def piped(top, stage_layers, ck, cv, tokens0, lens, key, scfg,
                      *extra):
                stage_layers = jax.tree.map(lambda a: a[0], stage_layers)
                ck, cv = ck[0], cv[0]  # [L/P, B, KH_loc, D, S]
                stage = jax.lax.axis_index(PIPE_AXIS)
                if has_lora:
                    lora_st, onehot = extra
                    lora_stage = jax.tree.map(lambda a: a[0], lora_st)
                slopes = _stage_slopes(spec, tp)

                tok_buf0 = tokens0.reshape(m, bm)
                lens_mb = lens.reshape(m, bm)
                scfg_mb = jax.tree.map(lambda f: f.reshape(m, bm), scfg)
                stg_shape = (ln, b, ck.shape[2], ck.shape[3], n + 1)
                stg_k0 = jnp.zeros(stg_shape, ck.dtype)
                stg_v0 = jnp.zeros(stg_shape, cv.dtype)
                x_proto = decoder._embed(
                    spec, top, tok_buf0[0][:, None], lens_mb[0][:, None])
                acc0 = jnp.zeros((nm, bm), jnp.int32)
                cols = jnp.arange(n + 1, dtype=jnp.int32)

                def tick(carry, i):
                    y, t_prev, tok_buf, acc, stg_k, stg_v = carry
                    ring = [(s_, (s_ + 1) % pp) for s_ in range(pp)]
                    inc_h = jax.lax.ppermute(y, PIPE_AXIS, ring)
                    inc_t = jax.lax.ppermute(t_prev, PIPE_AXIS, ring)

                    # stage 0: bank the token that left the last stage at
                    # tick i-1 (step s, mb j) -> feeds (step s+1, mb j)
                    arr = i - 1 - (pp - 1)
                    arr_ok = (stage == 0) & (arr >= 0) & (arr < nm)
                    arr_mb = jnp.remainder(jnp.clip(arr, 0), m)
                    tok_buf = jnp.where(
                        arr_ok,
                        jax.lax.dynamic_update_index_in_dim(
                            tok_buf, inc_t, arr_mb, 0),
                        tok_buf,
                    )

                    # stage-0 input: embed its pending token for (s0, j0)
                    idx0 = jnp.clip(i, 0, nm - 1)
                    s0, j0 = idx0 // m, idx0 % m
                    tok0 = jax.lax.dynamic_index_in_dim(
                        tok_buf, j0, keepdims=False)
                    lens0 = jax.lax.dynamic_index_in_dim(
                        lens_mb, j0, keepdims=False)
                    x0 = decoder._embed(
                        spec, top, tok0[:, None], (lens0 + s0)[:, None])
                    x = jnp.where(stage == 0, x0, inc_h)

                    # this stage's (step, mb) at this tick
                    idx = i - stage
                    valid = (idx >= 0) & (idx < nm)
                    idxc = jnp.clip(idx, 0, nm - 1)
                    s_my, j_my = idxc // m, idxc % m
                    row0 = j_my * bm
                    lens_row = jax.lax.dynamic_index_in_dim(
                        lens_mb, j_my, keepdims=False)
                    pos_my = (lens_row + s_my)[:, None]  # [Bm, 1]
                    ck_mb = jax.lax.dynamic_slice_in_dim(ck, row0, bm, axis=1)
                    cv_mb = jax.lax.dynamic_slice_in_dim(cv, row0, bm, axis=1)
                    sk_mb = jax.lax.dynamic_slice_in_dim(
                        stg_k, row0, bm, axis=1)
                    sv_mb = jax.lax.dynamic_slice_in_dim(
                        stg_v, row0, bm, axis=1)
                    nmask = jnp.broadcast_to(
                        ((cols < s_my) | (cols == n))[None, None],
                        (bm, 1, n + 1),
                    )
                    npos = jnp.concatenate(
                        [lens_row[:, None] + cols[None, :n], pos_my], axis=1)

                    if has_lora:
                        oh_mb = jax.lax.dynamic_slice_in_dim(
                            onehot, row0, bm, axis=0)

                    def one_layer(hh, xs):
                        layer_p, ck_l, cv_l, sk_l, sv_l = xs[:5]
                        if has_lora:
                            layer_p = {
                                **layer_p,
                                "_lora": xs[-1],
                                "_lora_onehot": oh_mb,
                                "_lora_scale": lora_scale,
                            }

                        def attend(q, k, v):
                            q, k = decoder._maybe_rope(spec, q, k, pos_my)
                            kc = k.astype(ck.dtype)
                            vc = v.astype(cv.dtype)
                            k_st = sk_l[..., :n].transpose(0, 3, 1, 2)
                            v_st = sv_l[..., :n].transpose(0, 3, 1, 2)
                            kn = jnp.concatenate([k_st, kc], axis=1)
                            vn = jnp.concatenate([v_st, vc], axis=1)
                            out = attn_lib.split_cached_attention(
                                q, ck_l, cv_l, kn, vn, lens_row,
                                new_mask=nmask,
                                q_positions=pos_my,
                                new_positions=npos,
                                slopes=slopes,
                                logit_softcap=spec.attn_logit_softcap,
                            )
                            return out, (kc, vc)

                        hh, kv = decoder._layer(spec, layer_p, hh, attend)
                        return hh, kv

                    h_xs = (stage_layers, ck_mb, cv_mb, sk_mb, sv_mb)
                    if has_lora:
                        h_xs = h_xs + (lora_stage,)
                    y_my, (k_new, v_new) = jax.lax.scan(one_layer, x, h_xs)

                    # stage the new column (bubble ticks -> scratch col n)
                    s_w = jnp.where(valid, s_my, n)
                    upd_k = k_new.transpose(0, 1, 3, 4, 2).astype(stg_k.dtype)
                    upd_v = v_new.transpose(0, 1, 3, 4, 2).astype(stg_v.dtype)
                    stg_k = jax.lax.dynamic_update_slice(
                        stg_k, upd_k, (0, row0, 0, 0, s_w))
                    stg_v = jax.lax.dynamic_update_slice(
                        stg_v, upd_v, (0, row0, 0, 0, s_w))

                    # last stage: unembed + sample this microbatch's token
                    def emit(_):
                        logits = decoder._unembed(spec, top, y_my)
                        scfg_rows = jax.tree.map(
                            lambda f: jax.lax.dynamic_index_in_dim(
                                f, j_my, keepdims=False),
                            scfg_mb,
                        )
                        # per-row keying (sample folds key by global row):
                        # fold_in(key, step) + row_offset makes this BIT-
                        # EQUAL to the stepwise decode_n path at any
                        # temperature, not just distributionally correct
                        return sampling_lib.sample(
                            logits[:, 0], jax.random.fold_in(key, s_my),
                            scfg_rows, greedy_only=greedy_only,
                            row_offset=row0)

                    take = (stage == pp - 1) & valid
                    t_out = jax.lax.cond(
                        take, emit, lambda _: jnp.zeros((bm,), jnp.int32),
                        None)
                    acc = jnp.where(
                        take,
                        jax.lax.dynamic_update_index_in_dim(
                            acc, t_out, idxc, 0),
                        acc,
                    )
                    return (y_my, t_out, tok_buf, acc, stg_k, stg_v), None

                t0 = jnp.zeros((bm,), jnp.int32)
                (y, t_prev, tok_buf, acc, stg_k, stg_v), _ = jax.lax.scan(
                    tick,
                    (jnp.zeros_like(x_proto), t0, tok_buf0, acc0,
                     stg_k0, stg_v0),
                    jnp.arange(nm + pp - 1),
                )
                # one commit for the whole horizon window [lens, lens+n)
                ck, cv = decoder.commit_kv_windows(
                    ck, cv, stg_k[..., :n], stg_v[..., :n], lens)
                is_last = (stage == pp - 1).astype(jnp.int32)
                acc = jax.lax.psum(acc * is_last, PIPE_AXIS)
                return acc, ck[None], cv[None]

            h_in_specs = (P(), self._layer_specs, cache_spec, cache_spec,
                          P(), P(), P(), P())
            if has_lora:
                h_in_specs = h_in_specs + (self._lora_specs, P())
            return jax.shard_map(
                piped,
                mesh=mesh,
                in_specs=h_in_specs,
                out_specs=(P(), cache_spec, cache_spec),
                check_vma=False,
            )

        @functools.partial(
            jax.jit, donate_argnums=(1,),
            static_argnames=("n", "greedy_only"),
        )
        def decode_n_overlap_fn(params, cache, cache_lens, tokens, key, scfg,
                                n, lora=None, onehot=None, greedy_only=False):
            """n decode steps streamed through the pipeline (one bubble)."""
            run = make_piped_horizon(n, greedy_only)
            top = {k: v for k, v in params.items() if k != "layers"}
            extra = ()
            if has_lora:
                if onehot is None:
                    onehot = jnp.zeros((b, self.num_adapters), jnp.float32)
                extra = (lora, onehot)
            with decoder.manual_tp_axis(MODEL_AXIS):
                acc, ck, cv = run(
                    top, params["layers"], cache.k, cache.v,
                    tokens, cache_lens, key, scfg, *extra,
                )
            # [n*M, Bm] tick-order tokens -> [n, B] slot-order
            out = acc.reshape(n, m, bm).reshape(n, b)
            return out, KVCache(ck, cv)

        @functools.partial(
            jax.jit, donate_argnums=(1,), static_argnames=("greedy_only",)
        )
        def prefill_batch_fn(params, cache, tokens, lengths, slots, key, scfg,
                             lora=None, onehot=None, greedy_only=False):
            """Batched admission under PP: [B, bucket] rows (padded to the
            full slot count so the pipeline row shape is uniform; pad rows
            carry slot -1 and write nothing)."""
            nb, bucket = tokens.shape
            positions = jnp.broadcast_to(
                jnp.arange(bucket, dtype=jnp.int32)[None], (nb, bucket)
            )
            h_out, cache = pipe_pass(
                run_prefill, params, cache, tokens, positions,
                jnp.zeros((nb,), jnp.int32), jnp.zeros((nb,), jnp.int32),
                slots, lora=lora, onehot=onehot,
            )
            logits = decoder._unembed(spec, params, h_out)
            last = jnp.take_along_axis(
                logits, (lengths - 1)[:, None, None], axis=1
            )[:, 0]
            toks = sampling_lib.sample(last, key, scfg, greedy_only=greedy_only)
            return toks, cache

        @functools.partial(
            jax.jit, donate_argnums=(1,), static_argnames=("greedy_only",)
        )
        def chunk_prefill_fn(params, cache, tokens, starts, slots, last_idx,
                             key, scfg, lora=None, onehot=None,
                             greedy_only=False):
            """One [B, C] prompt chunk: cached attention against the
            committed prefix (length ``starts``), causal within the chunk,
            slot-routed window commit at ``starts``. Returns each row's
            sampled token from its ``last_idx`` position (the caller keeps
            only the final chunk's)."""
            nb, c = tokens.shape
            positions = starts[:, None] + jnp.arange(c, dtype=jnp.int32)[None]
            h_out, cache = pipe_pass(
                run_chunk, params, cache, tokens, positions, starts, starts,
                slots, lora=lora, onehot=onehot,
            )
            logits = decoder._unembed(spec, params, h_out)
            last = jnp.take_along_axis(
                logits, last_idx[:, None, None], axis=1)[:, 0]
            toks = sampling_lib.sample(last, key, scfg, greedy_only=greedy_only)
            return toks, cache

        self._chunk_prefill = chunk_prefill_fn
        self._decode = decode_fn
        # overlapped horizon needs M >= P (the feedback token must be back
        # at stage 0 before its microbatch's next step starts)
        self._decode_n = (
            decode_n_overlap_fn if m >= pp else decode_n_fn
        )
        self._decode_n_stepwise = decode_n_fn
        self.horizon_ticks = (
            (lambda n: n * m + pp - 1) if m >= pp
            else (lambda n: n * (m + pp - 1))
        )
        self._prefill_batch = prefill_batch_fn

    # ------------------------------------------------------------------
    # host-facing API (mirrors InferenceEngine)
    # ------------------------------------------------------------------

    def _h(self, x):
        arr = x if isinstance(x, jax.Array) else jnp.asarray(x)
        return jax.device_put(arr, self._replicated)

    def _htree(self, tree):
        return jax.tree_util.tree_map(self._h, tree)

    def fetch(self, x):
        if not self._mesh_local:
            x = self._to_replicated(x)
        return jax.device_get(x)

    @staticmethod
    def _greedy_only(scfg: SamplingConfig) -> bool:
        return bool(np.all(np.asarray(scfg.temperature) <= 0.0))

    def _onehot(self, adapter_ids, n_rows=None):
        """[B] adapter ids (-1 = base) -> [B, N] routing one-hot (or None)."""
        if self.lora is None:
            return None
        rows = n_rows or self.max_requests
        ids = (
            np.full((rows,), -1, np.int64)
            if adapter_ids is None
            else np.asarray(adapter_ids)
        )
        oh = np.zeros((rows, self.num_adapters), np.float32)
        for i, a in enumerate(ids[:rows]):
            if a >= 0:
                oh[i, int(a)] = 1.0
        return self._h(oh)

    def prefill_bucket(self, prompt_len: int) -> int:
        from flexflow_tpu.serving.engine import _round_up_pow2

        return min(
            _round_up_pow2(max(prompt_len, 1), self.min_prefill_bucket),
            self.max_seq_len,
        )

    def prefill_batch_to_slots_async(
        self, prompts, slots, key, scfg, adapter_ids=None,
    ):
        real_nb = len(prompts)
        nb = self.max_requests  # fixed row count: one compile per bucket
        bucket = max(self.prefill_bucket(len(p)) for p in prompts)
        padded = np.zeros((nb, bucket), np.int32)
        lengths = np.ones((nb,), np.int32)
        slot_arr = np.full((nb,), -1, np.int32)
        for i, p in enumerate(prompts):
            padded[i, : len(p)] = p
            lengths[i] = len(p)
            slot_arr[i] = slots[i]
        scfg = SamplingConfig(
            temperature=np.pad(
                np.asarray(scfg.temperature, np.float32), (0, nb - real_nb)
            ),
            top_p=np.pad(
                np.asarray(scfg.top_p, np.float32), (0, nb - real_nb),
                constant_values=1.0,
            ),
            top_k=np.pad(np.asarray(scfg.top_k, np.int32), (0, nb - real_nb)),
        )
        adp = None
        if adapter_ids is not None:
            adp = list(adapter_ids) + [-1] * (nb - real_nb)
        toks, self.cache = self._prefill_batch(
            self.params, self.cache, self._h(padded), self._h(lengths),
            self._h(slot_arr), self._h(key), self._htree(scfg),
            lora=self.lora, onehot=self._onehot(adp, nb),
            greedy_only=self._greedy_only(scfg),
        )
        return toks[:real_nb]

    def prefill_to_slot_async(self, prompt_tokens, slot, key, scfg1,
                              adapter_id=-1):
        n = len(prompt_tokens)
        if self.max_tokens_per_batch and n > self.max_tokens_per_batch:
            return self._chunked_prefill_to_slot(
                prompt_tokens, slot, key, scfg1, adapter_id)
        return self.prefill_batch_to_slots_async(
            [prompt_tokens], [slot], key, scfg1, adapter_ids=[adapter_id]
        )[0]

    def _chunked_prefill_to_slot(self, prompt_tokens, slot, key, scfg1,
                                 adapter_id=-1):
        """Token-budgeted prompt admission through the pipeline: [1 real row
        + pad rows] chunks of max_tokens_per_batch, each a piped pass with
        cached attention against the committed prefix and a slot-routed
        window commit (reference chunked prefill,
        request_manager.cc:860-940)."""
        c = self.max_tokens_per_batch
        nb = self.max_requests
        n = len(prompt_tokens)
        # the pipe pass reads cache rows POSITIONALLY (microbatch slices),
        # so the request must occupy batch row == its cache slot
        temp = np.zeros((nb,), np.float32)
        top_p = np.ones((nb,), np.float32)
        top_k = np.zeros((nb,), np.int32)
        temp[slot] = np.asarray(scfg1.temperature).reshape(-1)[0]
        top_p[slot] = np.asarray(scfg1.top_p).reshape(-1)[0]
        top_k[slot] = np.asarray(scfg1.top_k).reshape(-1)[0]
        scfg = SamplingConfig(temperature=temp, top_p=top_p, top_k=top_k)
        slot_arr = np.full((nb,), -1, np.int32)
        slot_arr[slot] = slot
        tok = None
        done = 0
        while done < n:
            mlen = min(c, n - done)
            padded = np.zeros((nb, c), np.int32)
            padded[slot, :mlen] = prompt_tokens[done:done + mlen]
            starts = np.full((nb,), done, np.int32)
            last_idx = np.full((nb,), mlen - 1, np.int32)
            adp = np.full((nb,), -1, np.int64)
            adp[slot] = adapter_id
            tok, self.cache = self._chunk_prefill(
                self.params, self.cache, self._h(padded), self._h(starts),
                self._h(slot_arr), self._h(last_idx), self._h(key),
                self._htree(scfg), lora=self.lora, onehot=self._onehot(adp),
                greedy_only=self._greedy_only(scfg),
            )
            done += mlen
        return tok[slot]

    def prefill_to_slot(self, prompt_tokens, slot, key, scfg1, adapter_id=-1):
        return int(
            self.fetch(
                self.prefill_to_slot_async(prompt_tokens, slot, key, scfg1)
            )
        )

    def attn_window_bucket(self, max_len: int):
        """Length-aware attention windows are not plumbed through the
        stage-resident PP programs yet — always read the full cache (the
        single-chip InferenceEngine carries the optimization)."""
        return None

    def decode(self, cache_lens, tokens, key, scfg, adapter_ids=None,
               window=None):
        nt, self.cache = self._decode(
            self.params, self.cache,
            self._h(np.asarray(cache_lens, np.int32)),
            self._h(np.asarray(tokens, np.int32)),
            self._h(key), self._htree(scfg),
            lora=self.lora, onehot=self._onehot(adapter_ids),
            greedy_only=self._greedy_only(scfg),
        )
        return self.fetch(nt)

    def decode_horizon_async(self, cache_lens, tokens, key, scfg, n,
                             adapter_ids=None, window=None):
        out, self.cache = self._decode_n(
            self.params, self.cache,
            self._h(np.asarray(cache_lens, np.int32)),
            self._h(
                np.asarray(tokens, np.int32)
                if not isinstance(tokens, jax.Array) else tokens
            ),
            self._h(key), self._htree(scfg), n,
            lora=self.lora, onehot=self._onehot(adapter_ids),
            greedy_only=self._greedy_only(scfg),
        )
        return out

    def decode_horizon(self, cache_lens, tokens, key, scfg, n,
                       adapter_ids=None, window=None):
        return self.fetch(
            self.decode_horizon_async(cache_lens, tokens, key, scfg, n)
        )
