"""InferenceEngine — compiled device-side serving functions.

TPU-native replacement for the reference's InferenceManager
(/root/reference/src/runtime/inference_manager.cc): where the reference
compiles a parallel op graph per model and walks it issuing Legion index
launches per decoding step (inference_manager.cc:383,408-470), this engine
jit-compiles three step functions and reuses them for the life of the server:

- ``prefill``: full-prompt causal forward returning the per-layer KV and the
  last-position logits (reference prompt phase). Prompt lengths are padded to
  power-of-two buckets so there is one compiled program per bucket — the XLA
  analog of the reference's static ``BatchConfig`` POD shapes.
- ``insert``: writes a prefill's KV into a request slot of the decode cache
  (donated — in-place on device).
- ``decode``: one token per active slot against the KV cache, then on-device
  sampling (donated cache; the whole step is one XLA program, replacing the
  reference's per-op task launches + ArgMax/Sampling ops).

All host<->device traffic per decode step is one [B] int32 token array each
way — the analog of the reference shipping ``BatchConfig`` by-value in Legion
futures (request_manager.cu:81).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.models import decoder
from flexflow_tpu.models.decoder import KVCache
from flexflow_tpu.ops import sampling as sampling_lib
from flexflow_tpu.ops.sampling import SamplingConfig
from flexflow_tpu.specs import ModelSpec


def _round_up_pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class InferenceEngine:
    """Holds compiled serving step functions + the device KV cache for a model."""

    def __init__(
        self,
        spec: ModelSpec,
        params,
        *,
        max_requests_per_batch: int = 8,
        max_seq_len: int = 256,
        max_tokens_per_batch: int = 0,  # >0 enables chunked prefill
        min_prefill_bucket: int = 16,
        cache_dtype=jnp.bfloat16,
        donate_cache: bool = True,
        lora=None,
        lora_config=None,
        mesh=None,
        offload: bool = False,
        hybrid_ffn: bool = False,
    ):
        """``mesh``: a ("data","pipe","model","seq") jax.sharding.Mesh for
        multi-chip serving — params get Megatron TP shardings, the KV cache
        shards slots over "data" and KV heads over "model"
        (parallel/sharding.py), host inputs are replicated, and XLA/GSPMD
        inserts the per-block psums the reference materializes as AllReduce
        ops (model.cc:3526-3551). Single-process multi-device AND
        multi-process (jax.distributed) global meshes both work — in the
        latter case every process must construct the engine and issue the
        same calls with identical host values (controller broadcast:
        parallel/distributed.py)."""
        self.spec = spec
        self.mesh = mesh
        self._offload = bool(offload)
        if mesh is not None:
            from flexflow_tpu.parallel.sharding import shard_params

            # hybrid_ffn: per-op machine-view hybrid — FFN over
            # ("model","data"), attention over "model" (parallel/sharding)
            params = shard_params(spec, params, mesh, hybrid_ffn=hybrid_ffn)
        if self._offload:
            # reference --offload (config.h:189): weights resident in host
            # RAM; each decode layer streams in per scan iteration
            # (decoder._stream_in). Embed/head/norms stay device-resident.
            # Mesh + offload: keep the TP PartitionSpec, host memory kind;
            # per-layer slices stream back with the same spec minus the [L]
            # axis (the round-3 jaxlib RET_CHECK is fixed on this version)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from flexflow_tpu.parallel.sharding import param_shardings

                layer_sh = param_shardings(
                    spec, params, mesh, hybrid_ffn=hybrid_ffn)["layers"]
                host_sh = jax.tree.map(
                    lambda s: NamedSharding(s.mesh, s.spec,
                                            memory_kind="pinned_host"),
                    layer_sh)
                self._offload_shardings = jax.tree.map(
                    lambda s: NamedSharding(
                        s.mesh, P(*tuple(s.spec)[1:]), memory_kind="device"),
                    layer_sh)
                params = {
                    **params,
                    "layers": jax.device_put(params["layers"], host_sh),
                }
            else:
                layer_shards = jax.sharding.SingleDeviceSharding(
                    jax.devices()[0], memory_kind="pinned_host"
                )
                self._offload_shardings = None
                params = {
                    **params,
                    "layers": jax.device_put(params["layers"], layer_shards),
                }
        else:
            self._offload_shardings = None
        from flexflow_tpu.config import config as _ffconfig

        if _ffconfig.fuse_qkv and mesh is None and not self._offload:
            # fused wqkv/wgu carriers: one kernel call per projection group
            # (single-mesh only — TP shards the fused head axis obliviously
            # to the q/k/v block boundaries; offload streams per-layer
            # slices whose shardings are built from the unfused names)
            params = decoder.fuse_qkv_params(spec, params)
        self.params = params
        # LoRA adapter stacks (reference LoraLinear registry,
        # peft_weight_allocator.cc): {mod: {"a": [L,N,Din,r], "b": [L,N,r,Dout]}}
        self.lora = lora
        if lora is not None:
            from flexflow_tpu.peft import lora_scaling

            self.lora_scale = lora_scaling(lora_config) if lora_config else 1.0
            self.num_adapters = next(
                iter(lora.values())
            )["a"].shape[1]
        else:
            self.lora_scale = 1.0
            self.num_adapters = 0
        self.max_requests = max_requests_per_batch
        self.max_seq_len = max_seq_len
        self.max_tokens_per_batch = max_tokens_per_batch
        self.min_prefill_bucket = min_prefill_bucket
        self.cache = decoder.init_kv_cache(
            spec, max_requests_per_batch, max_seq_len, cache_dtype
        )
        if mesh is not None:
            from flexflow_tpu.parallel.sharding import (
                kv_cache_sharding, replicated,
            )

            cshard = kv_cache_sharding(mesh, self.cache)
            self.cache = KVCache(
                k=jax.device_put(self.cache.k, cshard),
                v=jax.device_put(self.cache.v, cshard),
            )
            self._replicated = replicated(mesh)
            if self.lora is not None:
                self.lora = jax.device_put(self.lora, self._replicated)
            # multi-process (jax.distributed) mesh: token outputs may come
            # back sharded over non-addressable devices; an all-gather to
            # replicated makes them fetchable (parallel/distributed.py)
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

        del donate_cache  # cache args below are always donated

        @functools.partial(
            jax.jit, donate_argnums=(1,), static_argnames=("greedy_only",)
        )
        def prefill_insert_fn(
            params, cache: KVCache, tokens, length, slot, key, scfg,
            lora=None, onehot1=None, greedy_only=False,
        ):
            """Fused prompt prefill + KV insert + first-token sample: one
            dispatch per admission (the reference's prompt phase +
            update_kv_cache + ArgMax as one Legion trace)."""
            positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
            logits, kv = decoder.forward(
                self.spec, params, tokens, positions,
                lengths=length[None], return_kv=True, flash=True,
                lora=lora, adapter_onehot=onehot1,
                lora_scale=self.lora_scale, offload=self._offload,
                offload_shardings=self._offload_shardings,
            )
            last = jnp.take_along_axis(
                logits, (length - 1)[None, None, None], axis=1
            )[0, 0]  # [V]
            k, v = kv  # [L, 1, bucket, KH, D]
            cache = decoder.insert_kv(cache, k[:, 0], v[:, 0], slot, jnp.int32(0))
            tok = sampling_lib.sample(
                last[None], key, scfg, greedy_only=greedy_only
            )[0]
            return tok, cache

        @functools.partial(
            jax.jit, donate_argnums=(1,), static_argnames=("greedy_only",)
        )
        def prefill_batch_fn(
            params, cache: KVCache, tokens, lengths, slots, key, scfg,
            lora=None, onehot=None, greedy_only=False,
        ):
            """Batched admission: ALL pending prompts prefilled, inserted and
            first-sampled in ONE dispatch (the reference's prompt phase runs
            batched inside the BatchConfig too; per-request dispatches were
            paying the full host/tunnel latency each)."""
            nb, bucket = tokens.shape
            positions = jnp.broadcast_to(
                jnp.arange(bucket, dtype=jnp.int32)[None], (nb, bucket))
            logits, kv = decoder.forward(
                self.spec, params, tokens, positions, lengths=lengths,
                return_kv=True, flash=True,
                lora=lora, adapter_onehot=onehot, lora_scale=self.lora_scale,
                offload=self._offload,
                offload_shardings=self._offload_shardings,
            )
            last = jnp.take_along_axis(
                logits, (lengths - 1)[:, None, None], axis=1)[:, 0]  # [NB, V]
            k, v = kv  # [L, NB, bucket, KH, D]
            k_t = k.transpose(0, 1, 3, 4, 2).astype(cache.k.dtype)
            v_t = v.transpose(0, 1, 3, 4, 2).astype(cache.v.dtype)
            # one-pass window commit; padding rows carry slot -1 (no write)
            ck, cv = decoder.commit_kv_windows(
                cache.k, cache.v, k_t, v_t,
                jnp.zeros((nb,), jnp.int32), slots,
            )
            toks = sampling_lib.sample(last, key, scfg, greedy_only=greedy_only)
            return toks, KVCache(k=ck, v=cv)

        @functools.partial(
            jax.jit, donate_argnums=(1,),
            static_argnames=("greedy_only", "window"),
        )
        def decode_fn(
            params, cache: KVCache, cache_lens, tokens, key, scfg,
            lora=None, onehot=None, greedy_only=False, window=None,
        ):
            if window is not None and window < cache.k.shape[-1]:
                # length-aware read: attend against the committed window
                # only (hoisted slice, bit-exact — see decode_n_fn); the
                # token's KV commits into the FULL cache
                cache_r = KVCache(
                    k=cache.k[..., :window], v=cache.v[..., :window]
                )
                logits, (k_new, v_new) = decoder.forward_cached(
                    self.spec, params, tokens[:, None], cache_r, cache_lens,
                    write_cache=False,
                    lora=lora, adapter_onehot=onehot,
                    lora_scale=self.lora_scale, offload=self._offload,
                    offload_shardings=self._offload_shardings,
                )
                ck, cv = decoder.commit_kv_windows(
                    cache.k, cache.v,
                    k_new.transpose(0, 1, 3, 4, 2).astype(cache.k.dtype),
                    v_new.transpose(0, 1, 3, 4, 2).astype(cache.v.dtype),
                    cache_lens,
                )
                cache = KVCache(k=ck, v=cv)
            else:
                logits, cache = decoder.forward_cached(
                    self.spec, params, tokens[:, None], cache, cache_lens,
                    lora=lora, adapter_onehot=onehot,
                    lora_scale=self.lora_scale,
                    offload=self._offload,
                    offload_shardings=self._offload_shardings,
                )
            next_tokens = sampling_lib.sample(
                logits[:, 0], key, scfg, greedy_only=greedy_only
            )
            return next_tokens, cache

        @functools.partial(
            jax.jit, donate_argnums=(1,),
            static_argnames=("n", "greedy_only", "window"),
        )
        def decode_n_fn(
            params, cache: KVCache, cache_lens, tokens, key, scfg, n,
            lora=None, onehot=None, greedy_only=False, window=None,
        ):
            """n chained decode steps fully on device (horizon decoding).

            The device feeds each sampled token back as the next input — the
            TPU analog of the reference's future-chained scheduler running
            ahead of the GPUs (request_manager.cc:3122-3137). Host sees [n, B]
            tokens once per horizon instead of [B] per step.

            Memory structure: the multi-GB cache stays READ-ONLY for the whole
            horizon. Each step's new K/V lands in a small [L, B, n, KH, D]
            staging buffer — a dynamic_update_slice on the untiled step axis
            touches only that step's tiles, where the per-step per-slot
            lane-offset writes into the big cache cost ~10 ms/step at B=128
            (each dynamic-lane DUS rewrites the slot's whole [KH, D, S]
            plane). In-horizon tokens join attention through the in-register
            ``extra_kv`` path; ONE per-slot window write commits the whole
            horizon at the end (amortized /n).
            """
            num_l = self.spec.num_layers
            b = cache.k.shape[1]
            kh, dh = cache.k.shape[2], cache.k.shape[3]
            stage0 = jnp.zeros((num_l, b, n, kh, dh), cache.k.dtype)
            steps = jnp.arange(n, dtype=jnp.int32)
            # Length-aware cache read (ROADMAP r4 #1: attention read the full
            # allocated [S] window): materialize the committed window ONCE
            # outside the step scan — the copy is loop-invariant, so the n
            # steps each read window bytes instead of the full cache. The
            # read is bit-exact (positions >= cache_lens are where-masked to
            # exactly-zero contributions); commits below target the FULL
            # cache. In-body slicing instead of this hoist measured SLOWER
            # than no window at all (per-layer slice materialization).
            if window is not None and window < cache.k.shape[-1]:
                cache_r = KVCache(
                    k=cache.k[..., :window], v=cache.v[..., :window]
                )
            else:
                cache_r = cache

            def body(carry, i):
                sk, sv, toks = carry
                emask = jnp.broadcast_to((steps < i)[None, None, :], (b, 1, n))
                logits, (k_new, v_new) = decoder.forward_cached(
                    self.spec, params, toks[:, None], cache_r, cache_lens,
                    positions=(cache_lens + i)[:, None],
                    write_cache=False,
                    extra_kv=(sk, sv), extra_mask=emask,
                    # earlier horizon steps sit at lens+0..lens+n-1 (alibi)
                    extra_positions=cache_lens[:, None] + steps[None, :],
                    lora=lora, adapter_onehot=onehot,
                    lora_scale=self.lora_scale, offload=self._offload,
                    offload_shardings=self._offload_shardings,
                )
                sk = jax.lax.dynamic_update_slice(
                    sk, k_new.astype(sk.dtype), (0, 0, i, 0, 0))
                sv = jax.lax.dynamic_update_slice(
                    sv, v_new.astype(sv.dtype), (0, 0, i, 0, 0))
                nxt = sampling_lib.sample(
                    logits[:, 0], jax.random.fold_in(key, i), scfg,
                    greedy_only=greedy_only,
                )
                return (sk, sv, nxt), nxt

            (sk, sv, _), out = jax.lax.scan(
                body, (stage0, stage0, tokens), steps
            )
            # commit the horizon: [L,B,n,KH,D] -> cache layout window writes
            upd_k = sk.transpose(0, 1, 3, 4, 2)  # [L, B, KH, D, n]
            upd_v = sv.transpose(0, 1, 3, 4, 2)
            ck, cv = decoder.commit_kv_windows(
                cache.k, cache.v, upd_k, upd_v, cache_lens
            )
            return out, KVCache(k=ck, v=cv)

        @jax.jit
        def sample_fn(logits, key, scfg):
            return sampling_lib.sample(logits[None], key, scfg)[0]

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def chunk_prefill_fn(params, ck_slot, cv_slot, lens1, tokens, lora, onehot1):
            """One prompt chunk [1, C] against a single-slot cache view.

            Chunked prefill (reference token-budget prompt phase,
            request_manager.cc:860-940 get_max_verify_tokens_per_batch /
            batch token budgeting): the default causal tree-mask +
            committed-prefix mask in forward_cached IS the chunked-prefill
            attention pattern.
            """
            logits, cache = decoder.forward_cached(
                self.spec, params, tokens,
                KVCache(ck_slot, cv_slot), lens1,
                lora=lora, adapter_onehot=onehot1,
                lora_scale=self.lora_scale, offload=self._offload,
                offload_shardings=self._offload_shardings,
            )
            return logits, cache.k, cache.v

        @functools.partial(jax.jit, donate_argnums=(0,))
        def write_slot_fn(cache: KVCache, ck_slot, cv_slot, slot):
            k = jax.lax.dynamic_update_slice_in_dim(cache.k, ck_slot, slot, axis=1)
            v = jax.lax.dynamic_update_slice_in_dim(cache.v, cv_slot, slot, axis=1)
            return KVCache(k, v)

        @jax.jit
        def read_slot_fn(cache: KVCache, slot):
            return (
                jax.lax.dynamic_slice_in_dim(cache.k, slot, 1, axis=1),
                jax.lax.dynamic_slice_in_dim(cache.v, slot, 1, axis=1),
            )

        self._prefill_insert = prefill_insert_fn
        self._prefill_batch = prefill_batch_fn
        self._decode = decode_fn
        self._decode_n = decode_n_fn
        self._sample = sample_fn
        self._chunk_prefill = chunk_prefill_fn
        self._write_slot = write_slot_fn
        self._read_slot = read_slot_fn

    # ------------------------------------------------------------------
    # host-facing API (used by the RequestManager)
    # ------------------------------------------------------------------

    def _h(self, x):
        """Host value -> device array; replicated over the mesh if any.

        Multi-chip: every host-side input (tokens, lens, keys, sampling
        params) must carry a mesh sharding or jit rejects the mixed-device
        argument set; replication is the BatchConfig-broadcast analog
        (reference ships BatchConfig by-value to every shard,
        request_manager.cu:81)."""
        arr = x if isinstance(x, jax.Array) else jnp.asarray(x)
        if self._replicated is not None:
            arr = jax.device_put(arr, self._replicated)
        return arr

    def _htree(self, tree):
        return jax.tree_util.tree_map(self._h, tree)

    def fetch(self, x):
        """Device -> host for possibly-multi-process-sharded outputs.

        On a jax.distributed global mesh, jit outputs may be sharded over
        devices this process can't address; an all-gather to replicated
        (jitted identity) makes them fetchable. Single-process: plain get."""
        if not self._mesh_local:
            x = self._to_replicated(x)
        return jax.device_get(x)

    def prefill_bucket(self, prompt_len: int) -> int:
        return min(
            _round_up_pow2(max(prompt_len, 1), self.min_prefill_bucket),
            self.max_seq_len,
        )

    def attn_window_bucket(self, max_len: int):
        """Static attention-window bucket covering ``max_len`` committed
        tokens: power-of-two from 128 (bounds the compile count the way
        prefill buckets do), ``None`` once the window reaches the full
        cache. Bit-exact for any batch whose rows are all <= the bucket."""
        w = _round_up_pow2(max(int(max_len), 1), 128)
        return None if w >= self.max_seq_len else w

    def prefill_to_slot_async(
        self,
        prompt_tokens: np.ndarray,
        slot: int,
        key: jax.Array,
        scfg1: SamplingConfig,
        adapter_id: int = -1,
    ):
        """Fused prefill+insert+sample; returns the first token as a DEVICE
        scalar (one dispatch per admission, no host fetch)."""
        n = len(prompt_tokens)
        if n > self.max_seq_len:
            raise ValueError(
                f"prompt length {n} exceeds max_seq_len {self.max_seq_len}"
            )
        if self.max_tokens_per_batch and n > self.max_tokens_per_batch:
            return self._chunked_prefill_to_slot(
                prompt_tokens, slot, key, scfg1, adapter_id
            )
        bucket = self.prefill_bucket(n)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :n] = prompt_tokens
        tok, self.cache = self._prefill_insert(
            self.params,
            self.cache,
            self._h(padded),
            self._h(jnp.int32(n)),
            self._h(jnp.int32(slot)),
            self._h(key),
            self._htree(scfg1),
            self.lora,
            self._onehot([adapter_id]) if self.lora is not None else None,
            greedy_only=self._greedy_only(scfg1),
        )
        return tok

    def prefill_batch_to_slots_async(
        self, prompts, slots, key: jax.Array, scfg, adapter_ids=None,
    ):
        """Admit several requests in ONE dispatch; returns a [NB] device
        token array (first token per admission). Prompts longer than the
        chunked-prefill budget are rejected here (caller routes them through
        prefill_to_slot_async individually)."""
        real_nb = len(prompts)
        # Bucket the admission count too (next power of two, capped at the
        # request capacity): each distinct [NB, bucket] shape is a fresh XLA
        # compile of the whole prefill program — unbucketed NB caused a
        # compile storm under churny continuous batching at large batch.
        nb = 1
        while nb < real_nb:
            nb *= 2
        nb = min(nb, max(self.max_requests, real_nb))
        bucket = max(self.prefill_bucket(len(p)) for p in prompts)
        padded = np.zeros((nb, bucket), np.int32)
        lengths = np.ones((nb,), np.int32)  # pad rows: 1 dummy token
        slots = list(slots)
        adapter_list = list(adapter_ids) if adapter_ids is not None else None
        for i, p in enumerate(prompts):
            padded[i, :len(p)] = p
            lengths[i] = len(p)
        if nb > real_nb:
            # Pad rows carry slot -1: commit_kv_windows skips their writes.
            slots = slots + [-1] * (nb - real_nb)
            if adapter_list is not None:
                adapter_list += [-1] * (nb - real_nb)
            scfg = SamplingConfig(
                temperature=np.pad(
                    np.asarray(scfg.temperature, np.float32),
                    (0, nb - real_nb)),
                top_p=np.pad(
                    np.asarray(scfg.top_p, np.float32), (0, nb - real_nb),
                    constant_values=1.0),
                top_k=np.pad(
                    np.asarray(scfg.top_k, np.int32), (0, nb - real_nb)),
            )
        onehot = (
            self._onehot(adapter_list) if self.lora is not None else None
        )
        toks, self.cache = self._prefill_batch(
            self.params,
            self.cache,
            self._h(padded),
            self._h(lengths),
            self._h(np.asarray(slots, np.int32)),
            self._h(key),
            self._htree(scfg),
            self.lora,
            onehot,
            greedy_only=self._greedy_only(scfg),
        )
        return toks

    def _chunked_prefill_to_slot(
        self, prompt_tokens: np.ndarray, slot: int, key: jax.Array,
        scfg1: SamplingConfig, adapter_id: int = -1,
    ):
        """Token-budgeted prompt processing: chunks of max_tokens_per_batch
        against a single-slot cache view (reference chunked prefill,
        request_manager.cc:860-940). Returns the first token (device)."""
        c = self.max_tokens_per_batch
        ck, cv = self._read_slot(self.cache, self._h(jnp.int32(slot)))
        onehot1 = self._onehot([adapter_id]) if self.lora is not None else None
        n = len(prompt_tokens)
        logits = None
        done = 0
        while done < n:
            m = min(c, n - done)
            padded = np.zeros((1, c), np.int32)
            padded[0, :m] = prompt_tokens[done:done + m]
            # clamp padding rows' writes: positions beyond the prompt are
            # scratch (never attended: lens only ever advances past written
            # positions)
            logits, ck, cv = self._chunk_prefill(
                self.params, ck, cv,
                self._h(jnp.full((1,), done, jnp.int32)), self._h(padded),
                self.lora, onehot1,
            )
            last_valid = m - 1
            done += m
        self.cache = self._write_slot(self.cache, ck, cv,
                                      self._h(jnp.int32(slot)))
        tok = self._sample(logits[0, last_valid], self._h(key),
                           self._htree(scfg1))
        return tok

    def prefill_to_slot(
        self, prompt_tokens: np.ndarray, slot: int, key: jax.Array,
        scfg1: SamplingConfig, adapter_id: int = -1,
    ) -> int:
        return int(
            self.fetch(
                self.prefill_to_slot_async(
                    prompt_tokens, slot, key, scfg1, adapter_id
                )
            )
        )

    @staticmethod
    def _greedy_only(scfg: SamplingConfig) -> bool:
        return bool(np.all(np.asarray(scfg.temperature) <= 0.0))

    def _onehot(self, adapter_ids) -> Optional[jnp.ndarray]:
        """[B] adapter ids (-1 = none) -> [B, N] routing one-hot (or None)."""
        if self.lora is None:
            return None
        ids = (
            np.full((self.max_requests,), -1, np.int64)
            if adapter_ids is None
            else np.asarray(adapter_ids)
        )
        oh = np.zeros((len(ids), self.num_adapters), np.float32)
        for i, a in enumerate(ids):
            if a >= 0:
                oh[i, int(a)] = 1.0
        return self._h(oh)

    def decode(
        self,
        cache_lens: np.ndarray,  # [B]
        tokens: np.ndarray,  # [B] current token per slot
        key: jax.Array,
        scfg: SamplingConfig,
        adapter_ids=None,
        window=None,
    ) -> np.ndarray:
        next_tokens, self.cache = self._decode(
            self.params,
            self.cache,
            self._h(np.asarray(cache_lens, np.int32)),
            self._h(np.asarray(tokens, np.int32)),
            self._h(key),
            self._htree(scfg),
            self.lora,
            self._onehot(adapter_ids),
            greedy_only=self._greedy_only(scfg),
            window=window,
        )
        return self.fetch(next_tokens)

    def decode_horizon(
        self,
        cache_lens: np.ndarray,  # [B]
        tokens: np.ndarray,  # [B]
        key: jax.Array,
        scfg: SamplingConfig,
        n: int,
        adapter_ids=None,
        window=None,
    ) -> np.ndarray:
        """Run n device-resident decode steps; returns [n, B] tokens."""
        return self.fetch(
            self.decode_horizon_async(
                cache_lens, tokens, key, scfg, n, adapter_ids, window
            )
        )

    def decode_horizon_async(
        self,
        cache_lens: np.ndarray,  # [B]
        tokens,  # [B] np or device array (device feedback from prior horizon)
        key: jax.Array,
        scfg: SamplingConfig,
        n: int,
        adapter_ids=None,
        window=None,
    ) -> jnp.ndarray:
        """Dispatch n decode steps; returns the [n, B] token DEVICE array
        without blocking — the pipelined scheduler fetches it one horizon
        late, overlapping device->host transfer with the next horizon's
        compute (the reference's 4-deep future pipeline,
        request_manager.cc:3122-3137). ``window``: static attention-window
        bucket (attn_window_bucket) — must cover max(cache_lens)."""
        out, self.cache = self._decode_n(
            self.params,
            self.cache,
            self._h(np.asarray(cache_lens, np.int32)),
            self._h(np.asarray(tokens, np.int32) if not isinstance(
                tokens, jax.Array) else tokens),
            self._h(key),
            self._htree(scfg),
            n,
            self.lora,
            self._onehot(adapter_ids),
            greedy_only=self._greedy_only(scfg),
            window=window,
        )
        return out
