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
        min_prefill_bucket: int = 16,
        cache_dtype=jnp.bfloat16,
        donate_cache: bool = True,
    ):
        self.spec = spec
        self.params = params
        self.max_requests = max_requests_per_batch
        self.max_seq_len = max_seq_len
        self.min_prefill_bucket = min_prefill_bucket
        self.cache = decoder.init_kv_cache(
            spec, max_requests_per_batch, max_seq_len, cache_dtype
        )

        del donate_cache  # cache args below are always donated

        @jax.jit
        def prefill_fn(params, tokens, length):
            # tokens [1, S_bucket]; length scalar
            positions = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
            logits, kv = decoder.forward(
                self.spec, params, tokens, positions,
                lengths=length[None], return_kv=True,
            )
            last = jnp.take_along_axis(
                logits, (length - 1)[None, None, None], axis=1
            )[:, 0]  # [1, V]
            k, v = kv  # [L, 1, S_bucket, KH, D]
            return last[0], (k[:, 0], v[:, 0])

        @functools.partial(jax.jit, donate_argnums=(0,))
        def insert_fn(cache: KVCache, k_new, v_new, slot):
            return decoder.insert_kv(cache, k_new, v_new, slot, jnp.int32(0))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_fn(params, cache: KVCache, cache_lens, tokens, key, scfg):
            logits, cache = decoder.forward_cached(
                self.spec, params, tokens[:, None], cache, cache_lens
            )
            next_tokens = sampling_lib.sample(logits[:, 0], key, scfg)
            return next_tokens, cache

        @jax.jit
        def sample_fn(logits, key, scfg):
            return sampling_lib.sample(logits[None], key, scfg)[0]

        self._prefill = prefill_fn
        self._insert = insert_fn
        self._decode = decode_fn
        self._sample = sample_fn

    # ------------------------------------------------------------------
    # host-facing API (used by the RequestManager)
    # ------------------------------------------------------------------

    def prefill_bucket(self, prompt_len: int) -> int:
        return min(
            _round_up_pow2(max(prompt_len, 1), self.min_prefill_bucket),
            self.max_seq_len,
        )

    def prefill(
        self, prompt_tokens: np.ndarray, key: jax.Array, scfg1: SamplingConfig
    ) -> Tuple[int, Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        """Run prompt prefill; returns (first_token, kv, last_logits)."""
        n = len(prompt_tokens)
        bucket = self.prefill_bucket(n)
        if n > self.max_seq_len:
            raise ValueError(
                f"prompt length {n} exceeds max_seq_len {self.max_seq_len}"
            )
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :n] = prompt_tokens
        last_logits, kv = self._prefill(
            self.params, jnp.asarray(padded), jnp.int32(n)
        )
        tok = self._sample(last_logits, key, scfg1)
        return int(tok), kv, last_logits

    def insert(self, kv, slot: int) -> None:
        k_new, v_new = kv
        self.cache = self._insert(self.cache, k_new, v_new, jnp.int32(slot))

    def decode(
        self,
        cache_lens: np.ndarray,  # [B]
        tokens: np.ndarray,  # [B] current token per slot
        key: jax.Array,
        scfg: SamplingConfig,
    ) -> np.ndarray:
        next_tokens, self.cache = self._decode(
            self.params,
            self.cache,
            jnp.asarray(cache_lens, jnp.int32),
            jnp.asarray(tokens, jnp.int32),
            key,
            scfg,
        )
        return np.asarray(next_tokens)
