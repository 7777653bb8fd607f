"""SpecRequestManager — continuous batching for tree-speculative serving.

Host state machine mirroring the reference's speculative serving loop
(/root/reference/src/runtime/request_manager.cc:3083-3174):
``prepare_next_batch_init`` (commit verified tokens, reinit beam state,
request_manager.cc:1171) -> draft beam expansion over depths ->
``prepare_next_batch_verify`` (flatten/merge trees, request_manager.cc:1923)
-> LLM tree verification -> accept longest verified prefix.

Greedy verification is lossless: outputs are bit-identical to incremental
greedy decoding (the property the reference's tests gate on,
cpp_inference_tests.sh:185-186).
"""

from __future__ import annotations

import itertools
import threading
import time
import queue
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.ops.sampling import SamplingConfig
from flexflow_tpu.serving.request_manager import (
    COMPLETED,
    FAILED,
    GenerationConfig,
    PENDING,
    ProfileInfo,
    Request,
    RUNNING,
)
from flexflow_tpu.serving.speculative import MAX_SPEC_TREE_TOKEN_NUM, SpecEngine
from flexflow_tpu.serving.tree_merge import merge_batch


class SpecRequestManager:
    """Continuous-batching scheduler over a SpecEngine (greedy, lossless)."""

    def __init__(
        self,
        engine: SpecEngine,
        *,
        eos_token_ids: Sequence[int] = (),
        fused: bool = False,
        spec_horizon: int = 1,
        pipelined: bool = False,
        pipeline_depth: Optional[int] = None,  # None -> FFConfig default
        seed: int = 0,
        log_fn=None,
    ):
        """``fused=True`` runs each speculative iteration (draft tree ->
        verify -> accept -> KV commit) as ONE device dispatch — identical
        outputs, one host round-trip per iteration. ``spec_horizon`` > 1
        chains that many fused iterations on device per dispatch (lens/roots
        feed back on device; EOS/retire lag one horizon — same contract as
        the incremental decode horizon)."""
        self.engine = engine
        self.fused = bool(fused)
        self.spec_horizon = max(int(spec_horizon), 1)
        # pipelined: dispatch horizon k+1 before fetching horizon k
        # (requires fused; lens/roots feed back as device arrays).
        # pipeline_depth horizons ride in flight at once (reference 4-deep
        # future queue, request_manager.cc:3122-3137): with device-fed
        # lens/roots the host only needs to fetch the OLDEST horizon's
        # tokens, so a deeper queue hides per-dispatch host/tunnel cost at
        # the price of more EOS/budget lag (covered by the acceptance
        # projection in _clamped_horizon).
        self.pipelined = bool(pipelined) and self.fused
        if pipeline_depth is None:
            from flexflow_tpu.config import config as _cfg0

            pipeline_depth = getattr(_cfg0, "pipeline_depth", 2)
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self._inflight_q = []  # FIFO of (snapshot, produced, n_acc, h)
        self._dev_lens = None  # device [B] feedback (pipelined mode)
        self._dev_roots = None
        self.eos_token_ids = tuple(eos_token_ids) or engine.llm_spec.eos_ids()
        self._guid = itertools.count(2000000)
        self._pending: "queue.Queue[Request]" = queue.Queue()
        self._requests: Dict[int, Request] = {}

        b = engine.max_requests
        self._slots: List[Optional[Request]] = [None] * b
        self._cache_lens = np.zeros(b, np.int32)
        self._root_tokens = np.zeros(b, np.int32)
        # per-slot sampling params; any temperature > 0 routes the step
        # through stochastic verification (spec_sampling.tree_sample_walk)
        self._temperature = np.zeros(b, np.float32)
        self._top_p = np.ones(b, np.float32)
        self._top_k = np.zeros(b, np.int32)
        self._key = jax.random.PRNGKey(seed)
        self._steps = 0
        self._verified_tokens_total = 0  # accepted tokens across request-steps
        self._verified_events = 0  # (request, iteration) pairs counted
        # iterations dispatched but not yet fetched, per slot (pipelined
        # dispatch projection)
        self._inflight_iters = np.zeros(b, np.int64)
        # tail bucket rounding: "up" dispatches the smallest pow2 horizon
        # covering the remaining-iteration estimate (may overshoot the budget
        # by most of a bucket — pure waste at ~33 ms/iteration); "down"
        # dispatches the largest pow2 below it and covers the remainder with
        # trailing small dispatches (lossless either way). "down" is the
        # product default: measured 740.1 vs 734.1 tok/s at the bench
        # regime, and it can never waste most of a horizon past the budget
        # (benchmarks/probe_r5_hsweep.py on-chip; h16-up's 637 shows what
        # tail overshoot costs)
        self.horizon_round = "down"
        self._num_processed = 0
        self._tree_margin = engine.tree  # seq-len reserve per iteration
        self._override_mask = np.zeros(b, bool)  # slots admitted since dispatch
        self._log = log_fn or (lambda *a: None)
        self._server_thread = None
        self._stop_evt = threading.Event()
        # --profiling: per-phase wall-time accumulation (see RequestManager)
        from flexflow_tpu.config import config as _ffconfig
        from flexflow_tpu.utils.profiling import StepTimer

        self.timer = StepTimer() if _ffconfig.profiling else None

    def _phase(self, name: str):
        if self.timer is None:
            import contextlib

            return contextlib.nullcontext()
        return self.timer.phase(name)

    # ------------------------------------------------------------------

    def get_request(self, guid: int) -> Request:
        return self._requests[guid]

    def register_request(
        self, prompt_tokens: Sequence[int], config: Optional[GenerationConfig] = None
    ) -> int:
        margin = self.spec_horizon * (self._tree_margin + 1)
        if len(prompt_tokens) + margin >= self.engine.max_seq_len:
            # reject oversize prompts synchronously (see RequestManager)
            raise ValueError(
                f"prompt length {len(prompt_tokens)} + speculation margin "
                f"{margin} >= max_seq_len {self.engine.max_seq_len}"
            )
        req = Request(
            guid=next(self._guid),
            prompt_tokens=list(prompt_tokens),
            config=config or GenerationConfig(),
        )
        req.profile.registration_time = time.monotonic()
        self._requests[req.guid] = req
        self._pending.put(req)
        return req.guid

    def _finished(self, req: Request, last_token: int) -> bool:
        if last_token in self.eos_token_ids or last_token in tuple(
            req.config.stop_token_ids
        ):
            return True
        if len(req.output_tokens) >= req.config.max_new_tokens:
            return True
        total = len(req.prompt_tokens) + len(req.output_tokens)
        # leave room for a full horizon of speculation trees
        margin = self.spec_horizon * (self._tree_margin + 1)
        return total + margin >= self.engine.max_seq_len

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _retire(self, slot: int) -> None:
        req = self._slots[slot]
        req.state = COMPLETED
        req.profile.finish_time = time.monotonic()
        self._slots[slot] = None
        self._cache_lens[slot] = 0
        self._temperature[slot] = 0.0
        self._top_p[slot] = 1.0
        self._top_k[slot] = 0
        self._inflight_iters[slot] = 0
        self._num_processed += 1
        self._log(
            f"[Profile] guid({req.guid}) llm_decoding_steps("
            f"{req.profile.llm_decoding_steps}) latency("
            f"{req.profile.latency * 1e3:.3f}) ttft({req.profile.ttft * 1e3:.3f})"
        )
        req.done.set()

    def _admit(self) -> None:
        """Batched admission: every pending request's LLM+SSM prefill runs in
        ONE dispatch (engine.prefill_both_batch)."""
        admits = []
        for slot in range(self.engine.max_requests):
            if self._slots[slot] is not None:
                continue
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                break
            req.state = RUNNING
            req.slot = slot
            req.profile.start_time = time.monotonic()
            self._temperature[slot] = req.config.temperature
            self._top_p[slot] = req.config.top_p
            self._top_k[slot] = req.config.top_k
            self._slots[slot] = req
            self._cache_lens[slot] = len(req.prompt_tokens)
            admits.append((slot, req))
        if not admits:
            return
        sampling = any(r.config.temperature > 0.0 for _, r in admits)
        scfg = None
        if sampling:
            scfg = SamplingConfig(
                temperature=np.array(
                    [r.config.temperature for _, r in admits], np.float32),
                top_p=np.array([r.config.top_p for _, r in admits], np.float32),
                top_k=np.array([r.config.top_k for _, r in admits], np.int32),
            )
        firsts = self.engine.prefill_both_batch(
            [np.asarray(r.prompt_tokens, np.int32) for _, r in admits],
            [s for s, _ in admits],
            key=self._next_key() if sampling else None, scfg=scfg,
        )
        now = time.monotonic()
        for (slot, req), first in zip(admits, firsts):
            req.profile.first_token_time = now
            req.profile.llm_decoding_steps = 1
            req.output_tokens.append(first)
            self._root_tokens[slot] = first
            self._override_mask[slot] = True
            if self._finished(req, first):
                self._retire(slot)

    # ------------------------------------------------------------------

    def _clamped_horizon(self, active, *, projected: bool = False) -> int:
        """Drain-aware horizon: each fused iteration yields >= 1 token per
        slot, so never chain more iterations than the largest remaining
        token budget across active requests (retiring waves stop paying
        for full horizons; the analog of the RequestManager's drain-aware
        dispatch).

        ``projected=True`` (pipelined mode) additionally credits in-flight
        iterations with the MEASURED mean acceptance: without it, the
        scheduler keeps dispatching full horizons until fetched outputs
        reach the budgets — two whole horizons of pure waste at the tail
        (measured: 6 dispatches where 4 suffice at 4.8 accepted/iter).
        Returns 0 when every active slot's budget is already covered
        (caller drains instead of dispatching). Lossless: outputs are
        unchanged, only wasted tail iterations are skipped; an
        under-estimate simply adds another (small) dispatch after drain."""
        if not projected:
            rem = max(
                (self._slots[s].config.max_new_tokens
                 - len(self._slots[s].output_tokens))
                for s in active
            )
        else:
            acc = self.mean_verified_tokens_per_step
            acc = max(acc, 1.0)  # >= 1 token per iteration is guaranteed
            worst = self.engine.depth + 1  # max tokens one iteration commits
            rem = 0
            cap = self.spec_horizon
            for s in active:
                req = self._slots[s]
                proj = (len(req.output_tokens)
                        + self._inflight_iters[s] * acc)
                rem_tok = req.config.max_new_tokens - proj
                rem = max(rem, int(np.ceil(rem_tok / acc)))
                # seq-len safety at pipeline depth > 1: every in-flight
                # iteration can commit up to depth+1 tokens on device before
                # the host observes them — cap this dispatch so even
                # worst-case acceptance cannot write past the cache
                worst_lens = (len(req.prompt_tokens) + len(req.output_tokens)
                              + self._inflight_iters[s] * worst)
                seq_room = (self.engine.max_seq_len - worst_lens
                            - (self._tree_margin + 1))
                cap = min(cap, max(int(seq_room) // worst, 0))
            rem = min(rem, cap)
            if rem <= 0:
                return 0
        # round up to a power of two so the static-n fused program compiles
        # at most log2(spec_horizon)+1 distinct horizons (round-3 review:
        # an unbucketed clamp recompiled at every drain value)
        h = 1
        while h < rem and h < self.spec_horizon:
            h *= 2
        if self.horizon_round == "down" and h > rem:
            h = max(h // 2, 1)
        if projected:
            # the seq-room cap is a CACHE-SAFETY bound, not a waste bound:
            # it must hold regardless of the rounding mode (review r5: the
            # pow2 round-up could push h past it under horizon_round="up";
            # budget overshoot stays allowed — that is only wasted work)
            h = min(h, cap)
        return min(h, self.spec_horizon)

    def _step_fused(self, active) -> bool:
        lens_before = self._cache_lens.copy()
        h = self._clamped_horizon(active)
        # length-aware cache read (lens are exact here: non-pipelined)
        window = self.engine.attn_window_bucket(
            int(max(lens_before[s] for s in active)))
        sampling = any(self._temperature[s] > 0.0 for s in active)
        if sampling:
            scfg = SamplingConfig(
                temperature=self._temperature, top_p=self._top_p,
                top_k=self._top_k,
            )
            if h == 1:
                produced, n_acc = self.engine.fused_sample_step(
                    lens_before, self._root_tokens, self._next_key(), scfg)
                produced, n_acc = produced[None], n_acc[None]
            else:
                produced, n_acc = self.engine.fused_sample_step_n(
                    lens_before, self._root_tokens, self._next_key(), scfg, h,
                    window=window)
        elif h == 1:
            produced, n_acc = self.engine.fused_step(
                lens_before, self._root_tokens, window=window)
            produced, n_acc = produced[None], n_acc[None]
        else:
            produced, n_acc = self.engine.fused_step_n(
                lens_before, self._root_tokens, h, window=window)
        self._steps += h
        snapshot = [(slot, self._slots[slot]) for slot in active]
        self._process_produced(snapshot, produced, n_acc, h)
        return True

    def _process_produced(self, snapshot, produced, n_acc, h: int) -> None:
        """Walk one fetched horizon's (produced, n_acc) for the slots that
        were active at dispatch time; extend outputs, retire finished."""
        for slot, req in snapshot:
            if self._slots[slot] is not req:
                continue  # retired (and possibly readmitted) since dispatch
            done = False
            for it in range(h):
                if done:
                    break
                n = int(n_acc[it, slot])
                budget = req.config.max_new_tokens - len(req.output_tokens)
                kept = []
                for tok in produced[it, slot, :n][: max(budget, 0)]:
                    kept.append(int(tok))
                    if kept[-1] in self.eos_token_ids or kept[-1] in tuple(
                        req.config.stop_token_ids
                    ):
                        break
                req.output_tokens.extend(kept)
                req.profile.llm_decoding_steps += 1
                self._verified_tokens_total += n
                self._verified_events += 1
                self._cache_lens[slot] += n
                self._root_tokens[slot] = int(produced[it, slot, n - 1])
                if self._finished(req, req.output_tokens[-1]):
                    self._retire(slot)
                    done = True

    def _step_fused_pipelined(self, active) -> bool:
        """Dispatch horizon k+1 BEFORE fetching horizon k (device feedback:
        lens/roots stay on device between dispatches; admissions merge in via
        a compiled [B] override scatter). EOS/retire lag one extra horizon —
        the same contract as the incremental pipelined scheduler."""
        h = self._clamped_horizon(active, projected=True)
        if h == 0:
            # budgets covered by in-flight work: drain instead of dispatch
            if self._inflight_q:
                self._drain_inflight(self._inflight_q.pop(0))
            return True
        b = self.engine.max_requests
        if self._dev_lens is None:
            self._dev_lens = self.engine._h(
                jnp.asarray(self._cache_lens, jnp.int32))
            self._dev_roots = self.engine._h(
                jnp.asarray(self._root_tokens, jnp.int32))
        elif self._override_mask.any():
            self._dev_lens, self._dev_roots = self.engine.apply_slot_overrides(
                self._dev_lens, self._dev_roots, self._override_mask,
                self._cache_lens, self._root_tokens)
        self._override_mask = np.zeros(b, bool)

        # length-aware cache read: device lens aren't host-visible here, but
        # drained lens + in-flight iterations x (depth+1 accepted max) is a
        # safe upper bound on every slot's committed length at execution
        window = self.engine.attn_window_bucket(int(max(
            self._cache_lens[s]
            + self._inflight_iters[s] * (self.engine.depth + 1)
            for s in active
        )))
        sampling = any(self._temperature[s] > 0.0 for s in active)
        if sampling:
            scfg = SamplingConfig(
                temperature=self._temperature, top_p=self._top_p,
                top_k=self._top_k,
            )
            produced, n_acc, self._dev_lens, self._dev_roots = (
                self.engine.fused_sample_step_n_async(
                    self._dev_lens, self._dev_roots, self._next_key(),
                    scfg, h, window=window)
            )
        else:
            produced, n_acc, self._dev_lens, self._dev_roots = (
                self.engine.fused_step_n_async(
                    self._dev_lens, self._dev_roots, h, window=window)
            )
        self._steps += h
        for s in active:
            self._inflight_iters[s] += h
        snapshot = [(slot, self._slots[slot]) for slot in active]
        self._inflight_q.append((snapshot, produced, n_acc, h))
        # keep up to pipeline_depth horizons queued on device; drain the
        # oldest beyond that (the reference's 4-deep future pipeline)
        while len(self._inflight_q) > max(self.pipeline_depth - 1, 1):
            self._drain_inflight(self._inflight_q.pop(0))
        return True

    def _drain_inflight(self, inflight) -> None:
        snapshot, produced, n_acc, h = inflight
        produced = self.engine.fetch(produced)
        n_acc = self.engine.fetch(n_acc)
        for slot, _req in snapshot:
            self._inflight_iters[slot] = max(
                0, self._inflight_iters[slot] - h)
        self._process_produced(snapshot, produced, n_acc, h)

    def step(self) -> bool:
        """One speculation iteration (draft tree -> verify -> accept/commit)."""
        with self._phase("admit"):
            self._admit()
        active = [s for s in range(self.engine.max_requests) if self._slots[s]]
        if not active:
            if self._inflight_q:
                with self._phase("spec_drain"):
                    self._drain_inflight(self._inflight_q.pop(0))
                return True
            return False
        if self.fused:
            if self.pipelined:
                with self._phase("spec_fused"):
                    return self._step_fused_pipelined(active)
            with self._phase("spec_fused"):
                return self._step_fused(active)

        t = self.engine.tree
        lens_before = self._cache_lens.copy()
        with self._phase("draft"):
            tree_tokens, tree_parents, tree_depths = self.engine.draft_tree(
                lens_before, self._root_tokens
            )
        with self._phase("verify"):
            argmax = self.engine.verify(
                lens_before, tree_tokens, tree_parents, tree_depths
            )
        from_slots = self._greedy_walk_accept(
            active, lens_before, tree_tokens, tree_parents, argmax, t
        )
        self.engine.commit(lens_before, from_slots)
        return True

    def _greedy_walk_accept(
        self, active, lens_before, tree_tokens, tree_parents, argmax, t
    ) -> np.ndarray:
        """Walk each request's verified tree along the LLM argmaxes, extend
        outputs, advance cache lens; returns the KV-commit from_slots."""
        self._steps += 1
        from_slots = np.tile(np.arange(t, dtype=np.int32), (len(lens_before), 1))
        for slot in active:
            req = self._slots[slot]
            # children by parent slot for this request's tree
            children: Dict[int, List[int]] = {}
            for c in range(1, t):
                children.setdefault(int(tree_parents[slot, c]), []).append(c)
            cur, path, produced = 0, [0], []
            while True:
                expected = int(argmax[slot, cur])
                produced.append(expected)
                nxt = None
                for c in children.get(cur, ()):
                    if int(tree_tokens[slot, c]) == expected:
                        nxt = c
                        break
                if nxt is None:
                    break
                cur = nxt
                path.append(cur)

            # truncate to generation budget / stop conditions
            budget = req.config.max_new_tokens - len(req.output_tokens)
            kept = []
            for tok in produced[: max(budget, 0)]:
                kept.append(tok)
                if tok in self.eos_token_ids or tok in tuple(
                    req.config.stop_token_ids
                ):
                    break

            req.output_tokens.extend(kept)
            req.profile.llm_decoding_steps += 1
            self._verified_tokens_total += len(path)
            self._verified_events += 1

            from_slots[slot, : len(path)] = path
            self._cache_lens[slot] = lens_before[slot] + len(path)
            self._root_tokens[slot] = produced[-1] if produced else 0
            if self._finished(req, req.output_tokens[-1]):
                self._retire(slot)
        return from_slots

    def run_until_idle(self) -> None:
        while self.step() or not self._pending.empty():
            pass
        if self.timer is not None:
            for line in self.timer.report():
                print(line)

    def generate(self, prompts, config: Optional[GenerationConfig] = None):
        if prompts and isinstance(prompts[0], int):
            prompts = [prompts]
        guids = [self.register_request(p, config) for p in prompts]
        if self._server_thread is None:
            self.run_until_idle()
        else:
            for g in guids:
                self._requests[g].done.wait()
        reqs = [self._requests[g] for g in guids]
        failed = next((r for r in reqs if r.state == FAILED), None)
        if failed is not None:
            raise RuntimeError(
                f"serving loop failed during generation: {failed.error}"
            )
        return reqs

    # background server (reference start_background_server serves the
    # speculative loop too, request_manager.cc:2936/serve_spec_infer)
    def start_background_server(self) -> None:
        if self._server_thread is not None:
            return
        self._stop_evt.clear()

        def loop():
            try:
                while not self._stop_evt.is_set():
                    if not self.step() and self._pending.empty():
                        time.sleep(0.001)
            except BaseException as e:
                for req in self._requests.values():
                    if not req.done.is_set():
                        req.state = FAILED
                        req.error = f"{type(e).__name__}: {e}"
                        req.done.set()
                raise

        self._server_thread = threading.Thread(target=loop, daemon=True)
        self._server_thread.start()

    def stop_server(self) -> None:
        if self._server_thread is None:
            return
        self._stop_evt.set()
        self._server_thread.join()
        self._server_thread = None

    # ------------------------------------------------------------------

    @property
    def mean_verified_tokens_per_step(self) -> float:
        """Mean accepted tokens per request per speculative iteration
        (reference: decoding-steps reduction gate)."""
        return self._verified_tokens_total / max(self._verified_events, 1)

    @property
    def total_decoding_steps(self) -> int:
        return self._steps

    @property
    def num_processed_requests(self) -> int:
        return self._num_processed


class MultiSSMSpecManager(SpecRequestManager):
    """Multiple draft models against one verifier (reference
    register_ssm_model loop, request_manager.cc:3148-3160).

    SSMs rotate per iteration (round-robin); the LLM cache is shared across
    the per-SSM engines, and before each SSM's turn its draft cache catches
    up over the tokens committed during other SSMs' turns (the reference's
    prepare_next_batch_init re-commit semantics).
    """

    def __init__(self, engines: Sequence[SpecEngine], merged: bool = False,
                 **kw):
        """``merged=True`` verifies ALL SSMs' trees in ONE LLM pass per
        iteration (reference merge_dfs_trees) instead of rotating; draft
        trees are merged host-side with shared-prefix dedup, capped at
        MAX_SPEC_TREE_TOKEN_NUM."""
        assert engines, "need at least one SpecEngine"
        super().__init__(engines[0], **kw)
        if not merged and not self.fused:
            # rotation executes each SSM's iteration as one fused dispatch;
            # an unfused rotation mode has no user (rejected up front rather
            # than stubbed mid-serving — round-1 ADVICE)
            raise ValueError(
                "multi-SSM rotation requires fused=True (or merged=True)"
            )
        self.engines = list(engines)
        b = engines[0].max_requests
        self._ssm_lens = [np.zeros(b, np.int32) for _ in engines]
        self._llm_cache = engines[0].llm_cache
        self._rr = 0
        self.merged = bool(merged)
        if merged:
            assert not self.fused, "merged verification uses the host path"
            self._merged_t = min(
                MAX_SPEC_TREE_TOKEN_NUM,
                1 + sum(e.tree - 1 for e in engines),
            )
            self._tree_margin = self._merged_t

    def _admit(self) -> None:
        before = [s for s in range(self.engine.max_requests)
                  if self._slots[s] is None]
        self.engine = self.engines[0]
        # admission prefills into the SHARED llm cache (owned by the manager
        # between steps; engines' copies go stale when another engine's
        # donated step consumed them)
        self.engines[0].llm_cache = self._llm_cache
        super()._admit()
        for slot in before:
            req = self._slots[slot]
            if req is None:
                continue
            n = len(req.prompt_tokens)
            for i, eng in enumerate(self.engines):
                if i > 0:
                    eng.prefill_ssm_only(
                        np.asarray(req.prompt_tokens, np.int32), slot)
                self._ssm_lens[i][slot] = n
        self._llm_cache = self.engines[0].llm_cache

    def _catchup_engine(self, i: int, active) -> None:
        """Advance SSM i's draft cache over tokens committed since its last
        turn (the reference's prepare_next_batch_init re-commit semantics)."""
        eng = self.engines[i]
        chunk = eng.tree + 2
        while True:
            lags = self._cache_lens - self._ssm_lens[i]
            if not any(int(lags[s]) > 0 for s in active):
                break
            tokens = np.zeros((eng.max_requests, chunk), np.int32)
            taken = np.zeros(eng.max_requests, np.int32)
            for s in active:
                lag = int(lags[s])
                if lag <= 0:
                    continue
                take = min(lag, chunk)
                start = int(self._ssm_lens[i][s])
                hist = self._slots[s].tokens
                tokens[s, :take] = hist[start:start + take]
                taken[s] = take
            eng.catchup(self._ssm_lens[i], tokens)
            self._ssm_lens[i] = self._ssm_lens[i] + taken

    def step(self) -> bool:
        if self.merged:
            return self._step_merged()
        self._admit()
        active = [s for s in range(self.engine.max_requests) if self._slots[s]]
        if not active:
            return False

        i = self._rr % len(self.engines)
        self._rr += 1
        eng = self.engines[i]
        eng.llm_cache = self._llm_cache

        # draft-cache catch-up over tokens committed during other SSMs' turns
        self._catchup_engine(i, active)

        self.engine = eng
        ok = self._step_fused(active)
        self._llm_cache = eng.llm_cache
        # this SSM's cache advanced with the commit; others lag until their turn
        self._ssm_lens[i] = self._cache_lens.copy()
        for s in range(eng.max_requests):
            if self._slots[s] is None:
                for ln in self._ssm_lens:
                    ln[s] = 0
        return ok

    def _step_merged(self) -> bool:
        """One iteration verifying every SSM's tree in a single LLM pass.

        Reference analog: the per-SSM beam loops feed merge_dfs_trees and one
        TreeVerify batch (request_manager.cc:3148-3174, ~1990-2350). Draft
        caches are NOT committed from the merged tree (its layout matches no
        single engine's slot grid); they resync via catch-up next iteration.
        """
        self._admit()
        active = [s for s in range(self.engine.max_requests) if self._slots[s]]
        if not active:
            return False

        lens_before = self._cache_lens.copy()
        trees = []
        for i, eng in enumerate(self.engines):
            self._catchup_engine(i, active)
            tt, tp, _td = eng.draft_tree(lens_before, self._root_tokens)
            trees.append((tt, tp))

        mt, mp, md = merge_batch(trees, self._merged_t, self._merged_t)
        eng0 = self.engines[0]
        eng0.llm_cache = self._llm_cache
        argmax = eng0.verify(lens_before, mt, mp, md)
        from_slots = self._greedy_walk_accept(
            active, lens_before, mt, mp, argmax, self._merged_t
        )
        eng0.commit_llm_only(lens_before, from_slots)
        self._llm_cache = eng0.llm_cache
        # draft caches are stale past lens_before: leave _ssm_lens at the
        # pre-draft committed lengths so catch-up replays accepted tokens
        for i in range(len(self.engines)):
            np.minimum(self._ssm_lens[i], lens_before, out=self._ssm_lens[i])
        for s in range(eng0.max_requests):
            if self._slots[s] is None:
                for ln in self._ssm_lens:
                    ln[s] = 0
        return True
