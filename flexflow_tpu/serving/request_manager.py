"""RequestManager — continuous-batching scheduler (host side).

TPU-native counterpart of the reference's RequestManager
(/root/reference/src/runtime/request_manager.cc, include/flexflow/request_manager.h:119):
request registration with per-request GenerationConfig, a slot-based continuous
batching loop (``prepare_next_batch`` semantics, request_manager.cc:612-1130 —
append sampled tokens, detect EOS / max-length completion, refill free slots
from the pending queue), per-request profiling (registration/start/first-token/
finish timestamps + decoding step counts, request_manager.cc:780-830), and a
background serving thread (``background_serving_task``,
request_manager.cc:2936) with blocking ``generate()`` futures.

Device work is delegated to :class:`InferenceEngine`; the scheduler only moves
[B]-sized int32 arrays across the host boundary per step.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import itertools
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu.ops.sampling import SamplingConfig
from flexflow_tpu.serving.engine import InferenceEngine


@dataclasses.dataclass
class GenerationConfig:
    """Per-request sampling settings (reference: FFModel GenerationConfig)."""

    max_new_tokens: int = 128
    temperature: float = 0.0  # <= 0 -> greedy
    top_p: float = 1.0
    top_k: int = 0
    stop_token_ids: Sequence[int] = ()
    # LoRA adapter slot for this request (-1 = base model); reference:
    # per-request peft_model_id in BatchConfig PEFT fields
    adapter_id: int = -1


@dataclasses.dataclass
class ProfileInfo:
    """Per-request timing (reference request_manager.cc:780-830)."""

    registration_time: float = 0.0
    start_time: float = 0.0
    first_token_time: float = 0.0
    finish_time: float = 0.0
    llm_decoding_steps: int = 0

    @property
    def ttft(self) -> float:
        return self.first_token_time - self.registration_time

    @property
    def latency(self) -> float:
        return self.finish_time - self.registration_time


PENDING, RUNNING, COMPLETED, FAILED = (
    "PENDING", "RUNNING", "COMPLETED", "FAILED"
)


@dataclasses.dataclass
class Request:
    guid: int
    prompt_tokens: List[int]
    config: GenerationConfig
    state: str = PENDING
    slot: int = -1
    error: Optional[str] = None  # set when the serving loop died (FAILED)
    output_tokens: List[int] = dataclasses.field(default_factory=list)
    profile: ProfileInfo = dataclasses.field(default_factory=ProfileInfo)
    done: threading.Event = dataclasses.field(default_factory=threading.Event)

    @property
    def tokens(self) -> List[int]:
        return self.prompt_tokens + self.output_tokens


class RequestManager:
    """Continuous-batching scheduler over an InferenceEngine."""

    def __init__(
        self,
        engine: InferenceEngine,
        *,
        eos_token_ids: Sequence[int] = (),
        seed: int = 0,
        decode_horizon: int = 1,
        pipelined: bool = False,
        pipeline_depth: int = 2,
        log_fn=None,
    ):
        """``decode_horizon`` > 1 runs that many decode steps fully on device
        per scheduling iteration (identical outputs; EOS detection and slot
        refill happen at horizon boundaries — the analog of the reference's
        4-deep in-flight batch pipeline, request_manager.cc:3122-3137).

        ``pipelined=True`` additionally dispatches horizon k+1 (the device
        feeds sampled tokens back internally) BEFORE fetching horizon k's
        tokens, so device->host transfer and host bookkeeping overlap the
        next horizon's compute. Outputs are identical; slot retire/admit
        take effect one horizon late (bounded wasted compute)."""
        self.engine = engine
        self.decode_horizon = max(int(decode_horizon), 1)
        self.pipelined = bool(pipelined)
        # --profiling (reference per-op cudaEvent timing,
        # linear_kernels.cu:144-178): accumulate per-phase wall times and
        # print a [Profile] report when the workload drains
        from flexflow_tpu.config import config as _ffconfig
        from flexflow_tpu.utils.profiling import StepTimer

        self.timer = StepTimer() if _ffconfig.profiling else None
        # max horizons in flight before the oldest is fetched (reference keeps
        # <= 4 batches in flight, request_manager.cc:3124)
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self._inflight_q = []  # [(fetch future, [(slot, req), ...]), ...]
        # device->host fetches run on a worker thread so the transfer overlaps
        # the next horizon's dispatch + compute (the GIL releases inside the
        # runtime's copy call)
        self._fetcher = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._feedback = None  # device [B] tokens from the last dispatch
        self._feedback_overrides = []  # [(slot, token)] set at admit time
        self.eos_token_ids = tuple(eos_token_ids) or engine.spec.eos_ids()
        self._guid = itertools.count(1000000)
        self._pending: "queue.Queue[Request]" = queue.Queue()
        self._requests: Dict[int, Request] = {}
        self._lock = threading.Lock()

        b = engine.max_requests
        self._slots: List[Optional[Request]] = [None] * b
        self._cache_lens = np.zeros(b, np.int32)
        self._tokens = np.zeros(b, np.int32)
        self._temperature = np.zeros(b, np.float32)
        self._top_p = np.ones(b, np.float32)
        self._top_k = np.zeros(b, np.int32)
        self._adapter = np.full(b, -1, np.int64)
        self._finetune_queue = []  # co-scheduled LoRA finetuning sessions
        self._key = jax.random.PRNGKey(seed)
        self._steps = 0
        self._num_processed = 0
        # tokens already dispatched (incl. in-flight horizons) per slot —
        # the projection that lets the pipelined scheduler stop dispatching
        # into a wave whose budgets are exhausted
        self._projected = np.zeros(b, np.int64)
        self._server_thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._log = log_fn or (lambda *a: None)

    # ------------------------------------------------------------------
    # registration (reference request_manager.cc:335 register_new_request)
    # ------------------------------------------------------------------

    def register_request(
        self,
        prompt_tokens: Sequence[int],
        config: Optional[GenerationConfig] = None,
    ) -> int:
        config = config or GenerationConfig()
        if len(prompt_tokens) >= self.engine.max_seq_len:
            # reject oversize prompts synchronously: failing later inside the
            # background server thread would leave the caller waiting forever
            raise ValueError(
                f"prompt length {len(prompt_tokens)} >= max_seq_len "
                f"{self.engine.max_seq_len}"
            )
        req = Request(
            guid=next(self._guid),
            prompt_tokens=list(prompt_tokens),
            config=config,
        )
        req.profile.registration_time = time.monotonic()
        with self._lock:
            self._requests[req.guid] = req
        self._pending.put(req)
        return req.guid

    def get_request(self, guid: int) -> Request:
        return self._requests[guid]

    # ------------------------------------------------------------------
    # scheduling step (reference prepare_next_batch, request_manager.cc:612)
    # ------------------------------------------------------------------

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _admit(self) -> None:
        """Fill free slots from the pending queue (batched prefill + insert).

        All admissions of a scheduling step prefill in ONE dispatch
        (engine.prefill_batch_to_slots_async — the reference's batched prompt
        phase); prompts above the chunked-prefill token budget go through the
        token-budgeted path individually."""
        admits = []  # (slot, req)
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
            self._slots[slot] = req
            self._cache_lens[slot] = len(req.prompt_tokens)
            self._projected[slot] = 1  # the prefill's first token
            self._temperature[slot] = req.config.temperature
            self._top_p[slot] = req.config.top_p
            self._top_k[slot] = req.config.top_k
            self._adapter[slot] = req.config.adapter_id
            self._log(f"[RM] admit guid={req.guid} slot={slot} "
                      f"prompt_len={len(req.prompt_tokens)}")
            admits.append((slot, req))
        if not admits:
            return

        budget = self.engine.max_tokens_per_batch
        chunked = [
            (s, r) for s, r in admits
            if budget and len(r.prompt_tokens) > budget
        ]
        batched = [(s, r) for s, r in admits if (s, r) not in chunked]

        results = []  # (slot, req, device-or-int token)
        if batched:
            scfg = SamplingConfig(
                temperature=np.array(
                    [r.config.temperature for _, r in batched], np.float32),
                top_p=np.array([r.config.top_p for _, r in batched], np.float32),
                top_k=np.array([r.config.top_k for _, r in batched], np.int32),
            )
            toks = self.engine.prefill_batch_to_slots_async(
                [np.asarray(r.prompt_tokens, np.int32) for _, r in batched],
                [s for s, _ in batched],
                self._next_key(), scfg,
                adapter_ids=[r.config.adapter_id for _, r in batched],
            )
            results.extend(
                (s, r, toks[i]) for i, (s, r) in enumerate(batched))
        for slot, req in chunked:
            scfg1 = SamplingConfig(
                temperature=np.array([req.config.temperature], np.float32),
                top_p=np.array([req.config.top_p], np.float32),
                top_k=np.array([req.config.top_k], np.int32),
            )
            tok_dev = self.engine.prefill_to_slot_async(
                np.asarray(req.prompt_tokens, np.int32), slot,
                self._next_key(), scfg1, adapter_id=req.config.adapter_id,
            )
            results.append((slot, req, tok_dev))

        if self.pipelined:
            # first-token fetch runs on the worker thread and is consumed
            # IN DISPATCH ORDER from the in-flight queue: the old blocking
            # fetch at the next step's start waited for every queued horizon
            # plus the prefill (admit phase measured 334 ms mean in the
            # round-3 capture — admission serialized with decode)
            fut = self._fetcher.submit(
                self.engine.fetch, jnp.stack([t for _, _, t in results])
            )
            self._inflight_q.append(("first", fut, list(results)))
            for slot, req, tok_dev in results:
                self._feedback_overrides.append((slot, tok_dev))
        else:
            fetched = self.engine.fetch(jnp.stack([t for _, _, t in results]))
            for (slot, req, _), tok in zip(results, fetched):
                first_tok = int(tok)
                req.profile.first_token_time = time.monotonic()
                req.profile.llm_decoding_steps = 1
                req.output_tokens.append(first_tok)
                self._tokens[slot] = first_tok
                self._feedback_overrides.append((slot, first_tok))
                if self._finished(req, first_tok):
                    self._retire(slot)

    def _finished(self, req: Request, last_token: int) -> bool:
        if last_token in self.eos_token_ids or last_token in tuple(
            req.config.stop_token_ids
        ):
            return True
        if len(req.output_tokens) >= req.config.max_new_tokens:
            return True
        total = len(req.prompt_tokens) + len(req.output_tokens)
        # cache genuinely full (the horizon is clamped to the remaining
        # headroom by _choose_horizon, so no early retirement needed)
        return total >= self.engine.max_seq_len

    def _retire(self, slot: int) -> None:
        req = self._slots[slot]
        req.state = COMPLETED
        req.profile.finish_time = time.monotonic()
        self._slots[slot] = None
        self._cache_lens[slot] = 0
        self._adapter[slot] = -1
        self._projected[slot] = 0
        self._num_processed += 1
        self._log(
            f"[Profile] guid({req.guid}) llm_decoding_steps("
            f"{req.profile.llm_decoding_steps}) latency({req.profile.latency * 1e3:.3f}) "
            f"ttft({req.profile.ttft * 1e3:.3f})"
        )
        req.done.set()

    def _process_horizon(self, out_tokens: np.ndarray, entries) -> None:
        """Apply one fetched horizon's tokens to its dispatched requests.

        Runs the whole-horizon bookkeeping (token append, EOS / budget /
        max-new completion) in the native scheduler core when available —
        the reference does the same work in C++ on its dedicated CPU task
        (request_manager.cc:713-1130); the Python loop is the fallback and
        the behavioral reference (tests/test_native.py gates equivalence).
        """
        from flexflow_tpu.utils import native_scheduler

        n = out_tokens.shape[0]
        live = [(s, r) for s, r in entries if r.state != COMPLETED]
        if native_scheduler.available() and live:
            b = self.engine.max_requests
            active = np.zeros(b, np.int32)
            counts = np.zeros(b, np.int32)
            max_new = np.full(b, 1 << 30, np.int32)
            totals = np.zeros(b, np.int32)
            budget = np.full(b, 1 << 30, np.int32)
            max_stop = max(
                [len(tuple(r.config.stop_token_ids)) for _, r in live] + [1]
            )
            stop_ids = np.full((b, max_stop), -1, np.int32)
            stop_counts = np.zeros(b, np.int32)
            for s, r in live:
                active[s] = 1
                counts[s] = len(r.output_tokens)
                max_new[s] = r.config.max_new_tokens
                totals[s] = len(r.prompt_tokens) + len(r.output_tokens)
                budget[s] = self.engine.max_seq_len
                sids = tuple(r.config.stop_token_ids)
                stop_counts[s] = len(sids)
                stop_ids[s, : len(sids)] = sids
            eos = np.asarray(self.eos_token_ids or [-1], np.int32)
            # margin 1: retire only when the cache is genuinely full —
            # _choose_horizon clamps dispatches to the remaining headroom,
            # so the old leave-room-for-a-full-horizon margin would cut
            # outputs short near the context limit
            toks, taken, fin = native_scheduler.process_horizon(
                np.asarray(out_tokens, np.int32), active, counts, max_new,
                totals, budget, 1, eos,
                stop_ids, stop_counts,
            )
            for s, r in live:
                k = int(taken[s])
                r.output_tokens.extend(int(x) for x in toks[s, :k])
                r.profile.llm_decoding_steps += k
                if fin[s]:
                    self._retire(s)
            return
        for slot, req in live:
            for i in range(n):
                tok = int(out_tokens[i, slot])
                req.output_tokens.append(tok)
                req.profile.llm_decoding_steps += 1
                if self._finished(req, tok):
                    self._retire(slot)
                    break

    def _process_first(self, vals, pend) -> None:
        """Apply a fetched batch of admission first tokens."""
        now = time.monotonic()
        for (slot, req, _), tok in zip(pend, vals):
            tok = int(tok)
            req.profile.first_token_time = now
            req.profile.llm_decoding_steps = 1
            req.output_tokens.append(tok)
            if self._finished(req, tok):
                self._retire(slot)

    def _phase(self, name: str):
        if self.timer is None:
            import contextlib

            return contextlib.nullcontext()
        return self.timer.phase(name)

    def _choose_horizon(self, active, *, projected: bool = False) -> int:
        """Drain-aware horizon: when every active request retires within k
        steps (max_new budgets), dispatch a power-of-two horizon >= k
        instead of the full one — full horizons into a retiring wave were
        ~2-4 of 12 in the headline bench (pure waste). Power-of-two buckets
        bound the compile count (the BatchConfig static-shape discipline).

        ``projected=True`` (pipelined mode) counts in-flight horizons too and
        returns 0 when every active slot's budget is already covered by
        dispatched work — the caller then skips the dispatch entirely."""
        rem = 0
        for s in active:
            req = self._slots[s]
            done = (
                int(self._projected[s]) if projected
                else len(req.output_tokens)
            )
            # remaining = token budget AND cache headroom (so requests can
            # decode into the LAST cache positions instead of retiring a
            # full horizon early)
            room = self.engine.max_seq_len - (len(req.prompt_tokens) + done)
            rem = max(rem, min(req.config.max_new_tokens - done, room))
        if rem <= 0:
            return 0 if projected else 1
        n = 1
        while n < rem:
            n *= 2
        return max(1, min(n, self.decode_horizon))

    def _apply_fetched(self, kind: str, out, entries) -> None:
        if kind == "first":
            self._process_first(out, entries)
        else:
            self._process_horizon(out, entries)

    def _step_pipelined(self) -> bool:
        # consume any COMPLETED prefix of the in-flight queue first (non-
        # blocking, keeps dispatch order): first tokens and finished
        # horizons apply without waiting for the pipeline to fill
        while self._inflight_q and self._inflight_q[0][1].done():
            kind, fut, entries = self._inflight_q.pop(0)
            self._apply_fetched(kind, fut.result(), entries)
        with self._phase("admit"):
            self._admit()
        active = [s for s in range(self.engine.max_requests) if self._slots[s]]

        n = self._choose_horizon(active, projected=True) if active else 0
        if active and n > 0:
            scfg = SamplingConfig(
                temperature=self._temperature, top_p=self._top_p,
                top_k=self._top_k,
            )
            tokens_in = (
                self._feedback
                if self._feedback is not None
                else jnp.asarray(self._tokens)
            )
            for slot, tok in self._feedback_overrides:
                tokens_in = tokens_in.at[slot].set(tok)
            self._feedback_overrides = []
            lens = self._cache_lens.copy()
            with self._phase("decode_dispatch"):
                out_dev = self.engine.decode_horizon_async(
                    lens, tokens_in, self._next_key(), scfg, n,
                    adapter_ids=self._adapter,
                    # length-aware attention: read only the committed bucket
                    window=self.engine.attn_window_bucket(
                        int(lens[active].max())),
                )
            entries = [(s, self._slots[s]) for s in active]
            for s in active:
                self._cache_lens[s] += n
                self._projected[s] += n
            self._feedback = out_dev[-1]
            fut = self._fetcher.submit(self.engine.fetch, out_dev)
            self._inflight_q.append(("horizon", fut, entries))
            self._steps += n

        # consume the oldest entry once the pipeline is full (or draining:
        # no active slots, or active slots whose budgets are fully covered
        # by in-flight work); only HORIZON entries count toward depth —
        # first-token fetches are cheap bookkeeping riding the same queue
        def horizons_in_flight():
            return sum(1 for k, _, _ in self._inflight_q if k == "horizon")

        while self._inflight_q and (
            horizons_in_flight() >= self.pipeline_depth
            or not active or n == 0
        ):
            kind, fut, entries = self._inflight_q.pop(0)
            with self._phase("horizon_fetch"):
                out = fut.result()
            self._apply_fetched(kind, out, entries)
            if active and n > 0 and kind == "horizon":
                break  # drain at most one horizon per step while running

        return bool(active or self._inflight_q)

    def step(self) -> bool:
        """One scheduling iteration; returns True if any request is in flight."""
        if self.pipelined and self.decode_horizon > 1:
            return self._step_pipelined()
        with self._phase("admit"):
            self._admit()
        active = [s for s in range(self.engine.max_requests) if self._slots[s]]
        if not active:
            return False
        scfg = SamplingConfig(
            temperature=self._temperature, top_p=self._top_p, top_k=self._top_k
        )
        n = (
            self._choose_horizon(active)
            if self.decode_horizon > 1
            else 1
        )
        window = self.engine.attn_window_bucket(
            int(self._cache_lens[active].max()))
        with self._phase("decode"):
            if n == 1:
                horizon_tokens = self.engine.decode(
                    self._cache_lens, self._tokens, self._next_key(), scfg,
                    adapter_ids=self._adapter, window=window,
                )[None, :]
            else:
                horizon_tokens = self.engine.decode_horizon(
                    self._cache_lens, self._tokens, self._next_key(), scfg, n,
                    adapter_ids=self._adapter, window=window,
                )  # [n, B]
        self._steps += n
        for slot in active:
            req = self._slots[slot]
            for i in range(n):
                tok = int(horizon_tokens[i, slot])
                req.output_tokens.append(tok)
                req.profile.llm_decoding_steps += 1
                if self._finished(req, tok):
                    self._retire(slot)
                    break
            else:
                # request continues: all n tokens' KV are in the cache
                self._cache_lens[slot] += n
                self._tokens[slot] = int(horizon_tokens[n - 1, slot])
        return True

    # ------------------------------------------------------------------
    # serving loops (reference serve_incr_decoding, request_manager.cc:3012)
    # ------------------------------------------------------------------

    def register_finetune(self, session) -> None:
        """Queue a LoRA finetuning session to run alongside serving
        (reference: PEFT finetuning request queue, request_manager.cc
        PEFT slot in prepare_next_batch)."""
        self._finetune_queue.append(session)

    def _finetune_tick(self) -> bool:
        if not self._finetune_queue:
            return False
        session = self._finetune_queue[0]
        done = session.tick(self.engine)
        if done:
            self._finetune_queue.pop(0)
        return True

    def run_until_idle(self) -> None:
        while True:
            busy = self.step()
            busy |= self._finetune_tick()
            if not busy and self._pending.empty():
                break
        if self.timer is not None:
            for line in self.timer.report():
                print(line)
            # per-op timing in the reference's per-kernel bracket style
            # (linear_kernels.cu:144-178) — once per workload drain
            if not getattr(self, "_per_op_printed", False):
                self._per_op_printed = True
                from flexflow_tpu.serving.engine import InferenceEngine
                from flexflow_tpu.utils.profiling import per_op_profile

                if type(self.engine) is InferenceEngine:
                    for line in per_op_profile(
                        self.engine.spec, self.engine.params
                    ):
                        print(line)

    def generate(
        self,
        prompts: Union[Sequence[int], Sequence[Sequence[int]]],
        config: Optional[GenerationConfig] = None,
    ) -> List[Request]:
        """Synchronous batch generate (token-id interface)."""
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
            # the background loop died mid-generation: surface the crash to
            # the waiter instead of returning partial output as if complete
            raise RuntimeError(
                f"serving loop failed during generation: {failed.error}"
            )
        return reqs

    # background server (reference start_background_server,
    # request_manager.cc:2913)
    def start_background_server(self) -> None:
        if self._server_thread is not None:
            return
        self._stop.clear()

        def loop():
            try:
                while not self._stop.is_set():
                    if not self.step():
                        time.sleep(0.001)
            except BaseException as e:
                self._fail_all_inflight(e)
                raise

        self._server_thread = threading.Thread(target=loop, daemon=True)
        self._server_thread.start()

    def _fail_all_inflight(self, exc: BaseException) -> None:
        """Unblock every waiter when the serving loop dies. Requests are
        marked FAILED (with the exception recorded) so ``generate()`` raises
        instead of returning partial output indistinguishable from success."""
        with self._lock:
            for req in self._requests.values():
                if not req.done.is_set():
                    req.state = FAILED
                    req.error = f"{type(exc).__name__}: {exc}"
                    req.done.set()

    def stop_server(self) -> None:
        if self._server_thread is None:
            return
        self._stop.set()
        self._server_thread.join()
        self._server_thread = None

    # ------------------------------------------------------------------

    @property
    def num_processed_requests(self) -> int:
        return self._num_processed

    @property
    def total_decoding_steps(self) -> int:
        return self._steps
