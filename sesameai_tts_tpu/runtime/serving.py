"""Batched multi-session serving: continuous batching over slot-indexed
KV caches.

The reference serves one request at a time (batch hardcoded 1,
reference generator.py:47; SURVEY.md §2.3 DP row) — web concurrency is
just a gradio queue.  This engine decodes B sessions per backbone step
(BASELINE config 5): a slot pool backed by ONE batched ``CSMState`` and
ONE batched Mimi decode state; admissions prefill at B=1 and are
scattered into their slot; every scheduler tick runs a single fused
program — chunked ``decode_frames`` over all slots plus batched
streaming Mimi decode — and fetches frames, flags and PCM in one packed
buffer (one ~30 ms remote round trip per tick).

Throughput scales ~linearly with occupied slots until the MXU saturates,
because the AR decode is weight-bandwidth-bound: the same weight reads
serve all B sessions.
"""

from __future__ import annotations

import functools
import itertools
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sesameai_tts_tpu.models import csm as csm_model
from sesameai_tts_tpu.runtime.generator import FRAME_MS, Generator


class ServerSaturated(RuntimeError):
    """Raised by non-blocking submit when the admission backlog is full.

    The HTTP front end maps this to 429 + Retry-After; in-process
    callers either catch it or use the default blocking submit."""

    def __init__(self, msg: str, retry_after_s: float = 1.0):
        super().__init__(msg)
        self.retry_after_s = retry_after_s


@dataclass
class Session:
    """One TTS request; audio chunks arrive on ``chunks`` (None = end).

    ``cached_context`` takes a Generator ``precompute_context_state``
    handle — the voice-prefix KV is then reused instead of re-prefilled
    per request (the serving analog of the TTS engine's context cache).
    """

    text: str
    speaker: int = 1
    context: Sequence = ()
    temperature: float = 0.8
    topk: int = 40
    max_audio_length_ms: float = 30_000
    # admission class: lower admits first (FIFO within a class). None =
    # derived from max_audio_length_ms at submit (short requests are
    # interactive, long ones bulk) — see BatchedTTSServer.submit
    priority: Optional[int] = None
    cached_context: Optional[tuple] = None
    chunks: "queue.Queue[Optional[np.ndarray]]" = field(default_factory=queue.Queue)
    frames_out: List[np.ndarray] = field(default_factory=list)
    error: Optional[Exception] = None
    cancelled: bool = False
    submitted_at: float = field(default_factory=time.time)
    first_audio_at: Optional[float] = None
    finished_at: Optional[float] = None

    def cancel(self) -> None:
        """Stop generating for this session: frees its slot at the next
        scheduler tick (already-queued audio chunks stay readable)."""
        self.cancelled = True

    def audio(self, timeout: Optional[float] = None) -> np.ndarray:
        """Block until finished; return concatenated PCM.

        ``timeout`` bounds the TOTAL wait (not each chunk gap): on
        expiry, already-queued chunks still drain, then ``queue.Empty``
        is raised if the session would have to be waited on further."""
        out = []
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            if deadline is None:
                chunk = self.chunks.get()
            else:
                rem = deadline - time.monotonic()
                chunk = (
                    self.chunks.get(timeout=rem) if rem > 0
                    else self.chunks.get_nowait()  # drain, never block
                )
            if chunk is None:
                break
            out.append(chunk)
        if self.error is not None:
            raise self.error
        return np.concatenate(out) if out else np.zeros((0,), np.float32)


class BatchedTTSServer:
    """Slot-pool scheduler over a Generator's model/codec programs.

    Sampling params are per-slot: temperature and topk ride the jitted
    decode program as (B,) arrays, so concurrent sessions keep their own
    values (the threshold bisection in ops/sampling.py handles traced
    per-row k).

    Admission prefill runs on a dedicated worker thread: the tick thread
    only scatters ready states into slots (one cheap device op), so new
    sessions no longer stall in-flight decode for the prefill + host
    round-trip latency.
    """

    def __init__(self, generator: Generator, slots: int = 4,
                 chunk_frames: int = 10, max_pending: Optional[int] = None):
        # the tick runs ONE fused program over model + codec; a
        # codec_device split would hand it mixed-device inputs.
        # A real raise, not an assert — python -O would otherwise let the
        # first tick fail with an opaque mixed-device placement error
        if getattr(generator, "_codec_device", None) is not None:
            raise ValueError(
                "BatchedTTSServer needs a single-device (or mesh) generator; "
                "the codec_device stage split applies to streaming generation"
            )
        self.gen = generator
        self.B = slots
        # the fused tick streams Mimi with a carried ring cache whose
        # slack caps frames-per-chunk (codec/transformer.py assert) —
        # clamp rather than crash the first tick
        ring_cap = generator._mimi.max_stream_chunk_frames
        if chunk_frames > ring_cap:
            import logging

            logging.getLogger(__name__).warning(
                "chunk_frames=%d exceeds the codec streaming ring "
                "(%d frames/tick); clamping", chunk_frames, ring_cap,
            )
            chunk_frames = ring_cap
        self.chunk = chunk_frames
        self._budget = np.zeros(slots, np.int64)  # frames left per slot
        self._temperature = np.ones(slots, np.float32)
        self._topk = np.ones(slots, np.int32)
        self._sessions: List[Optional[Session]] = [None] * slots
        self._reset_pool_state()
        # admission backlog. ``max_pending`` bounds it (backpressure):
        # a full backlog makes non-blocking submits raise ServerSaturated
        # (HTTP 429) instead of queueing unboundedly — a burst of
        # max-length requests must not accumulate hung listeners behind
        # minutes of decode (VERDICT r3 #5). None = unbounded (library
        # callers that want the old fire-and-wait behavior).
        self.max_pending = max_pending
        # priority admission queue, entries (priority, seq, session):
        # an interactive request submitted behind a bulk burst admits
        # FIRST instead of queueing behind ~100 ms-each admissions of
        # every long job ahead of it (measured B=16: a 12-long burst put
        # the next short request's TTFA p95 at ~400-1000 ms; priority
        # admission removes exactly that term). seq keeps FIFO within a
        # class and makes entries totally ordered without comparing
        # Session objects. Sustained interactive overload can delay bulk
        # admissions (documented SJF tradeoff); once admitted to slots,
        # bulk progress is tick-scheduled and unaffected.
        self._pending: "queue.PriorityQueue[tuple]" = queue.PriorityQueue(
            maxsize=max_pending or 0
        )
        self._seq = itertools.count()
        # (device pool state lives in _reset_pool_state so the tick-loop
        # recovery path can rebuild it after a failed donated dispatch)
        # admissions in flight on the worker thread (prefill running or
        # result waiting for a slot): the tick loop shrinks its dispatch
        # chunks while this is non-zero so the prefill doesn't queue
        # behind ~100 ms of in-flight decode (TTFA under load)
        self._admitting = 0
        # prefilled sessions awaiting a slot. BOUNDED: each entry pins a
        # full B=1 backbone KV cache (+codec state) on device, so the
        # admission worker blocks here instead of prefilling the whole
        # backlog into HBM
        self._ready: "queue.Queue[tuple]" = queue.Queue(maxsize=max(2, slots))
        # dispatched admissions whose first-chunk fetch hasn't landed yet
        # (hand-off between the dispatch and completion workers). BOUNDED
        # for the same HBM reason as _ready: each entry pins a B=1 state.
        self._dispatched: "queue.Queue[tuple]" = queue.Queue(maxsize=2)
        self._lock = threading.Lock()
        # blocked submit(wait=True) callers park here; the dispatch loop
        # notifies after draining a _pending entry and stop() broadcasts
        # on shutdown. A CV (not a sleep-poll) because this is a 1-CPU
        # host: a busy-waiting bulk caller would steal the core the
        # decode threads need (VERDICT r4 #7)
        self._backlog_cv = threading.Condition(self._lock)
        # submit(wait=True) callers parked on the CV: part of the real
        # admission backlog but invisible to _pending.qsize() (bounded by
        # max_pending), so _tick_size counts them explicitly — otherwise
        # a bulk burst against a small max_pending reads as a shallow
        # interactive backlog and runs permanently capped ticks
        self._parked = 0
        self._inflight = None  # lag-1 dispatched tick awaiting fetch
        self._running = False
        # structured observability (SURVEY.md §5: the reference has only
        # ad-hoc prints): TTFA distribution + counters for /metrics
        from sesameai_tts_tpu.utils.profiling import Metrics

        self.metrics = Metrics()
        self._sessions_total = 0
        self._frames_total = 0
        self._started_at = time.time()
        self._thread: Optional[threading.Thread] = None
        self._admitter: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None
        self._build_programs()

    def _reset_pool_state(self) -> None:
        """(Re)allocate the batched device state.  Called at construction
        AND by the tick-loop recovery: a failed dispatch may have consumed
        its donated inputs, leaving self._state/_mimi_state as deleted
        buffers that would poison every later attach."""
        generator = self.gen
        cfg = generator._cfg
        slots = self.B
        # dp-sharded when the generator runs on a mesh: the slot pool's
        # batch axis spreads across chips (multi-chip batched serving)
        self._state = generator._init_state(slots)
        self._prev_frame = jnp.zeros((slots, cfg.audio_num_codebooks), jnp.int32)
        self._done = jnp.ones((slots,), bool)  # all slots idle (=done)
        # ONE batched Mimi decode state: every tick runs codec decode for
        # all B slots in the same fused program as the AR decode (idle
        # slots chew zero frames — harmless, reset on attach)
        self._mimi_state = generator._mimi.init_decode_state(
            slots, generator._mimi_dtype
        )

    # -- jitted slot ops -----------------------------------------------------

    def _build_programs(self):
        cfg = self.gen._cfg

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scatter_slot(batched: csm_model.CSMState, single: csm_model.CSMState,
                         frame1, done1, prev_frame, done, slot):
            def upd(b, s):
                # stacked caches are (L, B, KV, T, hd) — slot on axis 1;
                # unstacked per-layer caches are (B, KV, T, hd) — axis 0
                starts = (0, slot, 0, 0, 0) if b.ndim == 5 else (slot, 0, 0, 0)
                return jax.lax.dynamic_update_slice(
                    b, s, tuple(jnp.asarray(i, jnp.int32) for i in starts)
                )

            k = jax.tree.map(upd, batched.cache.k, single.cache.k)
            v = jax.tree.map(upd, batched.cache.v, single.cache.v)
            pos = jax.lax.dynamic_update_slice(batched.pos, single.pos, (slot,))
            prev = jax.lax.dynamic_update_slice(prev_frame, frame1, (slot, 0))
            dn = jax.lax.dynamic_update_slice(done, done1, (slot,))
            return csm_model.CSMState(csm_model.KVCache(k, v), pos), prev, dn

        @jax.jit
        def mark_done(done, slot):
            return done.at[slot].set(True)

        from sesameai_tts_tpu.codec.mimi import Mimi

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scatter_mimi(batched: Mimi.DecodeState, single: Mimi.DecodeState,
                         slot):
            """Reset slot `slot`'s codec state to an admitted session's
            (post-first-frame) state.  Mimi state leaves batch on axis 0
            (conv buffers, tf_pos) or axis 1 (codec KV cache: (L, B, ...))."""
            s32 = jnp.asarray(slot, jnp.int32)
            z = jnp.int32(0)

            def ax0(b, s):
                return jax.lax.dynamic_update_slice(
                    b, s.astype(b.dtype), (s32,) + (z,) * (b.ndim - 1)
                )

            def ax1(b, s):
                return jax.lax.dynamic_update_slice(
                    b, s.astype(b.dtype), (z, s32) + (z,) * (b.ndim - 2)
                )

            return Mimi.DecodeState(
                upsample=jax.tree.map(ax0, batched.upsample, single.upsample),
                tf_cache=jax.tree.map(ax1, batched.tf_cache, single.tf_cache),
                tf_pos=jax.lax.dynamic_update_slice(
                    batched.tf_pos, single.tf_pos, (s32,)
                ),
                seanet=jax.tree.map(ax0, batched.seanet, single.seanet),
            )

        self._scatter_slot = scatter_slot
        self._scatter_mimi = scatter_mimi
        self._mark_done = mark_done

    # -- public API -----------------------------------------------------------

    def warmup(self) -> dict:
        """Compile the full serve-path program set before traffic.

        Covers everything a live request can first-trigger (each a
        minutes-long remote compile on this platform if paid live):
        every prefill bucket, the first-audio program, the fused tick at
        B=slots for both scheduler tick sizes ({chunk, 3}), and the
        slot-scatter/mark-done programs.  All warmup inputs are
        throwaway buffers, so it is safe on a running (idle) server —
        but the intended call site is serve-start, before the port
        binds.  Returns {program: seconds}."""
        gen = self.gen
        times = gen.warmup(
            serving_batch=self.B, tick_sizes={self.chunk, 3}, stream=False,
        )
        K = gen._cfg.audio_num_codebooks
        t0 = time.perf_counter()
        # scatter programs donate the batched side: warm on throwaways
        b_state, s_state = gen._init_state(self.B), gen._init_state(1)
        out = self._scatter_slot(
            b_state, s_state, jnp.zeros((1, K), jnp.int32),
            jnp.asarray([False]), jnp.zeros((self.B, K), jnp.int32),
            jnp.ones((self.B,), bool), jnp.int32(0),
        )
        jax.block_until_ready(out)
        times["scatter_slot"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        ms_b = gen._mimi.init_decode_state(self.B, gen._mimi_dtype)
        ms_1 = gen._mimi.init_decode_state(1, gen._mimi_dtype)
        jax.block_until_ready(self._scatter_mimi(ms_b, ms_1, jnp.int32(0)))
        times["scatter_mimi"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(
            self._mark_done(jnp.ones((self.B,), bool), jnp.int32(0))
        )
        times["mark_done"] = time.perf_counter() - t0
        return times

    def link_canary(self, reps: int = 3) -> dict:
        """Drift canary: time the ALREADY-COMPILED tick program + the
        host↔device round trip, so operators (and benches) can tell
        "code regressed" from "the shared TPU service is in a slow
        phase" in one call — this platform drifts 6-20% run-to-run
        (PARITY.md).  Healthy v5e reference points: rtt ~30 ms,
        B=16/n=10 tick ~11-12 ms/frame-step.  Runs on throwaway buffers
        (never touches the live pool state) but does share the device
        queue: a deep health check during heavy traffic measures
        traffic too, by design.  Exposed as GET /healthz?deep=1."""
        gen = self.gen
        K = gen._cfg.audio_num_codebooks
        rtt = gen._probe_rtt()
        n = self.chunk
        state = gen._init_state(self.B)
        ms = gen._mimi.init_decode_state(self.B, gen._mimi_dtype)
        prev = jnp.zeros((self.B, K), jnp.int32)
        done = jnp.zeros((self.B,), bool)
        tb = jnp.ones((self.B,), jnp.float32)
        kb = jnp.ones((self.B,), jnp.int32) * 5
        key = jax.random.PRNGKey(0)
        # same program as the live tick (same shapes/dtypes) — compiled
        # by warmup or by traffic; one warm rep, then timed chained reps
        # with a single trailing fetch (dispatch-timing micro-benchmarks
        # lie on this platform; many-reps + one fetch is the method that
        # measures real execution)
        packed, prev, done, state, ms = gen._decode_mimi_packed(
            gen._params, gen._mimi_params, state, ms, prev, done, key, n,
            tb, kb,
        )
        np.asarray(packed[-1])
        t0 = time.perf_counter()
        for _ in range(reps):
            packed, prev, done, state, ms = gen._decode_mimi_packed(
                gen._params, gen._mimi_params, state, ms, prev, done, key, n,
                tb, kb,
            )
        np.asarray(packed[-1])
        dt = time.perf_counter() - t0
        return {
            "rtt_ms": round(rtt * 1e3, 2),
            "tick_ms_per_frame_step": round(dt / reps / n * 1e3, 3),
            "tick_frames_per_s": round(self.B * n * reps / dt, 1),
            "tick_batch": self.B,
            "tick_frames": n,
        }

    # requests budgeted at or under this admit ahead of longer ones
    # (Session.priority overrides). 4 s covers interactive probes and
    # short chat sentences; bulk jobs typically budget 6-30 s.
    INTERACTIVE_MAX_MS = 4_000

    def submit(self, text: str, wait: bool = True, **kw) -> Session:
        """Enqueue one request.  ``wait=False`` raises ServerSaturated
        instead of blocking when the bounded backlog (``max_pending``)
        is full — the HTTP front end's 429 path.

        Admission order is priority-then-FIFO: ``priority`` (lower
        first; derived when unset — requests budgeted ≤
        ``INTERACTIVE_MAX_MS`` are class 0, longer ones class 1) so an
        interactive request never waits behind a bulk burst's
        admissions."""
        s = Session(text=text, **kw)
        prio = s.priority
        if prio is None:
            prio = 0 if s.max_audio_length_ms <= self.INTERACTIVE_MAX_MS else 1
        with self._backlog_cv:  # atomic with stop()'s _running flip: a
            # session must never be enqueued after the final drain (its
            # listener would block forever on a queue no thread consumes)
            while True:
                if not self._running:
                    raise RuntimeError("server is not running (call start())")
                try:
                    self._pending.put_nowait((prio, next(self._seq), s))
                    self._sessions_total += 1
                    return s
                except queue.Full:
                    if not wait:
                        raise ServerSaturated(
                            f"admission backlog full ({self.max_pending} "
                            f"queued, {self.B} slots)",
                            retry_after_s=self._retry_after_estimate(),
                        ) from None
                # park until the dispatch loop drains an entry or stop()
                # broadcasts; wait() releases the lock so neither is
                # blocked by us. The timeout is a missed-wakeup backstop
                # only — steady state costs zero CPU (the old 5 ms poll
                # burned the single host core bulk decode needs)
                self._parked += 1
                try:
                    self._backlog_cv.wait(timeout=0.5)
                finally:
                    self._parked -= 1

    def _retry_after_estimate(self) -> float:
        """Seconds until the backlog likely has room: queued work divided
        by the pool's session turnover (median observed session time per
        slot), clamped to a sane [1, 30] advisory range."""
        sess = self.metrics.summary().get("session_s", {})
        per = float(sess.get("p50", 2.0)) or 2.0
        q = self._pending.qsize()
        return float(min(30.0, max(1.0, q * per / max(self.B, 1))))

    def synthesize_batch(
        self,
        texts: Sequence[str],
        timeout: Optional[float] = 600.0,
        **kw,
    ) -> List[np.ndarray]:
        """Synthesize many utterances concurrently over the slot pool;
        return their PCM in input order.

        The offline analog of the reference's sequential per-sentence
        loop (web_storyteller.py:226-287 / tts_service.py:472-525): all
        texts share the pool, so wall-clock is aggregate-throughput
        bound (~B× the sequential path at full occupancy) instead of
        single-stream bound. ``kw`` (speaker/temperature/topk/
        cached_context/...) applies to every text. ``timeout`` is one
        overall deadline for the whole batch. A failed utterance raises
        after the others are collected — cancel-on-first-error would
        waste already-decoded audio.
        """
        sessions = [self.submit(t, **kw) for t in texts]
        deadline = None if timeout is None else time.monotonic() + timeout
        out: List[Optional[np.ndarray]] = [None] * len(sessions)
        first_err: Optional[Exception] = None
        for i, s in enumerate(sessions):
            rem = (
                None if deadline is None
                else max(0.0, deadline - time.monotonic())
            )
            try:
                out[i] = s.audio(timeout=rem)
            except Exception as e:  # keep draining: later sessions still
                first_err = first_err or e  # hold slots until consumed
                s.cancel()
        if first_err is not None:
            raise first_err
        return out  # type: ignore[return-value]

    def metrics_summary(self) -> dict:
        """Structured engine metrics: TTFA percentiles, frame/session
        counters, occupancy — the /metrics HTTP surface."""
        occupied = sum(1 for s in self._sessions if s is not None)
        return {
            "sessions_total": self._sessions_total,
            "frames_total": self._frames_total,
            "slots": self.B,
            "slots_occupied": occupied,
            "uptime_s": round(time.time() - self._started_at, 3),
            "series": self.metrics.summary(),
        }

    def start(self):
        self._running = True
        self._admitter = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._admitter.start()
        self._completer = threading.Thread(
            target=self._completion_loop, daemon=True
        )
        self._completer.start()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _terminate_queued(self, err: Exception) -> None:
        """Drain _pending/_ready, erroring every queued session (shared
        by stop() and any path that must fail the backlog)."""
        for q in (self._pending, self._dispatched, self._ready):
            while True:
                try:
                    item = q.get_nowait()
                except queue.Empty:
                    break
                # _pending entries are (prio, seq, session); _dispatched/
                # _ready entries carry the session first
                s = (item if isinstance(item, Session)
                     else next(x for x in item if isinstance(x, Session)))
                s.error = err
                s.chunks.put(None)

    def stop(self):
        with self._backlog_cv:  # after this, submit() raises — nothing can
            self._running = False  # be enqueued past the drain below
            self._backlog_cv.notify_all()  # parked submitters see the flip
        if self._thread:
            self._thread.join(timeout=10)
        if self._admitter:
            self._admitter.join(timeout=10)
        if self._completer:
            self._completer.join(timeout=10)
        # Sessions still queued (_pending/_ready) or attached to a slot
        # when the threads exit must observe termination — a listener
        # blocked in audio() with no timeout would otherwise hang forever.
        err = RuntimeError("server stopped")
        self._terminate_queued(err)
        for slot in range(self.B):
            s = self._sessions[slot]
            if s is not None:
                s.error = err
                self._sessions[slot] = None
                s.chunks.put(None)

    # -- admission (worker thread: prefill + host syncs off the tick) ---------

    def _dispatch_admission(self, session: Session):
        """Stage 1: dispatch one session's prefill + first-chunk programs
        (async — nothing is fetched here). Returns the in-flight record,
        or None if the session failed at dispatch."""
        gen = self.gen
        max_gen = int(session.max_audio_length_ms / FRAME_MS)
        try:
            frame, state1, done1, max_gen = gen._prefill_utterance(
                session.text, session.speaker, list(session.context),
                session.cached_context, max_gen, session.temperature,
                session.topk,
            )
            # the prefill frame's PCM decodes here (B=1 state, scattered
            # into the batched codec state at attach); (done, frame, PCM)
            # arrive in one fetch — the only host sync on admission
            ms1 = gen._mimi.init_decode_state(1, gen._mimi_dtype)
            packed0, ms1 = gen._first_chunk(gen._mimi_params, frame, done1, ms1)
        except Exception as e:
            session.error = e
            session.chunks.put(None)
            return None
        return (session, frame, state1, max_gen, ms1, packed0)

    def _complete_admission(self, inflight) -> None:
        """Stage 2: fetch the dispatched first chunk, emit first audio,
        hand the session to the tick thread (or finish it on EOS)."""
        gen = self.gen
        K = gen._cfg.audio_num_codebooks
        session, frame, state1, max_gen, ms1, packed0 = inflight
        try:
            arr0 = np.asarray(packed0)
        except Exception as e:
            session.error = e
            session.chunks.put(None)
            return
        done1_np = bool(arr0[0])
        frame_np = arr0[1 : 1 + K].reshape(1, K)
        wav0 = arr0[1 + K :].view(np.float32)
        # first audio leaves HERE, on the admission thread — TTFA no
        # longer waits for the tick thread to find a free slot and
        # scatter (was the dominant under-load latency term: ~1 tick
        # cadence + attach, measured +60-80 ms at 3 busy slots)
        if not done1_np:
            self._emit_session(session, frame_np, wav0)
        if done1_np or max_gen <= 1:
            # EOS on the prefill frame / 1-frame budget: the session
            # is complete without ever occupying a slot
            self._finish_session(session)
            return
        item = (session, frame, state1, max_gen, ms1)
        placed = False
        while self._running:  # bounded queue: block without hanging stop()
            try:
                self._ready.put(item, timeout=0.2)
                placed = True
                break
            except queue.Full:
                continue
        if not placed:  # stop() raced the bounded put: terminate cleanly
            session.error = RuntimeError("server stopped")
            session.chunks.put(None)

    def _dispatch_loop(self):
        """Admission pipeline stage 1 (own thread): dispatch session
        N+1's prefill WHILE session N's first-chunk fetch is in flight on
        the completion thread, so the ~30-60 ms remote fetch round trip
        rides under the next prefill's execution.

        Serialized admissions were the bulk-workload bottleneck: the
        fused tick engine sustains ~1390 f/s at B=16 (measured
        device-only) but each admission cost ~100 ms wall (prefill +
        first-chunk fetch), so 32 short sessions spent more wall
        admitting than decoding.  Dispatch and completion are SEPARATE
        threads (not one alternating loop) so a dispatch that blocks —
        a first-use prefill-bucket size is a minutes-long remote compile
        on this platform — never delays delivering a first chunk the
        device already finished."""
        while self._running:
            try:
                _, _, session = self._pending.get(timeout=0.05)
            except queue.Empty:
                continue
            with self._backlog_cv:  # a backlog slot just freed: wake one
                self._backlog_cv.notify()  # parked submit(wait=True)
            if session.cancelled:
                session.chunks.put(None)
                continue
            self._admitting += 1  # GIL-atomic; tick thread reads
            inflight = self._dispatch_admission(session)
            if inflight is None:
                self._admitting -= 1
                continue
            placed = False
            while self._running:  # bounded: ≤2 device-resident B=1
                try:  # states beyond _ready; block without hanging stop()
                    self._dispatched.put(inflight, timeout=0.2)
                    placed = True
                    break
                except queue.Full:
                    continue
            if not placed:  # stop() raced the bounded put
                session.error = RuntimeError("server stopped")
                session.chunks.put(None)
                self._admitting -= 1

    def _completion_loop(self):
        """Admission pipeline stage 2 (own thread): fetch dispatched
        first chunks in dispatch order and hand sessions to the tick
        thread; runs concurrently with stage 1's next dispatch."""
        while self._running:
            try:
                inflight = self._dispatched.get(timeout=0.05)
            except queue.Empty:
                continue
            self._complete_admission(inflight)
            self._admitting -= 1

    def _attach(self, slot: int, item) -> None:
        """Scatter a prefilled session into an idle slot (tick thread).

        The prefill frame's audio was already emitted by the admission
        worker; only live sessions with budget remaining reach here."""
        session, frame, state1, max_gen, ms1 = item
        if session.cancelled:
            session.chunks.put(None)
            return
        self._state, self._prev_frame, self._done = self._scatter_slot(
            self._state, state1, frame, jnp.asarray([False]),
            self._prev_frame, self._done, jnp.int32(slot),
        )
        self._mimi_state = self._scatter_mimi(self._mimi_state, ms1, slot)
        self._sessions[slot] = session
        self._budget[slot] = max_gen - 1
        self._temperature[slot] = session.temperature
        self._topk[slot] = session.topk

    def _emit_session(self, session: Session, frames: np.ndarray,
                      pcm: np.ndarray):
        """Shared audio-emission bookkeeping (tick AND admission threads):
        TTFA metric on first audio, frame counters, chunk delivery."""
        if session.first_audio_at is None:
            session.first_audio_at = time.time()
            self.metrics.record("ttfa_s", session.first_audio_at - session.submitted_at)
        with self._lock:
            self._frames_total += frames.shape[0]
        session.frames_out.append(frames)
        session.chunks.put(pcm)

    def _finish_session(self, session: Session):
        """Shared completion bookkeeping: timestamps, metric, terminator."""
        session.finished_at = time.time()
        self.metrics.record("session_s", session.finished_at - session.submitted_at)
        session.chunks.put(None)

    def _emit(self, slot: int, frames: np.ndarray, pcm: np.ndarray):
        """frames: (n, K) codes, pcm: (n*hop,) — both already on host (the
        fused tick program decoded the PCM)."""
        session = self._sessions[slot]
        if session is None or frames.shape[0] == 0:
            return
        self._emit_session(session, frames, pcm)

    def _finish(self, slot: int):
        session = self._sessions[slot]
        if session is not None:
            self._finish_session(session)
        self._sessions[slot] = None
        self._done = self._mark_done(self._done, jnp.int32(slot))
        self._budget[slot] = 0

    def _loop(self):
        gen = self.gen
        while self._running:
            try:
                self._tick(gen)
            except Exception as e:  # never die silently: unblock all sessions
                self._inflight = None
                # slot-attached sessions are genuinely lost: their KV/codec
                # state lived in the (possibly donated-and-consumed) pool
                # buffers.  Host-only cleanup — a dead backend must not
                # kill the recovery path too.
                for slot in range(self.B):
                    s = self._sessions[slot]
                    if s is not None:
                        s.error = e
                        self._finish_session(s)
                        self._sessions[slot] = None
                    self._budget[slot] = 0
                import logging

                logging.getLogger(__name__).exception("serving tick failed")
                # the failed dispatch may have consumed its donated inputs;
                # rebuild the pool state or every later attach would die on
                # deleted buffers.  _pending/_ready sessions survive: their
                # B=1 states are independent of the pool and the admission
                # thread is still healthy — a transient remote-service
                # hiccup (documented: retry) must not 500 the whole backlog
                try:
                    self._reset_pool_state()
                except Exception:
                    # backend is truly gone: now the backlog cannot ever be
                    # served — fail it instead of hanging listeners
                    logging.getLogger(__name__).exception(
                        "pool-state rebuild failed; failing queued sessions"
                    )
                    self._terminate_queued(e)
                time.sleep(0.1)
        # drain the last dispatched tick so final chunks reach listeners
        if self._inflight is not None:
            try:
                self._process(gen, self._inflight)
            except Exception:
                pass
            self._inflight = None

    def _tick(self, gen):
            # attach prefilled sessions to idle slots — an async device
            # scatter chaining onto the LATEST state handles, safe while a
            # dispatched tick is still executing (only freed slots are
            # targets, and slots free during _process, before dispatch)
            for slot in range(self.B):
                if self._sessions[slot] is None and not self._ready.empty():
                    try:
                        item = self._ready.get_nowait()
                    except queue.Empty:
                        break
                    try:
                        self._attach(slot, item)
                    except Exception as e:
                        # the popped session is in neither _sessions nor
                        # _ready, so the _loop recovery can't see it —
                        # terminate it here, then let recovery handle the
                        # rest (a listener would otherwise block forever)
                        s = item[0]
                        s.error = e
                        s.chunks.put(None)
                        raise

            active = [s for s in self._sessions if s is not None]
            if not active:
                if self._inflight is not None:
                    self._process(gen, self._inflight)
                    self._inflight = None
                else:
                    time.sleep(0.005)
                return

            # FIXED tick sizes only ({chunk, 3}): sizing the tick down to
            # the remaining budget (min(chunk, budget.max())) minted a
            # fresh program per residual size (9, 8, …) — each a
            # minutes-long remote compile. Emission already clips to the
            # per-slot budget in _process, so overshoot on the final
            # chunk costs at most chunk-1 frames of throwaway decode.
            n = self._tick_size()
            # ONE fused program (AR decode + batched Mimi for all slots),
            # dispatched BEFORE the previous tick's fetch: the ~30 ms
            # round trip rides under this tick's execution.  Emission
            # bookkeeping (sessions/budgets) is snapshotted at dispatch —
            # a session attached later must not receive this tick's audio.
            (packed, self._prev_frame, self._done, self._state,
             self._mimi_state) = gen._decode_mimi_packed(
                gen._params, gen._mimi_params, self._state, self._mimi_state,
                self._prev_frame, self._done, gen._next_key(), n,
                jnp.asarray(self._temperature), jnp.asarray(self._topk),
            )
            cur = (packed, n, list(self._sessions), self._budget.copy())
            for slot in range(self.B):
                if self._sessions[slot] is not None:
                    self._budget[slot] -= n
            if self._inflight is not None:
                self._process(gen, self._inflight)
            self._inflight = cur

    # attach-priority cap applies only while the admission backlog is at
    # most this deep. Interactive loads (a probe arriving at a busy
    # pool) get 3-frame ticks so the prefill — which queues behind every
    # dispatched tick on the device — lands quickly (measured: full
    # 10-frame ticks ahead of the prefill cost ~180 ms TTFA under load;
    # 3-frame ticks bound the wait at ~2×3 frames of decode). BULK
    # bursts (synthesize_batch, 32 sessions at once) instead kept the
    # pool in 3-frame ticks for the entire run — round-5 trial measured
    # 399 f/s aggregate at B=16 vs ~550+ with full ticks — while their
    # sessions' TTFA is queue-dominated anyway (seconds waiting for a
    # slot; shaving 100 ms off prefill landing is noise), so a deep
    # backlog runs full ticks.
    ATTACH_PRIORITY_MAX_BACKLOG = 4

    def _tick_size(self) -> int:
        """Per-dispatch tick size: {chunk, 3} only (fixed program set)."""
        backlog = (self._pending.qsize() + self._ready.qsize()
                   + self._admitting + self._parked)
        if 0 < backlog <= self.ATTACH_PRIORITY_MAX_BACKLOG:
            return min(self.chunk, 3)
        return self.chunk

    def _process(self, gen, inflight):
            """Fetch + emit one dispatched tick (lag-1 behind dispatch)."""
            packed, n, sessions, budget = inflight
            B, K = self.B, gen._cfg.audio_num_codebooks
            hop = gen._hop
            arr = np.asarray(packed)
            frames_np = arr[: n * B * K].reshape(n, B, K)
            valid_np = arr[n * B * K : n * B * K + n * B].reshape(n, B).astype(bool)
            done_np = arr[n * B * K + n * B : n * B * K + n * B + B].astype(bool)
            pcm_np = arr[n * B * K + n * B + B :].view(np.float32).reshape(B, n * hop)

            for slot in range(self.B):
                session = sessions[slot]
                if session is None or session is not self._sessions[slot]:
                    continue  # freed/replaced since dispatch
                if session.cancelled:
                    self._finish(slot)
                    continue
                # clip to the session's frame budget AT DISPATCH: the tick
                # size is driven by the longest-budget session, and frames
                # computed past a slot's budget must not reach the listener
                take = int(min(budget[slot], n))
                vmask = valid_np[:take, slot]
                n_emit = int(vmask.sum())  # valid frames are a prefix
                self._emit(
                    slot,
                    frames_np[:take, slot][vmask],
                    pcm_np[slot, : n_emit * hop],
                )
                if done_np[slot] or budget[slot] - n <= 0:
                    self._finish(slot)
