"""Batched serving engine: concurrent sessions share one batched decode
(BASELINE config 5 — the reference has no equivalent)."""

import numpy as np
import pytest

from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec as tiny_spec
from sesameai_tts_tpu.runtime.serving import BatchedTTSServer


@pytest.fixture(scope="module")
def server():
    gen = build_generator(tiny_spec(), decode_chunk_frames=4)
    srv = BatchedTTSServer(gen, slots=2, chunk_frames=4)
    srv.start()
    yield srv
    srv.stop()


def test_chunk_frames_clamped_to_codec_ring(server):
    """A tick size beyond the codec streaming ring's slack must clamp at
    construction (codec/transformer.py would assert on the first tick)."""
    cap = server.gen._mimi.max_stream_chunk_frames
    srv = BatchedTTSServer(server.gen, slots=2, chunk_frames=cap + 99)
    assert srv.chunk == cap  # never started; no device programs minted


def test_concurrent_sessions_complete(server):
    hop = server.gen._mimi.cfg.hop_length
    sessions = [
        server.submit(f"session number {i} speaking", speaker=i % 2,
                      max_audio_length_ms=480, temperature=0.8, topk=5)
        for i in range(3)  # 3 sessions > 2 slots → queueing exercised
    ]
    for s in sessions:
        audio = s.audio(timeout=300)
        assert audio.dtype == np.float32
        assert audio.shape[0] % hop == 0
        total_frames = sum(f.shape[0] for f in s.frames_out)
        assert audio.shape[0] == total_frames * hop


def test_warmup_covers_serve_program_set(server):
    """warmup() touches every live-triggerable program class and leaves a
    running pool fully functional (throwaway buffers only — VERDICT r3 #1:
    first-use compiles must never land on live requests)."""
    times = server.warmup()
    names = set(times)
    assert "first_chunk" in names
    assert {"scatter_slot", "scatter_mimi", "mark_done"} <= names
    # every prefill bucket that fits the tiny KV cache (256) is compiled
    buckets = {b for b in server.gen._prefill_buckets
               if b <= server.gen.max_seq_len}
    assert {f"prefill_{b}" for b in buckets} <= names
    assert {f"extend_{b}" for b in buckets} <= names
    # both scheduler tick sizes at the pool batch
    assert {f"serve_tick_b{server.B}_n{n}"
            for n in {server.chunk, 3}} <= names
    assert all(v >= 0 for v in times.values())
    # the pool still serves correctly after warmup
    s = server.submit("after warmup", max_audio_length_ms=400, topk=5)
    audio = s.audio(timeout=300)
    assert audio.dtype == np.float32


def test_tick_failure_recovery_rebuilds_pool(server):
    """One transient tick failure must not kill the backlog: slot-attached
    sessions error out, the pool device state is rebuilt, and subsequent
    sessions serve normally (regression: a consumed donated state used to
    poison every later attach)."""
    gen = server.gen
    real = gen._decode_mimi_packed
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected transient backend failure")
        return real(*a, **k)

    gen._decode_mimi_packed = flaky
    try:
        bad = server.submit("dies in the first tick", max_audio_length_ms=2000,
                            temperature=0.8, topk=5)
        with pytest.raises(RuntimeError, match="injected"):
            bad.audio(timeout=120)
    finally:
        gen._decode_mimi_packed = real
    # the engine recovered: a fresh session completes end-to-end
    ok = server.submit("recovers after the failure", max_audio_length_ms=480,
                       temperature=0.8, topk=5)
    audio = ok.audio(timeout=300)
    assert audio.dtype == np.float32


def test_submit_requires_running_server():
    """submit() on a stopped server raises instead of queueing a session
    no thread will ever terminate (listener would block forever)."""
    from sesameai_tts_tpu.runtime.loader import build_generator
    from sesameai_tts_tpu.runtime.loader import test_tiny_spec as _tiny

    gen = build_generator(_tiny(), decode_chunk_frames=4)
    srv = BatchedTTSServer(gen, slots=1, chunk_frames=4)
    with pytest.raises(RuntimeError, match="not running"):
        srv.submit("never served")
    srv.start()
    s = srv.submit("short", max_audio_length_ms=480, temperature=0.8, topk=5)
    assert s.audio(timeout=300).ndim == 1
    srv.stop()
    with pytest.raises(RuntimeError, match="not running"):
        srv.submit("after stop")


def test_next_bucket_room_quantized():
    """Room-clamped prefill sizes quantize to 64-multiples: the exact
    remaining room would mint a fresh shape (a minutes-long remote
    compile) per cached-context length."""
    from sesameai_tts_tpu.runtime.generator import _next_bucket

    buckets = [64, 128, 256, 512]
    assert _next_bucket(80, buckets) == 128
    assert _next_bucket(80, buckets, room=512) == 128  # bucket fits room
    assert _next_bucket(80, buckets, room=130) == 128  # bucket fits room
    # bucket 256 spills a 200-row room → largest 64-multiple ≥ n: 192
    assert _next_bucket(129, buckets, room=200) == 192
    # 64-multiple (64) < n → exact room as the last resort
    assert _next_bucket(80, buckets, room=98) == 98
    assert _next_bucket(80, buckets, room=127) == 127


def test_synthesize_batch_order_and_errors(server):
    """synthesize_batch returns PCM in input order, and an over-long
    text raises only after the healthy utterances were collected."""
    hop = server.gen._mimi.cfg.hop_length
    out = server.synthesize_batch(
        ["first utterance", "second one", "third here"],
        max_audio_length_ms=480, temperature=0.8, topk=5,
    )
    assert len(out) == 3
    for audio in out:
        assert audio.dtype == np.float32 and audio.shape[0] % hop == 0
    with pytest.raises(ValueError, match="Inputs too long"):
        server.synthesize_batch(
            ["ok short text", "x " * 3000], max_audio_length_ms=480,
            temperature=0.8, topk=5,
        )


def test_session_error_propagates(server):
    s = server.submit("x " * 3000, max_audio_length_ms=480)  # too long
    with pytest.raises(ValueError, match="Inputs too long"):
        s.audio(timeout=120)


def test_session_cancel_frees_slot(server):
    """cancel() stops generation; the slot then serves the next session."""
    long = server.submit("a very long narration request", speaker=1,
                         max_audio_length_ms=30_000, temperature=0.8, topk=5)
    # let it start producing, then cancel mid-flight
    first = long.chunks.get(timeout=300)
    assert first is not None
    long.cancel()
    rest = long.audio(timeout=300)  # drains until the terminating None
    # far fewer frames than the 375-frame budget → it really stopped
    assert sum(f.shape[0] for f in long.frames_out) < 100

    after = server.submit("short one after cancel", max_audio_length_ms=480,
                          temperature=0.8, topk=5)
    assert after.audio(timeout=300).ndim == 1


def test_session_cached_context(server):
    """A precomputed voice-prefix KV handle skips context re-prefill and
    produces the same frames as passing the raw context segments."""
    import jax
    import numpy as np
    from sesameai_tts_tpu.runtime.frames import Segment

    gen = server.gen
    hop = gen._mimi.cfg.hop_length
    rng = np.random.default_rng(0)
    seg = Segment(speaker=1, text="voice clip",
                  audio=(rng.normal(size=2 * hop) * 0.1).astype(np.float32))
    cached = gen.precompute_context_state([seg])

    kw = dict(speaker=1, max_audio_length_ms=480, temperature=0.8, topk=5)
    s_raw = server.submit("cached context check", context=[seg], **kw)
    a_raw = s_raw.audio(timeout=300)
    s_c = server.submit("cached context check", cached_context=cached, **kw)
    a_c = s_c.audio(timeout=300)
    # same context → same KV prefix; sampling keys differ, so only assert
    # both produced audio and the cached path used the shorter prefill
    assert a_raw.ndim == 1 and a_c.ndim == 1 and len(a_c) > 0


def test_serving_soak_mixed_workload(server):
    """Stress the pipelined scheduler: a burst of mixed-length sessions
    with random cancels and per-session sampling params; every session
    must terminate, and delivered PCM must equal the offline decode of
    its own delivered frames (the lag-1 tick bookkeeping invariant)."""
    import random

    gen = server.gen
    hop = gen._mimi.cfg.hop_length
    rng = random.Random(7)
    sessions = []
    for i in range(12):
        s = server.submit(
            f"soak session number {i}",
            speaker=i % 2,
            max_audio_length_ms=rng.choice([160, 480, 960, 2000]),
            temperature=0.7 + 0.1 * (i % 3),
            topk=3 + (i % 4),
        )
        sessions.append(s)
        if i % 4 == 1:
            s.cancel()  # some cancel immediately (possibly still pending)

    # cancel one mid-flight (after its first chunk arrives)
    victim = sessions[6]
    chunks6 = [victim.chunks.get(timeout=300)]
    victim.cancel()
    while chunks6[-1] is not None:
        chunks6.append(victim.chunks.get(timeout=300))
    got = [c for c in chunks6 if c is not None]
    victim_audio = (
        np.concatenate(got) if got else np.zeros((0,), np.float32)
    )

    for i, s in enumerate(sessions):
        if s is victim:
            audio = victim_audio
        else:
            audio = s.audio(timeout=300)
        frames = (
            np.concatenate(s.frames_out)
            if s.frames_out
            else np.zeros((0, server.gen._cfg.audio_num_codebooks), np.int32)
        )
        assert audio.shape[0] == frames.shape[0] * hop, f"session {i}"
        if frames.shape[0]:
            ref = gen.decode_audio(frames)
            assert np.abs(audio - ref).max() < 2e-4, f"session {i} PCM"


def test_one_frame_session_completes_at_admission(server):
    """A 1-frame budget (or prefill-EOS) session finishes on the
    admission thread without occupying a slot: audio arrives, finished_at
    and the TTFA/session metrics are recorded."""
    hop = server.gen._mimi.cfg.hop_length
    s = server.submit("tiny", max_audio_length_ms=80, topk=5)  # max_gen = 1
    audio = s.audio(timeout=300)
    assert audio.shape[0] in (0, hop)  # prefill frame only (or EOS)
    assert s.finished_at is not None and s.finished_at >= s.submitted_at
    m = server.metrics_summary()
    assert m["series"]["session_s"]["count"] >= 1
    assert m["sessions_total"] >= 1


def test_blocked_dispatch_does_not_delay_completion(server):
    """Dispatch and completion run on SEPARATE threads: a dispatch that
    blocks (a first-use prefill bucket is a minutes-long remote compile
    on the target platform) must not delay delivering a first chunk the
    device already finished for the previous session."""
    import threading
    import time as _time

    gate = threading.Event()
    calls = []
    orig = server._dispatch_admission

    def gated(session):
        calls.append(session)
        if len(calls) == 2:  # second dispatch stalls like a slow compile
            gate.wait(timeout=60)
        return orig(session)

    server._dispatch_admission = gated
    try:
        a = server.submit("first session", max_audio_length_ms=480,
                          temperature=0.8, topk=5)
        b = server.submit("second session", max_audio_length_ms=480,
                          temperature=0.8, topk=5)
        deadline = _time.monotonic() + 120
        while a.first_audio_at is None and _time.monotonic() < deadline:
            _time.sleep(0.01)
        # A's first audio arrived while B's dispatch is still blocked
        assert a.first_audio_at is not None
        assert not gate.is_set()
    finally:
        gate.set()
        server._dispatch_admission = orig
    assert a.audio(timeout=300).dtype == np.float32
    assert b.audio(timeout=300).dtype == np.float32


def test_admission_error_between_healthy_sessions(server):
    """A dispatch failure mid-pipeline must not strand the in-flight
    healthy admission on either side (the admission loop pipelines:
    session N+1 dispatches before session N's first chunk is fetched)."""
    a = server.submit("healthy utterance one", max_audio_length_ms=480,
                      temperature=0.8, topk=5)
    bad = server.submit("x " * 3000, max_audio_length_ms=480)
    b = server.submit("healthy utterance two", max_audio_length_ms=480,
                      temperature=0.8, topk=5)
    audio_a = a.audio(timeout=300)
    audio_b = b.audio(timeout=300)
    assert audio_a.dtype == np.float32 and audio_b.dtype == np.float32
    with pytest.raises(ValueError, match="Inputs too long"):
        bad.audio(timeout=120)


def test_submit_wait_parks_on_cv_and_unblocks(server):
    """submit(wait=True) against a full backlog PARKS on the condition
    variable (no busy-poll — this is a 1-CPU host, VERDICT r4 #7) and
    wakes promptly when the backlog drains or stop() broadcasts."""
    import threading
    import time as _time

    gen = server.gen
    srv = BatchedTTSServer(gen, slots=1, chunk_frames=4, max_pending=1)
    gate = threading.Event()
    orig = srv._dispatch_admission

    def gated(session):
        gate.wait(30)
        return orig(session)

    srv._dispatch_admission = gated
    srv.start()
    try:
        srv.submit("held by the gate", max_audio_length_ms=160)
        # wait for the dispatch worker to pick it up, then fill the
        # 1-deep backlog (wait=False so saturation is observable)
        deadline = _time.time() + 30
        filled = False
        while _time.time() < deadline and not filled:
            try:
                srv.submit("fills the backlog", wait=False,
                           max_audio_length_ms=160)
                filled = True
            except Exception:
                _time.sleep(0.02)
        assert filled
        result = {}

        def blocked():
            try:
                result["s"] = srv.submit("parked", max_audio_length_ms=160)
            except RuntimeError as e:
                result["e"] = e

        t = threading.Thread(target=blocked, daemon=True)
        t.start()
        _time.sleep(0.4)
        # full backlog: the submitter is parked, not raising, not spinning
        assert t.is_alive() and not result
    finally:
        gate.set()  # let the gated admission finish so stop() can join
        srv.stop()
    t.join(10)
    assert not t.is_alive()
    # woke to either a drained backlog (session accepted) or the stop
    # broadcast (RuntimeError) — both are correct unpark paths
    assert "s" in result or isinstance(result.get("e"), RuntimeError)


def test_tick_size_backlog_aware(server):
    """Attach-priority 3-frame ticks apply to SHALLOW admission backlogs
    (interactive probes: the prefill queues behind dispatched ticks, so
    small ticks bound its wait) but NOT to deep bulk bursts, whose
    sessions are queue-dominated — capping every tick there traded ~30%
    aggregate throughput for nothing (round-5 trial: 399 vs ~550+ f/s
    at B=16)."""
    srv = BatchedTTSServer(server.gen, slots=2, chunk_frames=10)
    assert srv._tick_size() == 10            # idle: full ticks
    srv._admitting = 1
    assert srv._tick_size() == 3             # interactive: cap
    srv._admitting = 0
    # _pending entries are (priority, seq, session) heap items
    for i in range(srv.ATTACH_PRIORITY_MAX_BACKLOG):
        srv._pending.put_nowait((1, i, None))
    assert srv._tick_size() == 3             # at the threshold: still cap
    srv._pending.put_nowait((1, 99, None))
    assert srv._tick_size() == 10            # deep bulk burst: full ticks
    while not srv._pending.empty():
        srv._pending.get_nowait()
    assert srv._tick_size() == 10
    # submit(wait=True) callers parked on the backlog CV are part of the
    # real backlog even though _pending.qsize() is pinned by max_pending
    # — without counting them, a bulk burst against a small max_pending
    # reads as shallow and runs permanently capped ticks
    srv._pending.put_nowait((1, 100, None))
    srv._parked = srv.ATTACH_PRIORITY_MAX_BACKLOG
    assert srv._tick_size() == 10            # 1 queued + 4 parked = deep
    srv._parked = 0


def test_interactive_priority_admission(server):
    """A short (interactive-class) request submitted behind a bulk burst
    admits BEFORE the queued bulk sessions (priority-then-FIFO): each
    admission costs ~100 ms wall on TPU, so FIFO put an interactive
    request's TTFA at ~100 ms x queued-bulk-jobs (measured p95 ~400-1000
    ms behind a 12-long burst at B=16)."""
    import threading

    srv = BatchedTTSServer(server.gen, slots=1, chunk_frames=4)
    order = []
    entered = threading.Event()
    release = threading.Event()
    orig = srv._dispatch_admission

    def gated(session):
        order.append(session)
        entered.set()
        release.wait(60)
        return orig(session)

    srv._dispatch_admission = gated
    srv.start()
    try:
        first = srv.submit("holds the admission worker",
                           max_audio_length_ms=4_160)
        assert entered.wait(30)  # dispatch worker is inside gated(first)
        bulk = [srv.submit(f"bulk job {i}", max_audio_length_ms=4_160)
                for i in range(3)]
        quick = srv.submit("quick one", max_audio_length_ms=400)
        release.set()
        for s in (first, *bulk, quick):  # all complete despite reordering
            s.audio(timeout=300)
    finally:
        release.set()
        srv.stop()
    assert order[0] is first      # already in flight when the burst came
    assert order[1] is quick      # jumped every queued bulk admission
    assert order[2:] == bulk      # FIFO within the bulk class


def test_explicit_priority_overrides_derivation(server):
    """Session.priority overrides the max_audio_length_ms derivation:
    a long job marked priority 0 admits ahead of queued derived-bulk
    jobs (the HTTP "priority" knob rides this)."""
    import threading

    srv = BatchedTTSServer(server.gen, slots=1, chunk_frames=4)
    order = []
    entered = threading.Event()
    release = threading.Event()
    orig = srv._dispatch_admission

    def gated(session):
        order.append(session)
        entered.set()
        release.wait(60)
        return orig(session)

    srv._dispatch_admission = gated
    srv.start()
    try:
        first = srv.submit("holds the admission worker",
                           max_audio_length_ms=4_160)
        assert entered.wait(30)
        slow = srv.submit("derived bulk", max_audio_length_ms=4_160)
        vip = srv.submit("long but marked interactive",
                         max_audio_length_ms=4_160, priority=0)
        release.set()
        for s in (first, slow, vip):
            s.audio(timeout=300)
    finally:
        release.set()
        srv.stop()
    assert order == [first, vip, slow]
