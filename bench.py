"""Benchmark: CSM-1B end-to-end RTF on one TPU chip.

Structurally unable to lose its numbers (VERDICT r4 #1): the
accumulating results dict is printed as a full JSON line to stdout
after EVERY section (the driver parses the LAST line that parses), the
drift canaries (link RTT + decode micro) run FIRST so a slow shared-TPU
phase is adjudicable in the same record as the headline, each section
is budget-guarded (skipped sections report the literal string
"skipped" instead of silently truncating the record), and the
cold-start section reuses the flagship weights through
``Generator.clone`` instead of a duplicate ~10-minute build.  The
reference's bench never fails to report (reference gputest.py:30-56 —
warm up, then print); neither does this one.

Final JSON fields (numbers, or "skipped"/"error:..." strings):
  metric/value/unit/vs_baseline   headline RTF, PRODUCT-DEFAULT schedule
  rtf_tuned_schedule              fixed-budget one-dispatch best case
  link_rtt_ms, decode_micro_b2_ms drift canaries (healthy: ~30 / ~6.8-7.4;
                                  RTT >=50 or micro >=8 -> the shared TPU
                                  service is in a slow phase and the
                                  headline is inflated, not a regression)
  int8_weight_snr_min_db          quantizer error over all trunk matrices
  int8_logit_snr_db               teacher-forced c0-logit SNR vs bf16 (the
                                  number that transfers to trained weights;
                                  per-code match goes to stderr only — on
                                  random weights argmax margins are ~0 and
                                  a match-rate JSON key invites misreading,
                                  VERDICT r4 #8)
  ttfa_idle_p50_ms                first-audio latency, idle engine
  agg_frames_per_s_b16            serving throughput config (16 slots)
  ttfa_p50/p95_b16_busy12_ms      TTFA tail at 12 busy slots
  duplex_turn_ttfa_ms             stubbed-STT/LLM voice-turn first audio
  warmup_wall_s                   full offline+stream warmup, warm disk cache
  cold_start_first_ttfa_ms        first request after a fresh-process-like
                                  warmup (clone = empty executable caches)
  bench_prompt_tokens             prompt rows under the pinned REAL-format
                                  tokenizer (sesameai_tts_tpu/assets/ —
                                  no byte-fallback 4x correction any more)
  stall_credit_s                  (only after a TPU-service stall) seconds
                                  the first dispatch hung before
                                  self-recovering, credited back to the
                                  wall budget (capped 900) so a platform
                                  stall phase cannot skip every section

RTF = wall-clock processing seconds per second of audio produced by the
full pipeline (prefill -> AR frame decode -> Mimi decode), flagship
CSM-1B shapes (random weights - identical compute profile to real
ones).  North-star target RTF <= 0.1 (BASELINE.md); vs_baseline < 1
beats it.
"""

import json
import os
import signal
import sys
import time

import numpy as np

T_START = time.time()
# wall budget: the driver's timeout killed round 4's all-or-nothing
# report (rc 124). Sections check the remaining budget and skip with an
# explicit marker instead of running past it.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))

RESULTS = {
    "metric": "rtf_proc_per_audio",
    "value": "skipped",
    "unit": "proc_s/audio_s",
    "vs_baseline": "skipped",
    "rtf_tuned_schedule": "skipped",
    "link_rtt_ms": "skipped",
    "decode_micro_b2_ms": "skipped",
    "int8_weight_snr_min_db": "skipped",
    "int8_logit_snr_db": "skipped",
    "ttfa_idle_p50_ms": "skipped",
    "agg_frames_per_s_b16": "skipped",
    "ttfa_p50_b16_busy12_ms": "skipped",
    "ttfa_p95_b16_busy12_ms": "skipped",
    "duplex_turn_ttfa_ms": "skipped",
    "warmup_wall_s": "skipped",
    "cold_start_first_ttfa_ms": "skipped",
    "bench_prompt_tokens": "skipped",
    "build_s": "skipped",
    "elapsed_s": 0,
}


def flush():
    RESULTS["elapsed_s"] = round(time.time() - T_START, 1)
    print(json.dumps(RESULTS), flush=True)


def remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def credit_stall(stall_s: float, cap_s: float = 900.0):
    """Give back budget consumed by a TPU-service STALL (the first
    dispatch of a process can hang 6-16 min and self-recover — a known
    platform phase, not this program's cost).  Without the credit a
    stall drains the wall budget while nothing runs and EVERY section
    then skips: a complete-looking record with no numbers (seen round
    5).  Running past the budget is safe — the driver's own timeout
    lands a SIGTERM and the handler flushes whatever completed, which
    beats an all-"skipped" rc=0 record.  Capped so a pathological hang
    cannot extend the run unboundedly."""
    global T_START
    credit = min(stall_s, cap_s)
    T_START += credit
    RESULTS["stall_credit_s"] = round(credit, 1)
    print(f"[budget] first-dispatch stall {stall_s:.0f}s — crediting "
          f"{credit:.0f}s back to the wall budget", file=sys.stderr)


def section(name: str, needs_s: float):
    """True if the section may run; otherwise leaves its fields at
    "skipped" and says why on stderr."""
    if remaining() < needs_s:
        print(f"[budget] skipping {name}: {remaining():.0f}s left, "
              f"needs ~{needs_s:.0f}s", file=sys.stderr)
        return False
    print(f"[section] {name} (elapsed {time.time()-T_START:.0f}s)",
          file=sys.stderr)
    return True


def guard(name: str, fn, *fields):
    """Run one section; an exception marks its fields instead of killing
    the run."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — a bench must always report
        print(f"[error] {name}: {e!r}", file=sys.stderr)
        for f in fields:
            if RESULTS.get(f) == "skipped":
                RESULTS[f] = f"error:{type(e).__name__}"
    flush()


# 50 words -> 57 BPE ids (1.14/word) under the PINNED real-format
# tokenizer (assets/bench_tokenizer.json, trained byte-level BPE with
# the Llama-3 specials) — production-like token counts natively, no
# byte-fallback 4x workload correction (VERDICT r4 #4)
TEXT = ("The quick brown fox jumps over the lazy dog while the gentle "
        "river winds through the quiet valley, carrying soft echoes of "
        "distant birdsong past mossy stones, shaded meadows, and tall "
        "pines that sway slowly beneath a warm afternoon sky, inviting "
        "every traveler to pause, breathe deeply, and listen closely.")


def _measure_rtf(gen, label, seconds=10.0, runs=7):
    # warm-up compiles every chunk size the schedule will dispatch
    t0 = time.time()
    audio_w = gen.generate(TEXT, 1, [], max_audio_length_ms=2_000,
                           temperature=0.8, topk=40)
    print(f"[{label}] warmup 2s: {time.time()-t0:.1f}s "
          f"({len(audio_w)//gen._hop} frames)", file=sys.stderr)
    t0 = time.time()
    gen.generate(TEXT, 1, [], max_audio_length_ms=seconds * 1000,
                 temperature=0.8, topk=40)
    print(f"[{label}] warmup {seconds:.0f}s: {time.time()-t0:.1f}s",
          file=sys.stderr)
    rtfs = []
    for i in range(runs):
        t0 = time.time()
        audio = gen.generate(TEXT, 1, [], max_audio_length_ms=seconds * 1000,
                             temperature=0.8, topk=40)
        proc = time.time() - t0
        audio_s = len(audio) / gen.sample_rate
        rtfs.append(proc / audio_s)
        print(f"[{label}] run {i}: {audio_s:.1f}s audio in {proc:.2f}s "
              f"(RTF {proc/audio_s:.4f}, {len(audio)/gen._hop/proc:.1f} frames/s)",
              file=sys.stderr)
    return float(np.median(rtfs))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sesameai_tts_tpu
    from sesameai_tts_tpu.runtime.loader import build_generator, csm_1b_spec

    # a timeout's SIGTERM must still leave a parseable record
    def _term(signum, frame):
        print(f"[signal] {signum} — flushing partial record", file=sys.stderr)
        flush()
        sys.exit(1)

    signal.signal(signal.SIGTERM, _term)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # -- canary 0: link RTT, BEFORE any build (trivial dispatch+fetch) -----
    def s_rtt():
        x = jnp.zeros((8,), jnp.float32)
        t_first = time.perf_counter()
        np.asarray(x + 1.0)  # compile + first fetch
        first_s = time.perf_counter() - t_first
        if first_s > 60.0:  # service stall phase, not a program cost
            credit_stall(first_s)
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            np.asarray(x + float(i))
        rtt_ms = (time.perf_counter() - t0) / reps * 1000.0
        RESULTS["link_rtt_ms"] = round(rtt_ms, 1)
        print(f"link RTT (trivial dispatch+fetch): {rtt_ms:.1f} ms "
              f"(healthy ~30 ms)", file=sys.stderr)

    guard("link_rtt", s_rtt, "link_rtt_ms")

    # -- build the flagship ONCE (int8 serving default) ---------------------
    tok_path = os.path.join(os.path.dirname(sesameai_tts_tpu.__file__),
                            "assets", "bench_tokenizer.json")
    spec = csm_1b_spec(tokenizer=tok_path)
    t0 = time.time()
    gen = build_generator(spec)
    RESULTS["build_s"] = round(time.time() - t0, 1)
    n_tok = len(gen._tokenizer.text_tokenizer.encode("[1]" + TEXT))
    RESULTS["bench_prompt_tokens"] = n_tok
    print(f"build: {RESULTS['build_s']}s (offline base "
          f"{gen._offline_chunk_frames} frames; prompt {n_tok} rows under "
          f"the pinned real-format tokenizer)", file=sys.stderr)
    flush()

    # -- canary 1: batched decode micro (same cached program every round) --
    from sesameai_tts_tpu.models import csm as csm_model

    def s_micro():
        for B in (2, 4):
            st = csm_model.init_state(gen._cfg, B, jnp.bfloat16,
                                      unstacked=gen._unrolled)
            f0 = jnp.zeros((B, gen._cfg.audio_num_codebooks), jnp.int32) + 5
            dn = jnp.zeros((B,), bool)
            outp = gen._decode(gen._params, st, f0, dn, jax.random.PRNGKey(0),
                               25, jnp.float32(0.8), 40)
            _ = np.asarray(outp[0][-1])  # host fetch: block_until_ready does
            st = outp[3]                 # not reliably sync on this platform
            t0 = time.time()
            reps = 3
            for i in range(reps):
                outp = gen._decode(gen._params, st, f0, dn,
                                   jax.random.PRNGKey(i), 25,
                                   jnp.float32(0.8), 40)
                st = outp[3]
            _ = np.asarray(outp[0][-1])
            per_frame = (time.time() - t0) / reps / 25
            if B == 2:
                RESULTS["decode_micro_b2_ms"] = round(per_frame * 1000, 2)
            print(f"batched decode micro B={B} (model-only): "
                  f"{per_frame*1000:.2f} ms/step = {B/per_frame:.0f} "
                  f"frames/s, per-stream RTF {per_frame/0.08:.4f}",
                  file=sys.stderr)

    if section("decode_micro", 120):
        guard("decode_micro", s_micro, "decode_micro_b2_ms")

    # -- headline: PRODUCT-DEFAULT schedule (ramped offline decode) --------
    def s_headline():
        rtf = _measure_rtf(gen, "default")
        RESULTS["value"] = round(rtf, 4)
        RESULTS["vs_baseline"] = round(rtf / 0.1, 3)
        print(f"RTF median (default schedule): {rtf:.4f}", file=sys.stderr)

    guard("headline_rtf", s_headline, "value", "vs_baseline")

    # -- tuned: the 10 s budget in ONE dispatch (fixed-length workloads) ---
    # clone() shares the device weights — no second flagship build
    def s_tuned():
        gen2 = gen.clone(decode_chunk_frames=125, offline_chunk_frames=125)
        RESULTS["rtf_tuned_schedule"] = round(
            _measure_rtf(gen2, "tuned125", runs=5), 4)

    if section("tuned_rtf", 180):
        guard("tuned_rtf", s_tuned, "rtf_tuned_schedule")

    # -- int8 (the serving DEFAULT) quality vs bf16 (runtime/qa.py) --------
    # The same executable gate sesame-tts-smoke enforces on real weights:
    # weight SNR (quantizer error, dense side) + teacher-forced agreement
    # under identical history. The dense twin shares Mimi/tokenizer and
    # re-inits ONLY the CSM params from the loader's exact seed split.
    def s_quant():
        from sesameai_tts_tpu.models.csm import init_csm_params
        from sesameai_tts_tpu.runtime.generator import Generator
        from sesameai_tts_tpu.runtime.qa import quant_acceptance

        k_csm, _ = jax.random.split(jax.random.PRNGKey(spec.seed))
        dense = init_csm_params(k_csm, spec.csm, spec.dtype)
        gen_bf = Generator(dense, gen._cfg, gen._mimi, gen._mimi_params,
                           gen._tokenizer.text_tokenizer,
                           offline_chunk_frames=gen._offline_chunk_frames)
        # single TEXT (bucket 64, same as the headline): on random
        # weights the trajectory runs to the step cap regardless of text
        # length (all-zero EOS frames are ~impossible), so no new prefill
        # bucket is minted here; smoke doubles the text instead because
        # trained weights EOS when the sentence ends
        rep = quant_acceptance(gen, gen_bf, text=TEXT, steps=100)
        RESULTS["int8_weight_snr_min_db"] = rep["weight_snr_min_db"]
        RESULTS["int8_logit_snr_db"] = rep["logit_snr_db"]
        print(f"int8 vs bf16 (runtime/qa.py gate): weight-SNR min "
              f"{rep['weight_snr_min_db']} dB (gate >=35), teacher-forced "
              f"c0-logit SNR {rep['logit_snr_db']} dB (gate >=20) over "
              f"{rep['steps']} steps; per-code match {rep['code_match']} "
              f"(random weights: argmax margins ~0 — informational only; "
              f"self-consistency {rep['self_consistency']}); passed="
              f"{rep['passed']}", file=sys.stderr)
        del gen_bf  # free the dense copy before the serving sections

    if section("int8_qa", 240):
        guard("int8_qa", s_quant, "int8_weight_snr_min_db",
              "int8_logit_snr_db")

    # -- first-audio latency, idle engine ----------------------------------
    def s_ttfa_idle():
        lat = []
        for _ in range(5):
            t0 = time.time()
            stream = gen.generate_stream(TEXT, 1, [], max_audio_length_ms=400,
                                         temperature=0.8, topk=40,
                                         chunk_frames=1,
                                         decode_chunk_frames=10)
            it = iter(stream)
            chunk = next(it)
            assert chunk is not None
            lat.append(time.time() - t0)
            # drain: an abandoned stream leaves its lag-1-dispatched tick
            # running on the device, inflating the NEXT rep ~20-40 ms —
            # "idle engine" means the device is actually idle at t0
            for _ in it:
                pass
        RESULTS["ttfa_idle_p50_ms"] = round(1000 * float(np.median(lat)), 0)
        print(f"first-audio latency p50: {RESULTS['ttfa_idle_p50_ms']:.0f} ms "
              f"(target < 200 ms)", file=sys.stderr)

    if section("ttfa_idle", 90):
        guard("ttfa_idle", s_ttfa_idle, "ttfa_idle_p50_ms")

    from sesameai_tts_tpu.runtime.serving import BatchedTTSServer

    # -- throughput config: B=16 + the TTFA tail at 12 busy ----------------
    # Runs BEFORE the B=4 context section: this one carries JSON fields
    # (agg_frames_per_s_b16, ttfa_p50/p95), the B=4 run is stderr-only —
    # under a squeezed budget the wrong one was getting the slot.
    def s_serve16():
        server16 = BatchedTTSServer(gen, slots=16, chunk_frames=5)
        server16.start()
        try:
            warm = [server16.submit(TEXT, max_audio_length_ms=1_500)
                    for _ in range(2)]
            for s in warm:
                s.audio(timeout=900)

            def run16(n):
                t0 = time.time()
                sessions = [server16.submit(TEXT, max_audio_length_ms=6_000,
                                            temperature=0.8, topk=40)
                            for _ in range(n)]
                audios = [s.audio(timeout=900) for s in sessions]
                wall = time.time() - t0
                total_audio = sum(len(a) for a in audios) / gen.sample_rate
                frames = sum(sum(f.shape[0] for f in s.frames_out)
                             for s in sessions)
                return wall, total_audio, frames

            run16(32)  # warm-up: full-occupancy tick program
            agg = []
            for rep in range(2):
                wall, total_audio, frames = run16(32)
                agg.append(frames / wall)
                print(
                    f"serving throughput (B=16, 32 sessions) rep{rep}: "
                    f"{total_audio:.1f}s audio in {wall:.2f}s = "
                    f"{frames/wall:.0f} frames/s aggregate "
                    f"(aggregate RTF {wall/max(total_audio, 1e-9):.4f})",
                    file=sys.stderr,
                )
            RESULTS["agg_frames_per_s_b16"] = round(float(np.median(agg)), 1)
            flush()

            # TTFA tail at 12 busy slots, >=3 reps (VERDICT r4 #5)
            lat12 = []
            for _ in range(3):
                long12 = [server16.submit(TEXT, max_audio_length_ms=30_000,
                                          temperature=0.8, topk=40)
                          for _ in range(12)]
                time.sleep(1.5)  # pool mid-decode at 12 busy
                for _ in range(8):
                    t0 = time.time()
                    s = server16.submit(TEXT, max_audio_length_ms=400)
                    first = s.chunks.get(timeout=900)
                    lat12.append(time.time() - t0)
                    while first is not None:  # drain to free the slot
                        first = s.chunks.get(timeout=900)
                for s in long12:
                    s.cancel()
                for s in long12:
                    s.audio(timeout=900)
            lat12.sort()
            p50 = 1000 * float(np.median(lat12))
            p95 = 1000 * lat12[max(0, int(round(0.95 * len(lat12))) - 1)]
            RESULTS["ttfa_p50_b16_busy12_ms"] = round(p50, 0)
            RESULTS["ttfa_p95_b16_busy12_ms"] = round(p95, 0)
            print(
                f"TTFA at throughput config (B=16, 12 busy, {len(lat12)} "
                f"probes over 3 reps): p50 {p50:.0f} ms, p95 {p95:.0f} ms, "
                f"max {1000*lat12[-1]:.0f} ms (target p95 <= 2x p50, "
                f"< 400 ms)", file=sys.stderr,
            )
        finally:
            server16.stop()

    if section("serving_b16", 300):
        guard("serving_b16", s_serve16, "agg_frames_per_s_b16",
              "ttfa_p50_b16_busy12_ms", "ttfa_p95_b16_busy12_ms")

    # -- serving: B=4 e2e + slot scaling (stderr context) ------------------
    def s_serve4():
        server = BatchedTTSServer(gen, slots=4, chunk_frames=10)
        server.start()
        try:
            n_sess, sess_ms = 8, 6_000

            def run_batch():
                t0 = time.time()
                sessions = [
                    server.submit(TEXT, max_audio_length_ms=sess_ms,
                                  temperature=0.8, topk=40)
                    for _ in range(n_sess)
                ]
                audios = [s.audio(timeout=900) for s in sessions]
                wall = time.time() - t0
                total_audio = sum(len(a) for a in audios) / gen.sample_rate
                frames = sum(sum(f.shape[0] for f in s.frames_out)
                             for s in sessions)
                return wall, total_audio, frames

            run_batch()  # warm-up: compiles scatter/decode/Mimi programs
            wall, total_audio, frames = run_batch()
            print(
                f"serving e2e (B=4 slots, {n_sess} sessions): "
                f"{total_audio:.1f}s audio in {wall:.2f}s = {frames/wall:.0f} "
                f"frames/s aggregate, aggregate RTF "
                f"{wall/max(total_audio, 1e-9):.4f} (incl. Mimi + scheduler)",
                file=sys.stderr,
            )
        finally:
            server.stop()

    # -- duplex voice loop: per-turn time-to-first-audio --------------------
    # STT/LLM stubbed (zero-latency): the metric isolates what THIS
    # framework adds to a voice turn (context append + tokenize + rolling
    # prefill + first frame + 1-frame Mimi). Reference prints TTFS/TTFF
    # per turn (reference ogwebapp.py:106-120). Target < 500 ms/turn.
    def s_duplex():
        from sesameai_tts_tpu.apps.duplex import DuplexVoiceApp

        class _StubLLM:
            class _Hist:
                def clear_history(self):
                    pass

            history_manager = _Hist()

            def query(self, text, stream=True):
                reply = ("Here is a quick answer for you. "
                         "The fox settled down by the river.")
                for i in range(0, len(reply), 7):
                    yield reply[i : i + 7]

        # rolling dialogs cross new prefill/encode buckets nearly every
        # turn — unwarmed each is a minutes-long remote compile (round 4
        # measured 48 s/turn). Same warmup a duplex deployment runs.
        t0 = time.time()
        wt = gen.warmup(offline=False, encode_buckets=(16, 32, 64))
        print(f"duplex warmup: {len(wt)} programs in {time.time()-t0:.1f}s",
              file=sys.stderr)

        app = DuplexVoiceApp(gen, stt=lambda a, r: "Tell me about the fox.",
                             llm=_StubLLM(), max_sentence_ms=4_000)
        user_pcm = np.zeros(24_000, np.float32)
        turn_ttfa = []
        for _ in range(4):
            t0 = time.time()
            it = app.respond(user_pcm, 24_000)
            try:
                next(it)
                turn_ttfa.append(time.time() - t0)
                for _ in it:  # finish the turn (context recycles)
                    pass
            except StopIteration:
                pass
        # turn 0 pays fresh prefill-bucket crossings as the dialog grows;
        # steady state is the median of the warm turns
        duplex_ms = 1000 * float(np.median(turn_ttfa[1:]))
        RESULTS["duplex_turn_ttfa_ms"] = round(duplex_ms, 0)
        print(f"duplex turn TTFA (stubbed STT/LLM, 4 turns, rolling "
              f"context): first {1000*turn_ttfa[0]:.0f} ms, warm median "
              f"{duplex_ms:.0f} ms (target < 500 ms)", file=sys.stderr)

    # -- cold start: fresh executable caches -> warmup -> FIRST request ----
    # clone() = same weights, EMPTY jit executable caches — exactly a
    # restarted server's state (it repopulates from the persistent disk
    # cache during warmup, like `sesame-tts-serve --warmup` /
    # `sesame-tts-prewarm`). No duplicate flagship build (VERDICT r4 #1c).
    def s_cold():
        gen_cold = gen.clone()
        t0 = time.time()
        wt_cold = gen_cold.warmup(offline=True)
        RESULTS["warmup_wall_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        first = next(iter(gen_cold.generate_stream(
            TEXT, 1, [], max_audio_length_ms=400, temperature=0.8, topk=40,
            chunk_frames=1)))
        assert first is not None
        RESULTS["cold_start_first_ttfa_ms"] = round(
            1000 * (time.time() - t0), 0)
        print(f"cold start (clone: fresh executable caches): warmup "
              f"({len(wt_cold)} programs) {RESULTS['warmup_wall_s']}s -> "
              f"first-request TTFA {RESULTS['cold_start_first_ttfa_ms']:.0f} "
              f"ms (must ~= warm p50, no >1 s outlier)", file=sys.stderr)

    # cold_start runs BEFORE duplex: it carries two JSON fields to
    # duplex's one, and its warmup repopulates from the persistent disk
    # cache at a predictable ~250 s, while duplex's encode-bucket warmup
    # is exposed to remote-compile variance (measured 730 s in one slow
    # phase — it starved this section of both its fields)
    if section("cold_start", 180):
        guard("cold_start", s_cold, "warmup_wall_s",
              "cold_start_first_ttfa_ms")

    if section("duplex", 300):
        guard("duplex", s_duplex, "duplex_turn_ttfa_ms")

    # stderr-context sections last: they carry no JSON fields, so under a
    # squeezed budget they are the right ones to lose
    if section("serving_b4", 240):
        guard("serving_b4", s_serve4)

    # -- gputest parity: generate_frame on a 512-row prefill (stderr) ------
    def s_gputest():
        cfg = gen._cfg
        K = cfg.audio_num_codebooks
        tokens = jnp.zeros((1, 512, K + 1), jnp.int32)
        mask = jnp.zeros((1, 512, K + 1), bool).at[:, :, K].set(True)
        state0 = csm_model.init_state(cfg, 1, jnp.bfloat16,
                                      unstacked=gen._unrolled)
        frame, _ = gen._prefill(gen._prefill_params, state0, tokens, mask,
                                jnp.array([512], jnp.int32),
                                jax.random.PRNGKey(0), jnp.float32(0.8), 40)
        _ = np.asarray(frame[0, 0])
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            frame, _ = gen._prefill(gen._prefill_params, state0, tokens,
                                    mask, jnp.array([512], jnp.int32),
                                    jax.random.PRNGKey(0), jnp.float32(0.8),
                                    40)
        _ = np.asarray(frame[0, 0])
        per = (time.time() - t0) / iters
        print(f"generate_frame(512-prefill): {per*1000:.1f} ms "
              f"({1/per:.1f} it/s)", file=sys.stderr)

    if section("gputest_parity", 60):
        guard("gputest_parity", s_gputest)

    flush()


if __name__ == "__main__":
    main()
