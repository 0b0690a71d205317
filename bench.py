"""Benchmark: CSM-1B end-to-end RTF on one TPU chip.

Prints ONE JSON line:
  {"metric": "rtf_proc_per_audio", "value": RTF, "unit": "proc_s/audio_s",
   "vs_baseline": RTF/0.1, "rtf_tuned_schedule": RTF_tuned,
   "agg_frames_per_s_b16": frames_per_s,
   "ttfa_p50_b16_busy12_ms": ms, "ttfa_p95_b16_busy12_ms": ms,
   "int8_greedy_match_rate": rate, "duplex_turn_ttfa_ms": ms,
   "decode_micro_b2_ms": ms}

RTF = wall-clock processing seconds per second of audio produced by the
full pipeline (prefill → AR frame decode → Mimi decode), flagship
CSM-1B shapes (random weights — identical compute profile to real
ones).  The HEADLINE value runs the PRODUCT-DEFAULT dispatch schedule
(ramped decode chunks, unknown-length/EOS-early ready) — what a user's
`generate()` call actually executes.  `rtf_tuned_schedule` is the
fixed-budget best case (decode_chunk_frames=125: the 10 s utterance in
one dispatch).  North-star target is RTF ≤ 0.1 (BASELINE.md);
vs_baseline < 1 beats the target.  Secondary metrics go to stderr.

The reference publishes no numbers (BASELINE.md); its measurement
machinery is per-sentence RTF prints (reference tts_service.py:390-397)
and a (1,512,33)-prefill frame-latency microbench (reference
gputest.py:30-56) — both reproduced here.
"""

import json
import sys
import time

import numpy as np


def _measure_rtf(gen, text, label, seconds=10.0, runs=7):
    # warm-up compiles every chunk size the schedule will dispatch
    t0 = time.time()
    audio_w = gen.generate(text, 1, [], max_audio_length_ms=2_000,
                           temperature=0.8, topk=40)
    print(f"[{label}] warmup 2s: {time.time()-t0:.1f}s "
          f"({len(audio_w)//gen._hop} frames)", file=sys.stderr)
    t0 = time.time()
    gen.generate(text, 1, [], max_audio_length_ms=seconds * 1000,
                 temperature=0.8, topk=40)
    print(f"[{label}] warmup {seconds:.0f}s: {time.time()-t0:.1f}s",
          file=sys.stderr)
    rtfs = []
    for i in range(runs):
        t0 = time.time()
        audio = gen.generate(text, 1, [], max_audio_length_ms=seconds * 1000,
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

    from sesameai_tts_tpu.runtime.loader import build_generator, csm_1b_spec

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # Prompt sized to a REPRESENTATIVE token count: no Llama tokenizer.json
    # exists in this environment, so the byte fallback tokenizer is in use
    # — it emits ~4 ids per word where Llama-3 BPE emits ~1.3, inflating
    # prefill 4x. This sentence byte-tokenizes to ~56 rows, matching what
    # the real tokenizer produces for a typical 40-word TTS sentence.
    text = "The quick brown fox jumps over the lazy valley dog."

    # -- headline: PRODUCT-DEFAULT schedule (offline ramp 25→50→100…) ------
    t0 = time.time()
    gen = build_generator(csm_1b_spec())
    print(f"build: {time.time()-t0:.1f}s (adaptive offline base "
          f"{gen._offline_chunk_frames} frames)", file=sys.stderr)
    rtf = _measure_rtf(gen, text, "default")

    # -- tuned: the 10 s budget in ONE dispatch (fixed-length workloads) ---
    gen2 = build_generator(csm_1b_spec(), decode_chunk_frames=125)
    rtf_tuned = _measure_rtf(gen2, text, "tuned125", runs=5)
    print(f"RTF median: default-schedule {rtf:.4f}, tuned {rtf_tuned:.4f}",
          file=sys.stderr)

    # -- int8 (the serving DEFAULT) quality vs bf16 (VERDICT r3 #4) --------
    # Same seed → identical master weights; greedy (topk=1) is
    # PRNG-key-invariant, so any frame mismatch is quantization error
    # crossing an argmax boundary. Flip-the-default-back threshold
    # (PARITY.md): weight-SNR < 35 dB on any trunk matrix, or greedy
    # streams diverging before frame 25 (2 s).
    from sesameai_tts_tpu.ops.quant import _TRUNK_QUANT_KEYS, quantize_weight

    gen_bf16 = build_generator(csm_1b_spec(quantize=None))

    def _leaf_snr(w):
        # the serving quantizer itself (per-output-channel symmetric
        # int8); handles stacked (L, in, out) leaves via leading dims
        qw = quantize_weight(w)
        deq = qw["q"].astype(jnp.float32) * qw["scale"][..., None, :]
        wf = w.astype(jnp.float32)
        err = deq - wf
        return 10.0 * jnp.log10(jnp.sum(wf * wf)
                                / jnp.maximum(jnp.sum(err * err), 1e-20))

    snr_jit = jax.jit(_leaf_snr)
    snrs = []
    for trunk in ("backbone", "decoder"):
        layers = gen_bf16._params[trunk]["layers"]
        per_layer = layers if isinstance(layers, (list, tuple)) else [layers]
        for wl in per_layer:
            for k in _TRUNK_QUANT_KEYS:
                if k in wl:
                    snrs.append(float(snr_jit(wl[k])))
    print(f"int8 weight-SNR over {len(snrs)} trunk matrices: "
          f"min {min(snrs):.1f} dB, median {float(np.median(snrs)):.1f} dB "
          f"(flip-to-bf16 gate: 35 dB)", file=sys.stderr)

    f_i8 = gen.generate_frames(text, 1, [], max_audio_length_ms=10_000,
                               temperature=1.0, topk=1, seed=0)
    f_bf = gen_bf16.generate_frames(text, 1, [], max_audio_length_ms=10_000,
                                    temperature=1.0, topk=1, seed=0)
    nmatch = min(len(f_i8), len(f_bf))
    frame_eq = (f_i8[:nmatch] == f_bf[:nmatch]).all(axis=1)
    int8_match = float(frame_eq.mean()) if nmatch else 0.0
    first_div = int(np.argmin(frame_eq)) if not frame_eq.all() else nmatch
    print(f"int8 vs bf16 greedy ({len(f_i8)}/{len(f_bf)} frames): "
          f"match rate {int8_match:.3f}, first divergence at frame "
          f"{first_div} (free-running: one flip cascades — divergence "
          f"< 25 would flip the default)", file=sys.stderr)
    del gen_bf16  # free the dense copy before the serving sections

    # -- first-audio latency (prefill + 1 frame + 1-frame Mimi stream) ----
    lat = []
    for i in range(5):
        t0 = time.time()
        stream = gen.generate_stream(text, 1, [], max_audio_length_ms=400,
                                     temperature=0.8, topk=40, chunk_frames=1,
                                     decode_chunk_frames=10)
        chunk = next(iter(stream))
        lat.append(time.time() - t0)
    print(f"first-audio latency p50: {1000*float(np.median(lat)):.0f} ms "
          f"(target < 200 ms)", file=sys.stderr)

    # -- end-to-end batched serving: sessions in → PCM out ------------------
    # (the honest aggregate: includes scheduler ticks, Mimi streaming
    # decode and per-slot emission — not just the raw decode scan)
    from sesameai_tts_tpu.runtime.serving import BatchedTTSServer

    server = BatchedTTSServer(gen, slots=4, chunk_frames=10)
    server.start()
    try:
        n_sess, sess_ms = 8, 6_000

        def run_batch():
            t0 = time.time()
            sessions = [
                server.submit(text, max_audio_length_ms=sess_ms,
                              temperature=0.8, topk=40)
                for _ in range(n_sess)
            ]
            audios = [s.audio(timeout=900) for s in sessions]
            wall = time.time() - t0
            total_audio = sum(len(a) for a in audios) / gen.sample_rate
            frames = sum(sum(f.shape[0] for f in s.frames_out) for s in sessions)
            return wall, total_audio, frames

        run_batch()  # warm-up: compiles scatter/decode/Mimi-chunk programs
        wall, total_audio, frames = run_batch()
        print(
            f"serving e2e (B=4 slots, {n_sess} sessions): {total_audio:.1f}s "
            f"audio in {wall:.2f}s = {frames/wall:.0f} frames/s aggregate, "
            f"aggregate RTF {wall/max(total_audio, 1e-9):.4f} "
            f"(incl. Mimi + scheduler)",
            file=sys.stderr,
        )
    finally:
        server.stop()

    # -- slot scaling: per-stream RTF, then TTFA, at 1/3/7 busy slots ------
    server8 = BatchedTTSServer(gen, slots=8, chunk_frames=10)
    server8.start()
    try:
        # warm-up: compile the B=8 scatter/tick programs (full AND the
        # 3-frame attach-priority tick — submitting 2 at once triggers it)
        warm = [server8.submit(text, max_audio_length_ms=1_500) for _ in range(2)]
        for s in warm:
            s.audio(timeout=900)
        for busy in (1, 3, 7):
            # phase 1 — per-stream RTF at steady occupancy `busy`, no
            # probes running: engine-side timestamps avoid drain-order bias
            batch = [server8.submit(text, max_audio_length_ms=8_000,
                                    temperature=0.8, topk=40)
                     for _ in range(busy)]
            audios = [s.audio(timeout=900) for s in batch]
            stream_rtf = [
                (s.finished_at - s.submitted_at) / (len(a) / gen.sample_rate)
                for s, a in zip(batch, audios)
            ]
            # phase 2 — TTFA while `busy` long sessions decode
            long_sess = [
                server8.submit(text, max_audio_length_ms=20_000,
                               temperature=0.8, topk=40)
                for _ in range(busy)
            ]
            time.sleep(1.0)  # ensure the pool is mid-decode
            lat_busy = []
            for _ in range(5):
                t0 = time.time()
                s = server8.submit(text, max_audio_length_ms=400)
                first = s.chunks.get(timeout=900)
                lat_busy.append(time.time() - t0)
                while first is not None:  # drain to free the slot
                    first = s.chunks.get(timeout=900)
            for s in long_sess:  # cancel: next tick frees the slots
                s.cancel()
            for s in long_sess:
                s.audio(timeout=900)
            lat_busy.sort()
            print(
                f"{busy} busy slots: per-stream RTF "
                f"{float(np.median(stream_rtf)):.4f}; TTFA under load "
                f"p50 {1000*float(np.median(lat_busy)):.0f} ms, "
                f"p95 {1000*lat_busy[-1]:.0f} ms",
                file=sys.stderr,
            )
    finally:
        server8.stop()

    # -- throughput config: B=16 saturates the chip ------------------------
    # (measured slot scaling, same session: B=8 208 f/s → B=16 400 f/s
    # (1.9×) → B=32 373 f/s with per-stream RTF ≥ 1 (falls behind
    # realtime). 16 slots is the production throughput config; the
    # latency config stays 4-8. 5-frame ticks are the serve CLI's
    # auto-default above 8 slots — measured better on BOTH axes at 16
    # slots since admissions pipeline (588 vs 537 f/s; docs/SERVING.md).)
    server16 = BatchedTTSServer(gen, slots=16, chunk_frames=5)
    server16.start()
    try:
        warm = [server16.submit(text, max_audio_length_ms=1_500) for _ in range(2)]
        for s in warm:
            s.audio(timeout=900)

        def run16(n):
            t0 = time.time()
            sessions = [server16.submit(text, max_audio_length_ms=6_000,
                                        temperature=0.8, topk=40)
                        for _ in range(n)]
            audios = [s.audio(timeout=900) for s in sessions]
            wall = time.time() - t0
            total_audio = sum(len(a) for a in audios) / gen.sample_rate
            frames = sum(sum(f.shape[0] for f in s.frames_out) for s in sessions)
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
        agg_b16 = float(np.median(agg))

        # -- TTFA at the throughput config (VERDICT r3 #3) ------------------
        # 12 busy slots, ≥3 reps: the p95 here was invisible to the driver
        # (only the B=4 pool's TTFA was benched) while PARITY.md recorded
        # 190-280 ms p50 / up to 1.6 s p95 at 8-15 busy. Target: p95 ≤
        # 2×p50 and < 400 ms on a healthy link.
        lat12 = []
        for rep in range(3):
            long12 = [server16.submit(text, max_audio_length_ms=30_000,
                                      temperature=0.8, topk=40)
                      for _ in range(12)]
            time.sleep(1.5)  # pool mid-decode at 12 busy
            for _ in range(8):
                t0 = time.time()
                s = server16.submit(text, max_audio_length_ms=400)
                first = s.chunks.get(timeout=900)
                lat12.append(time.time() - t0)
                while first is not None:  # drain to free the slot
                    first = s.chunks.get(timeout=900)
            for s in long12:
                s.cancel()
            for s in long12:
                s.audio(timeout=900)
        lat12.sort()
        ttfa12_p50 = 1000 * float(np.median(lat12))
        ttfa12_p95 = 1000 * lat12[max(0, int(round(0.95 * len(lat12))) - 1)]
        print(
            f"TTFA at throughput config (B=16, 12 busy, {len(lat12)} probes "
            f"over 3 reps): p50 {ttfa12_p50:.0f} ms, p95 {ttfa12_p95:.0f} ms, "
            f"max {1000*lat12[-1]:.0f} ms (target p95 ≤ 2×p50 and < 400 ms)",
            file=sys.stderr,
        )
    finally:
        server16.stop()

    # -- duplex voice loop: per-turn time-to-first-audio (VERDICT r3 #8) ---
    # The one capability with no measured number. STT/LLM are stubbed
    # (zero-latency), so the metric isolates what THIS framework adds to
    # a voice turn: context append + tokenize + prefill over the rolling
    # dialog + first frame + 1-frame Mimi. The reference prints TTFS/TTFF
    # per turn (reference ogwebapp.py:106-120). Target: < 500 ms/turn.
    from sesameai_tts_tpu.apps.duplex import DuplexVoiceApp

    class _StubLLM:
        """Deterministic two-sentence reply; .query streams deltas."""

        class _Hist:
            def clear_history(self):
                pass

        history_manager = _Hist()

        def query(self, text, stream=True):
            reply = ("Here is a quick answer for you. "
                     "The fox settled down by the river.")
            for i in range(0, len(reply), 7):
                yield reply[i : i + 7]

    app = DuplexVoiceApp(gen, stt=lambda a, r: "Tell me about the fox.",
                         llm=_StubLLM(), max_sentence_ms=4_000)
    user_pcm = np.zeros(24_000, np.float32)
    turn_ttfa = []
    for turn in range(4):
        t0 = time.time()
        it = app.respond(user_pcm, 24_000)
        try:
            next(it)
            turn_ttfa.append(time.time() - t0)
            for _ in it:  # finish the turn (context recycles)
                pass
        except StopIteration:
            pass
    # turn 0 pays fresh prefill-bucket compiles as the dialog grows; the
    # steady-state number is the median of the warm turns
    duplex_ms = 1000 * float(np.median(turn_ttfa[1:]))
    print(f"duplex turn TTFA (stubbed STT/LLM, 4 turns, rolling context): "
          f"first {1000*turn_ttfa[0]:.0f} ms, warm median {duplex_ms:.0f} ms "
          f"(target < 500 ms)", file=sys.stderr)

    # -- batched decode micro (model-only: no Mimi, no scheduler) ----------
    from sesameai_tts_tpu.models import csm as csm_model_b

    micro_b2 = None
    for B in (2, 4):
        st = csm_model_b.init_state(gen._cfg, B, jnp.bfloat16,
                                    unstacked=gen._unrolled)
        f0 = jnp.zeros((B, gen._cfg.audio_num_codebooks), jnp.int32) + 5
        dn = jnp.zeros((B,), bool)
        outp = gen._decode(gen._params, st, f0, dn, jax.random.PRNGKey(0), 25,
                           jnp.float32(0.8), 40)
        _ = np.asarray(outp[0][-1])  # host fetch: block_until_ready does not
        st = outp[3]                 # reliably sync on this remote platform
        t0 = time.time()
        reps = 3
        for i in range(reps):
            outp = gen._decode(gen._params, st, f0, dn, jax.random.PRNGKey(i), 25,
                               jnp.float32(0.8), 40)
            st = outp[3]
        _ = np.asarray(outp[0][-1])
        per_frame = (time.time() - t0) / reps / 25
        if B == 2:
            micro_b2 = per_frame * 1000
        print(
            f"batched decode micro B={B} (model-only): {per_frame*1000:.2f} "
            f"ms/step = {B/per_frame:.0f} frames/s, per-stream RTF "
            f"{per_frame/0.08:.4f}",
            file=sys.stderr,
        )

    # -- gputest parity: generate_frame on a 512-row prefill ---------------
    from sesameai_tts_tpu.models import csm as csm_model

    cfg = gen._cfg
    K = cfg.audio_num_codebooks
    tokens = jnp.zeros((1, 512, K + 1), jnp.int32)
    mask = jnp.zeros((1, 512, K + 1), bool).at[:, :, K].set(True)
    state0 = csm_model.init_state(cfg, 1, jnp.bfloat16, unstacked=gen._unrolled)
    frame, _ = gen._prefill(gen._prefill_params, state0, tokens, mask,
                            jnp.array([512], jnp.int32), jax.random.PRNGKey(0),
                            jnp.float32(0.8), 40)
    _ = np.asarray(frame[0, 0])
    t0 = time.time()
    iters = 10
    for _ in range(iters):
        frame, _ = gen._prefill(gen._prefill_params, state0, tokens, mask,
                                jnp.array([512], jnp.int32), jax.random.PRNGKey(0),
                                jnp.float32(0.8), 40)
    _ = np.asarray(frame[0, 0])
    per = (time.time() - t0) / iters
    print(f"generate_frame(512-prefill): {per*1000:.1f} ms ({1/per:.1f} it/s)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "rtf_proc_per_audio",
        "value": round(rtf, 4),
        "unit": "proc_s/audio_s",
        "vs_baseline": round(rtf / 0.1, 3),
        "rtf_tuned_schedule": round(rtf_tuned, 4),
        "agg_frames_per_s_b16": round(agg_b16, 1),
        "ttfa_p50_b16_busy12_ms": round(ttfa12_p50, 0),
        "ttfa_p95_b16_busy12_ms": round(ttfa12_p95, 0),
        "int8_greedy_match_rate": round(int8_match, 3),
        "duplex_turn_ttfa_ms": round(duplex_ms, 0),
        # drift canary: same cached program every round — healthy link
        # reads ~6.8-7.4 ms; >=8 means the shared TPU service is in a
        # slow phase and the headline RTF is inflated (PARITY.md drift
        # note), not a code regression
        "decode_micro_b2_ms": round(micro_b2, 2),
    }))


if __name__ == "__main__":
    main()
