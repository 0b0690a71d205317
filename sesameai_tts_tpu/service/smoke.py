"""One-command real-weight acceptance smoke.

This environment has no published checkpoints, so real-weight fidelity
is verified structurally (converter round trips, synthetic-layout
fixtures). On a weights-available machine this command turns the whole
REAL_WEIGHTS procedure (docs/REAL_WEIGHTS.md) into one invocation:

    sesame-tts-smoke --model-path /ckpt/csm_dir --mimi-path /ckpt/mimi_jax \
        --tokenizer /path/tokenizer.json [--silentcipher /ckpt/wm_jax]

Checks, each reported PASS/FAIL:
  1. load      — checkpoints load through the real ModelSpec consumers
  2. generate  — a short utterance produces 24 kHz audio with sane RMS
  3. greedy    — topk=1 generation is PRNG-key-invariant (two seeds agree)
  4. codec     — Mimi encode→decode round trip on the generated audio
                 reaches a speech-grade SNR (codes are the channel, so
                 this exercises the full encoder AND decoder)
  5. watermark — embed→verify round trip through the active backend
  6. rtf       — median RTF over 3 runs (reported, not gated)

Exit code 0 iff every gated check passes.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="real-weight acceptance smoke")
    p.add_argument("--model-path", default=None)
    p.add_argument("--mimi-path", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--silentcipher", default=None,
                   help="converted silentcipher checkpoint (optional)")
    p.add_argument("--text", default="The quick brown fox jumps over the lazy dog.")
    p.add_argument("--output", default=None, help="also write the WAV here")
    p.add_argument("--flavor", default="csm-1b", choices=["csm-1b", "test-tiny"],
                   help="test-tiny runs the whole harness on random tiny "
                        "weights (harness self-test; codec check will FAIL "
                        "by design on random weights)")
    args = p.parse_args(argv)
    if args.flavor == "csm-1b":
        if not (args.model_path and args.mimi_path):
            p.error("--model-path and --mimi-path are required for the "
                    "csm-1b flavor")
        from sesameai_tts_tpu.runtime.loader import resolve_tokenizer

        args.tokenizer = resolve_tokenizer(args.tokenizer, args.model_path)
        if args.tokenizer == "byte":
            p.error("no tokenizer found: pass --tokenizer, or ship "
                    "tokenizer.json next to the model checkpoint "
                    "(the HF layout)")

    results = []

    def check(name, ok, detail=""):
        results.append((name, bool(ok)))
        print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}")

    from sesameai_tts_tpu.runtime.loader import (
        build_generator,
        csm_1b_spec,
        test_tiny_spec,
    )

    t0 = time.time()
    try:
        spec = (
            test_tiny_spec() if args.flavor == "test-tiny"
            else csm_1b_spec(args.model_path, args.mimi_path, args.tokenizer)
        )
        gen = build_generator(spec)
        check("load", True, f"{time.time()-t0:.0f}s")
    except Exception as e:
        check("load", False, repr(e))
        return _report(results)

    try:
        audio = gen.generate(args.text, 1, [], max_audio_length_ms=6_000,
                             temperature=0.8, topk=40)
        rms = float(np.sqrt((audio**2).mean()))
        ok = len(audio) > 0 and np.isfinite(audio).all() and 1e-4 < rms < 1.0
        check("generate", ok,
              f"{len(audio)/gen.sample_rate:.1f}s audio, rms {rms:.3f}")
        if args.output and ok:
            from sesameai_tts_tpu.audio.io import write_wav

            write_wav(args.output, audio, gen.sample_rate)
            print(f"  wrote {args.output}")
    except Exception as e:
        check("generate", False, repr(e))
        return _report(results)

    try:
        a = gen.generate(args.text, 1, [], max_audio_length_ms=2_000,
                         temperature=1.0, topk=1)
        b = gen.generate(args.text, 1, [], max_audio_length_ms=2_000,
                         temperature=1.0, topk=1)
        check("greedy", len(a) == len(b) and np.allclose(a, b, atol=1e-5),
              "topk=1 key-invariant")
    except Exception as e:
        check("greedy", False, repr(e))

    try:
        hop = gen._hop
        clip = audio[: (len(audio) // hop) * hop]
        codes = np.asarray(gen._encode_audio(clip))  # (K, F)
        recon = gen.decode_audio(codes.T)            # decode takes (F, K)
        n = min(len(clip), len(recon))
        err = clip[:n] - recon[:n]
        snr = 10 * np.log10(
            float((clip[:n] ** 2).sum()) / max(float((err**2).sum()), 1e-12)
        )
        # round-tripping ALREADY-CODED audio through the same codec is
        # near-transparent for a healthy codec; random weights give <0 dB
        check("codec", snr > 5.0, f"re-encode SNR {snr:.1f} dB")
    except Exception as e:
        check("codec", False, repr(e))

    try:
        from sesameai_tts_tpu.watermark.api import (
            CSM_1B_WATERMARK,
            load_watermarker,
            verify,
            watermark,
        )

        wm = load_watermarker(ckpt_path=args.silentcipher)
        carrier = audio
        need = int(9 * gen.sample_rate)  # ~4s minimum; 9s gives the
        # detection z-score √2 headroom on adversarial carriers (the
        # tiny flavor's random-weights audio is spectrally pathological)
        if len(carrier) < need:  # tiny/EOS-early runs: tile the clip
            carrier = np.tile(carrier, -(-need // max(len(carrier), 1)))[:need]
        marked, rate = watermark(wm, carrier, gen.sample_rate, CSM_1B_WATERMARK)
        check("watermark", verify(wm, marked, rate, CSM_1B_WATERMARK),
              type(wm).__name__)
    except Exception as e:
        check("watermark", False, repr(e))

    rtfs = []
    for _ in range(3):
        t0 = time.time()
        a = gen.generate(args.text, 1, [], max_audio_length_ms=6_000,
                         temperature=0.8, topk=40)
        if len(a):  # random tiny weights can EOS on frame 1 → 0 s audio
            rtfs.append((time.time() - t0) / (len(a) / gen.sample_rate))
    if not rtfs:
        print("[info] RTF: no audio produced (immediate EOS) — skipped")
        return _report(results)
    print(f"[info] RTF median-of-3: {float(np.median(rtfs)):.4f}")

    return _report(results)


def _report(results) -> int:
    failed = [n for n, ok in results if not ok]
    print(f"\nsmoke: {len(results) - len(failed)}/{len(results)} checks passed"
          + (f" — FAILED: {', '.join(failed)}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
