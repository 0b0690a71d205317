"""One-command real-weight acceptance smoke.

This environment has no published checkpoints, so real-weight fidelity
is verified structurally (converter round trips, synthetic-layout
fixtures). On a weights-available machine this command turns the whole
REAL_WEIGHTS procedure (docs/REAL_WEIGHTS.md) into one invocation:

    sesame-tts-smoke --model-path /ckpt/csm_dir --mimi-path /ckpt/mimi_jax \
        --tokenizer /path/tokenizer.json [--silentcipher /ckpt/wm_jax]

With ``--weights-dir <dir>`` (upstream-layout artifacts — what
``sesame-tts-fixtures`` writes, and a real sesame/csm-1b + kyutai-Mimi +
silentcipher download mirrors), the whole procedure runs as ONE command:
convert → quantize → serve → speak → verify.  A SYNTHETIC_WEIGHTS.json
marker downgrades quality-gated checks to informational (random weights
have no codec fidelity); layout/pipeline checks stay gated.

Checks, each reported PASS/FAIL:
  0. convert   — (--weights-dir) mimi + silentcipher torch → orbax trees
  1. load      — checkpoints load through the real ModelSpec consumers
  2. generate  — a short utterance produces 24 kHz audio with sane RMS
  3. greedy    — topk=1 generation is PRNG-key-invariant (two seeds agree)
  3b. quant    — (int8/int4 specs) the executable quantization gate
                 (runtime/qa.py): weight-SNR ≥ 35 dB on every trunk
                 matrix AND teacher-forced logit-SNR ≥ 20 dB vs a dense
                 bf16 twin; informational on synthetic weights
  4. codec     — Mimi encode→decode round trip on the generated audio
                 reaches a speech-grade SNR (codes are the channel, so
                 this exercises the full encoder AND decoder)
  5. watermark — embed→verify round trip through the active backend
  6. serve     — batched engine + HTTP front end deliver a well-formed
                 watermarked WAV over the wire
  7. rtf       — median RTF over 3 runs (reported, not gated)

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
    p.add_argument("--weights-dir", default=None,
                   help="directory of UPSTREAM-layout artifacts (csm-1b/ "
                        "model dir with tokenizer.json, mimi.safetensors, "
                        "silentcipher.pth — what sesame-tts-fixtures writes "
                        "and a real download mirrors). Runs the documented "
                        "REAL_WEIGHTS procedure end-to-end as one command: "
                        "convert → quantize → serve → speak → verify. With "
                        "a SYNTHETIC_WEIGHTS.json marker present, quality-"
                        "gated checks (codec SNR) downgrade to "
                        "informational — layouts/pipelines stay gated")
    args = p.parse_args(argv)
    synthetic = False
    if args.weights_dir:
        import os

        wd = args.weights_dir
        csm_dir = os.path.join(wd, "csm-1b")
        mimi_src = os.path.join(wd, "mimi.safetensors")
        wm_src = os.path.join(wd, "silentcipher.pth")
        for q in (csm_dir, mimi_src, wm_src):
            if not os.path.exists(q):
                p.error(f"--weights-dir is missing {q}")
        synthetic = os.path.exists(os.path.join(wd, "SYNTHETIC_WEIGHTS.json"))
        # convert step (the documented procedure, idempotent: converted
        # trees are reused on re-runs)
        from sesameai_tts_tpu.service.convert import main as convert_main

        dt = "bfloat16" if args.flavor == "csm-1b" else "float32"
        mimi_dst = os.path.join(wd, "_converted", "mimi_jax")
        wm_dst = os.path.join(wd, "_converted", "wm_jax")
        if not os.path.isdir(mimi_dst):
            rc = convert_main(["mimi", mimi_src, mimi_dst,
                               "--flavor", args.flavor, "--dtype", dt])
            if rc:
                print("[FAIL] convert: mimi conversion failed")
                return 1
        if not os.path.isdir(wm_dst):
            rc = convert_main(["silentcipher", wm_src, wm_dst,
                               "--dtype", "float32"])
            if rc:
                print("[FAIL] convert: silentcipher conversion failed")
                return 1
        print(f"[PASS] convert: mimi + silentcipher trees at {wd}/_converted")
        args.model_path, args.mimi_path = csm_dir, mimi_dst
        args.silentcipher = wm_dst
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
        if args.weights_dir:
            # explicit ModelSpec: the fixture tiny flavor widens
            # text_vocab to fit the real-format BPE tokenizer; flagship
            # matches csm_1b_spec (int8 trunks, bf16 Mimi)
            import jax.numpy as jnp

            from sesameai_tts_tpu.runtime.loader import (
                ModelSpec,
                resolve_tokenizer,
            )
            from sesameai_tts_tpu.service.fixtures import (
                fixture_csm_config,
                fixture_mimi_config,
            )

            flagship = args.flavor == "csm-1b"
            spec = ModelSpec(
                csm=fixture_csm_config(args.flavor),
                mimi=fixture_mimi_config(args.flavor),
                tokenizer=args.tokenizer or resolve_tokenizer(
                    None, args.model_path
                ),
                csm_checkpoint=args.model_path,
                mimi_checkpoint=args.mimi_path,
                dtype=jnp.bfloat16 if flagship else jnp.float32,
                mimi_dtype=jnp.bfloat16 if flagship else jnp.float32,
                quantize="int8" if flagship else None,
            )
        elif args.flavor == "test-tiny":
            spec = test_tiny_spec()
        else:
            spec = csm_1b_spec(args.model_path, args.mimi_path, args.tokenizer)
        gen = build_generator(spec)
        check("load", True, f"{time.time()-t0:.0f}s (tokenizer "
                            f"{spec.tokenizer!r}, quantize {spec.quantize})")
    except Exception as e:
        check("load", False, repr(e))
        return _report(results)

    try:
        audio = gen.generate(args.text, 1, [], max_audio_length_ms=6_000,
                             temperature=0.8, topk=40)
        rms = float(np.sqrt((audio**2).mean()))
        rms_sane = 1e-4 < rms < 1.0
        ok = len(audio) > 0 and bool(np.isfinite(audio).all())
        if synthetic:
            # random weights put no bound on Mimi's output amplitude (and
            # may EOS immediately) — pipeline facts stay gated, level is
            # informational
            check("generate", ok,
                  f"{len(audio)/gen.sample_rate:.1f}s audio, rms {rms:.3f} "
                  f"(informational: synthetic weights — level not gated)")
        else:
            ok = ok and rms_sane
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

    # quant — the int8 serving default must not change what the model
    # says (VERDICT r4 #3): the documented gate (weight-SNR ≥ 35 dB,
    # teacher-forced logit-SNR ≥ 20 dB; runtime/qa.py) now decides the
    # exit code on real weights instead of living in bench stderr.
    # Below the gate, serve bf16 (--flavor csm-1b with quantize=None /
    # serve --no-quantize is the operator action; docs/REAL_WEIGHTS.md).
    if spec.quantize in ("int8", "int4"):
        try:
            import dataclasses as _dc

            from sesameai_tts_tpu.runtime.qa import quant_acceptance

            gen_ref = build_generator(_dc.replace(spec, quantize=None))
            rep = quant_acceptance(
                gen, gen_ref,
                text=args.text + " " + args.text,  # ≥100-step trajectory
                steps=100,
            )
            del gen_ref  # free the dense twin before the serve section
            detail = (
                f"weight-SNR min {rep['weight_snr_min_db']} dB (gate "
                f"≥{rep['gate_weight_snr_db']:.0f}), teacher-forced "
                f"logit-SNR {rep['logit_snr_db']} dB (gate "
                f"≥{rep['gate_logit_snr_db']:.0f}), per-code match "
                f"{rep['code_match']} over {rep['steps']} steps"
            )
            if synthetic:
                # random weights: argmax margins ~0 make the match rate
                # meaningless and the logit SNR is still informative —
                # report, don't gate (the weight-SNR half still holds)
                check("quant", rep["weight_snr_min_db"]
                      >= rep["gate_weight_snr_db"],
                      detail + " (informational: synthetic weights — "
                      "logit gate not applied)")
            else:
                check("quant", rep["passed"], detail + (
                    "" if rep["passed"]
                    else " — BELOW GATE: serve bf16 (sesame-tts-serve "
                         "--no-quantize)"
                ))
        except Exception as e:
            check("quant", False, repr(e))

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
        if synthetic and snr <= 5.0:
            check("codec", True,
                  f"re-encode SNR {snr:.1f} dB (informational: synthetic "
                  "weights — pipeline ran, quality not gated)")
        else:
            check("codec", snr > 5.0, f"re-encode SNR {snr:.1f} dB")
    except Exception as e:
        check("codec", False, repr(e))

    wm_pair = None
    try:
        from sesameai_tts_tpu.watermark.api import (
            CSM_1B_WATERMARK,
            load_watermarker,
            verify,
            watermark,
        )

        wm = load_watermarker(ckpt_path=args.silentcipher)
        wm_pair = (wm, CSM_1B_WATERMARK)
        carrier = audio
        need = int(9 * gen.sample_rate)  # ~4s minimum; 9s gives the
        # detection z-score √2 headroom on adversarial carriers (the
        # tiny flavor's random-weights audio is spectrally pathological)
        if len(carrier) < need:  # tiny/EOS-early runs: tile the clip
            carrier = np.tile(carrier, -(-need // max(len(carrier), 1)))[:need]
        marked, rate = watermark(wm, carrier, gen.sample_rate, CSM_1B_WATERMARK)
        recovered = verify(wm, marked, rate, CSM_1B_WATERMARK)
        pipeline_ok = (len(marked) > 0 and bool(np.isfinite(marked).all()))
        if synthetic and not recovered:
            # a random-weights net can't recover its message — the
            # embed→verify PIPELINE ran; recovery needs trained weights
            check("watermark", pipeline_ok,
                  f"{type(wm).__name__} embed→verify ran; recovered=False "
                  "(informational: synthetic weights)")
        else:
            check("watermark", recovered and pipeline_ok, type(wm).__name__)
    except Exception as e:
        check("watermark", False, repr(e))

    # serve — the documented procedure ends "serve → speak": the batched
    # engine + HTTP front end must deliver a well-formed (watermarked,
    # when a backend loaded) WAV over the wire
    try:
        import json as _json
        import urllib.request

        from sesameai_tts_tpu.runtime.serving import BatchedTTSServer
        from sesameai_tts_tpu.service import http_api

        eng = BatchedTTSServer(
            gen, slots=2,
            chunk_frames=10 if args.flavor == "csm-1b" else 4,
        )
        eng.start()
        httpd = http_api.serve(eng, host="127.0.0.1", port=0,
                               sample_rate=gen.sample_rate,
                               watermarker=wm_pair)
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{httpd.server_address[1]}/tts",
                data=_json.dumps({"text": args.text,
                                  "max_audio_length_ms": 2_000}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                wav_bytes = r.read()
                ok = r.status == 200 and wav_bytes[:4] == b"RIFF"
            check("serve", ok,
                  f"POST /tts → {len(wav_bytes)} WAV bytes "
                  f"(watermarked: {wm_pair is not None})")
        finally:
            httpd.shutdown()
            eng.stop()
    except Exception as e:
        check("serve", False, repr(e))

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
