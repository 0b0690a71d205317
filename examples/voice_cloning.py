"""Voice cloning via audio+transcript context prompts (the reference's
Segment pattern, reference generator.py:16-21 + samples.py voices).

    python examples/voice_cloning.py --clip my_voice.wav \
        --transcript "what the clip says" --text "Now say this." \
        --model-path csm-1b.safetensors --tokenizer tokenizer.json
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip", required=True, help="24 kHz-ish WAV of the voice")
    p.add_argument("--transcript", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--out", default="cloned.wav")
    p.add_argument("--model-path", default=None)
    p.add_argument("--mimi-path", default=None)
    p.add_argument("--tokenizer", default="byte")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    from sesameai_tts_tpu.audio.io import read_wav_mono, write_wav
    from sesameai_tts_tpu.runtime.frames import Segment
    from sesameai_tts_tpu.runtime.loader import build_generator, csm_1b_spec, test_tiny_spec

    spec = test_tiny_spec() if args.tiny else csm_1b_spec(
        args.model_path, args.mimi_path, args.tokenizer
    )
    gen = build_generator(spec)

    audio, _ = read_wav_mono(args.clip, gen.sample_rate)
    voice = Segment(speaker=1, text=args.transcript, audio=audio)

    # precompute the voice KV prefix once; reuse across utterances
    cached = gen.precompute_context_state([voice])
    out = gen.generate(
        args.text, speaker=1, context=[], cached_context=cached,
        max_audio_length_ms=15_000, temperature=0.8, topk=40,
    )
    write_wav(args.out, out, gen.sample_rate)
    print(f"wrote {args.out}: {len(out)/gen.sample_rate:.2f}s")


if __name__ == "__main__":
    main()
