"""Minimal text→WAV example.

With real checkpoints:
    python examples/basic_tts.py --model-path csm-1b.safetensors \
        --tokenizer tokenizer.json --text "Hello world." --out out.wav

Without checkpoints (random weights — audio is noise, pipeline is real):
    python examples/basic_tts.py --tiny --text "Hello." --out /tmp/out.wav
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", default="Hello from the TPU native framework.")
    p.add_argument("--out", default="out.wav")
    p.add_argument("--model-path", default=None)
    p.add_argument("--mimi-path", default=None)
    p.add_argument("--tokenizer", default="byte")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--stream", action="store_true", help="frame-granular streaming")
    args = p.parse_args()

    from sesameai_tts_tpu.audio.io import write_wav
    from sesameai_tts_tpu.runtime.loader import build_generator, csm_1b_spec, test_tiny_spec

    spec = test_tiny_spec() if args.tiny else csm_1b_spec(
        args.model_path, args.mimi_path, args.tokenizer
    )
    gen = build_generator(spec)

    if args.stream:
        import numpy as np

        chunks = []
        for chunk in gen.generate_stream(
            args.text, speaker=1, context=[], max_audio_length_ms=10_000,
            temperature=0.8, topk=40, chunk_frames=1,
        ):
            chunks.append(chunk)
            print(f"chunk: {len(chunk)} samples")
        audio = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    else:
        audio = gen.generate(
            args.text, speaker=1, context=[], max_audio_length_ms=10_000,
            temperature=0.8, topk=40,
        )

    write_wav(args.out, audio, gen.sample_rate)
    print(f"wrote {args.out}: {len(audio)/gen.sample_rate:.2f}s @ {gen.sample_rate} Hz")


if __name__ == "__main__":
    main()
