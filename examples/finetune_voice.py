"""Finetune a voice from a clips directory, then speak with the result.

The reference stack is inference-only (SURVEY.md §5); this is the
framework's close-the-loop flow: clips → LoRA finetune → merged params
→ generate. Runs end-to-end on the tiny flavor with no assets:

    python examples/finetune_voice.py --tiny --data clips/ --steps 20

Flagship (real weights + tokenizer required):

    python examples/finetune_voice.py --data clips/ \
        --csm-checkpoint csm-1b.safetensors --mimi-checkpoint mimi.safetensors \
        --tokenizer tokenizer.json --steps 500
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="dir of 24 kHz WAVs + transcripts")
    p.add_argument("--text", default="This is my finetuned voice.")
    p.add_argument("--out", default="finetuned.wav")
    p.add_argument("--ckpt-dir", default="ft_ckpt")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lora-rank", type=int, default=16)
    p.add_argument("--csm-checkpoint", default=None)
    p.add_argument("--mimi-checkpoint", default=None)
    p.add_argument("--tokenizer", default="byte")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    from sesameai_tts_tpu.training import finetune as ft

    flavor = "test-tiny" if args.tiny else "csm-1b"
    argv = [
        "--data", args.data, "--flavor", flavor,
        "--steps", str(args.steps), "--lora-rank", str(args.lora_rank),
        "--ckpt-dir", args.ckpt_dir, "--eval-frac", "0.1",
        "--tokenizer", args.tokenizer,
    ]
    if not args.tiny:
        argv += ["--dtype", "bf16"]
    if args.csm_checkpoint:
        argv += ["--csm-checkpoint", args.csm_checkpoint]
    if args.mimi_checkpoint:
        argv += ["--mimi-checkpoint", args.mimi_checkpoint]
    ft.main(argv)

    # the exported merged params serve exactly like a converted checkpoint
    from sesameai_tts_tpu.audio.io import write_wav
    from sesameai_tts_tpu.runtime.loader import build_generator, csm_1b_spec, test_tiny_spec

    import dataclasses

    params_dir = os.path.join(args.ckpt_dir, "params")
    if args.tiny:
        spec = dataclasses.replace(test_tiny_spec(), csm_checkpoint=params_dir)
    else:
        spec = csm_1b_spec(params_dir, args.mimi_checkpoint, args.tokenizer)
    gen = build_generator(spec)
    audio = gen.generate(args.text, speaker=0, context=[], max_audio_length_ms=10_000)
    write_wav(args.out, audio, gen.sample_rate)
    print(f"wrote {args.out}: {len(audio)/gen.sample_rate:.2f}s")


if __name__ == "__main__":
    main()
