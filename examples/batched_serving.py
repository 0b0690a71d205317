"""Concurrent-session serving over one chip (BASELINE config 5).

    python examples/batched_serving.py --tiny
"""

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--model-path", default=None)
    p.add_argument("--tokenizer", default="byte")
    p.add_argument("--slots", type=int, default=4)
    args = p.parse_args()

    from sesameai_tts_tpu.runtime.loader import build_generator, csm_1b_spec, test_tiny_spec
    from sesameai_tts_tpu.runtime.serving import BatchedTTSServer

    spec = test_tiny_spec() if args.tiny else csm_1b_spec(
        args.model_path, tokenizer=args.tokenizer
    )
    gen = build_generator(spec)
    server = BatchedTTSServer(gen, slots=args.slots, chunk_frames=10)
    server.start()

    texts = [
        "First concurrent request speaking now.",
        "Second request in parallel on the same chip.",
        "Third one shares the same weight reads.",
        "Fourth rides the batch too.",
        "A fifth queues until a slot frees.",
    ]
    t0 = time.time()
    # one call fans the texts over the slot pool and returns PCM in order
    out = server.synthesize_batch(
        texts, max_audio_length_ms=5_000, temperature=0.8, topk=40
    )
    total_audio = 0.0
    for i, audio in enumerate(out):
        total_audio += len(audio) / gen.sample_rate
        print(f"session {i}: {len(audio)/gen.sample_rate:.2f}s audio")
    wall = time.time() - t0
    print(f"{total_audio:.1f}s audio across {len(texts)} sessions in {wall:.1f}s "
          f"wall ({total_audio/wall:.1f}x realtime aggregate)")

    # interactive request mid-bulk: short budgets (≤4 s, or an explicit
    # priority=0) admit AHEAD of queued bulk jobs — see docs/SERVING.md
    bulk = [server.submit(t, max_audio_length_ms=30_000) for t in texts]
    t0 = time.time()
    quick = server.submit("Quick interactive reply.", max_audio_length_ms=2_000)
    quick.chunks.get(timeout=600)  # first audio despite the bulk backlog
    print(f"interactive TTFA behind a {len(bulk)}-job bulk burst: "
          f"{1000*(time.time()-t0):.0f} ms")
    for s in bulk:
        s.cancel()
    for s in bulk:
        s.audio(timeout=600)
    server.stop()


if __name__ == "__main__":
    main()
