"""Multi-chip inference: TP/dp-sharded decode and a two-chip stage split.

Run anywhere with a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORM_NAME=cpu python examples/multichip_inference.py --tiny

On a real pod slice, drop the env vars (devices come from the slice) and
use ``initialize_multihost`` + ``global_serving_mesh`` across hosts.
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--model-path", default=None)
    p.add_argument("--tokenizer", default="byte")
    p.add_argument("--dp", type=int, default=2)
    p.add_argument("--tp", type=int, default=2)
    args = p.parse_args()

    import jax
    import numpy as np

    from sesameai_tts_tpu.parallel.mesh import make_mesh
    from sesameai_tts_tpu.runtime.loader import (
        build_generator,
        csm_1b_spec,
        test_tiny_spec,
    )
    from sesameai_tts_tpu.runtime.serving import BatchedTTSServer

    spec = test_tiny_spec() if args.tiny else csm_1b_spec(
        args.model_path, tokenizer=args.tokenizer
    )

    # --- TP-sharded decode + dp-sharded serving slots over one mesh -----
    mesh = make_mesh(dp=args.dp, tp=args.tp)
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")
    gen = build_generator(spec, mesh=mesh, decode_chunk_frames=8)
    audio = gen.generate("sharded decode across the mesh", 1, [],
                         max_audio_length_ms=1600)
    print(f"sharded generate: {len(audio)/gen.sample_rate:.2f}s of audio")

    server = BatchedTTSServer(gen, slots=args.dp * 2, chunk_frames=8)
    server.start()
    try:
        sessions = [
            server.submit(f"concurrent sharded session {i}",
                          max_audio_length_ms=1200)
            for i in range(args.dp * 2 + 1)
        ]
        for i, s in enumerate(sessions):
            a = s.audio(timeout=600)
            print(f"  session {i}: {len(a)/gen.sample_rate:.2f}s")
    finally:
        server.stop()

    # --- two-chip stage pipeline: model on dev0, codec on dev1 ----------
    gen_pp = build_generator(spec, codec_device=jax.devices()[1],
                             decode_chunk_frames=8)
    chunks = list(gen_pp.generate_stream(
        "codec pinned to its own chip", 1, [], max_audio_length_ms=1600,
        chunk_frames=4,
    ))
    total = sum(len(c) for c in chunks)
    print(f"stage-split stream: {len(chunks)} chunks, "
          f"{total/gen_pp.sample_rate:.2f}s of audio")
    assert all(np.isfinite(c).all() for c in chunks)


if __name__ == "__main__":
    main()
