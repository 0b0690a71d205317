"""End-to-end Generator: text → frames → PCM on the tiny flavor.

This is the integration tier of the test pyramid (SURVEY.md §4c): the
full pipeline on CPU with random tiny weights — the reference has no
equivalent (its only smoke test is the warm-up generation,
tts_service.py:118-119).
"""

import numpy as np
import pytest
import jax

from sesameai_tts_tpu.runtime.frames import Segment
from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec as tiny_spec


@pytest.fixture(scope="module")
def gen():
    return build_generator(tiny_spec(), decode_chunk_frames=4)


def test_generate_produces_audio(gen):
    audio = gen.generate(
        "hello world this is a test", speaker=1, context=[],
        max_audio_length_ms=800, temperature=0.8, topk=5,
    )
    hop = gen._mimi.cfg.hop_length
    assert audio.dtype == np.float32
    assert audio.shape[0] % hop == 0
    assert 0 < audio.shape[0] <= 10 * hop  # ≤ 800ms/80ms = 10 frames
    assert np.isfinite(audio).all()


def test_warmup_stream_and_offline_paths(gen):
    """Generator.warmup covers the single-stream program set: the fused
    streaming tick and the offline ramp (decode_chunk=4 → ramp 4,8,16,…)."""
    times = gen.warmup(offline=True, offline_budget_frames=60,
                       encode_buckets=(4, 8))
    names = set(times)
    assert f"stream_tick_{gen._decode_chunk_frames}" in names
    # ramp from the offline base, doubled until the budget is covered
    base = gen._offline_chunk_frames
    assert f"offline_chunk_{base}" in names
    assert any(k.startswith("offline_chunk_") and k != f"offline_chunk_{base}"
               for k in names)
    # Mimi encode at the requested frame buckets (rolling-dialog path)
    assert {"mimi_encode_4", "mimi_encode_8"} <= names
    # generation still works (warmup used throwaway buffers only)
    audio = gen.generate("post warmup", 1, [], max_audio_length_ms=400,
                         temperature=0.8, topk=5)
    assert np.isfinite(audio).all()


def test_stream_decode_chunk_clamped_to_codec_ring(gen):
    """A decode_chunk_frames beyond the codec streaming ring's slack must
    not crash a live request: the fused tick streams Mimi with a carried
    ring cache (codec/transformer.py asserts chunk ≤ slack), so the
    generator clamps to Mimi.max_stream_chunk_frames. Audio is unchanged
    by chunking (per-frame keys are absolute-index fold_ins)."""
    cap = gen._mimi.max_stream_chunk_frames
    assert cap >= 1
    chunks = list(gen.generate_stream(
        "clamp me", 1, [], max_audio_length_ms=480, temperature=0.8,
        topk=5, decode_chunk_frames=cap + 40, seed=3))
    audio = np.concatenate(chunks)
    assert audio.size > 0 and np.isfinite(audio).all()


def test_stream_matches_offline_frames(gen):
    """Same PRNG seed ⇒ identical frames; streaming chunks concatenate to
    the same PCM as the offline Mimi decode (streaming==offline codec)."""
    gen._key = jax.random.PRNGKey(123)
    frames = gen.generate_frames(
        "the quick brown fox", speaker=0, context=[],
        max_audio_length_ms=640, temperature=0.7, topk=3,
    )
    offline = gen.decode_audio(frames)

    gen._key = jax.random.PRNGKey(123)
    chunks = list(
        gen.generate_stream(
            "the quick brown fox", speaker=0, context=[],
            max_audio_length_ms=640, temperature=0.7, topk=3, chunk_frames=1,
        )
    )
    streamed = np.concatenate(chunks)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_stream_grouping_matches_offline(gen):
    """chunk_frames>1 grouping must not change the PCM (Mimi streaming
    decode is chunk-boundary invariant)."""
    import jax

    gen._key = jax.random.PRNGKey(321)
    frames = gen.generate_frames(
        "grouped streaming", speaker=0, context=[],
        max_audio_length_ms=640, temperature=0.7, topk=3,
    )
    offline = gen.decode_audio(frames)

    gen._key = jax.random.PRNGKey(321)
    chunks = list(
        gen.generate_stream(
            "grouped streaming", speaker=0, context=[],
            max_audio_length_ms=640, temperature=0.7, topk=3, chunk_frames=3,
        )
    )
    streamed = np.concatenate(chunks)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_context_segments(gen):
    hop = gen._mimi.cfg.hop_length
    ctx = [
        Segment(speaker=1, text="context line", audio=np.random.default_rng(0)
                .normal(size=3 * hop).astype(np.float32) * 0.1)
    ]
    audio = gen.generate(
        "with context", speaker=1, context=ctx,
        max_audio_length_ms=480, temperature=0.8, topk=5,
    )
    assert audio.shape[0] % hop == 0


def test_pretokenized_context_cache(gen):
    """Service-layer context caching path: pass (tokens, mask) pairs
    (the analog of reference tts_service.py:133-138)."""
    hop = gen._mimi.cfg.hop_length
    seg = Segment(speaker=1, text="cached", audio=np.zeros(2 * hop, np.float32))
    pair = gen.frame_tokenizer.segment(seg)
    audio = gen.generate(
        "after cache", speaker=1, context=[pair],
        max_audio_length_ms=480, temperature=0.8, topk=5,
    )
    assert audio.shape[0] % hop == 0


def test_input_length_guard(gen):
    """2048-position guard parity (reference generator.py:169-174)."""
    with pytest.raises(ValueError, match="Inputs too long"):
        gen.generate(
            "word " * 3000, speaker=1, context=[], max_audio_length_ms=90_000
        )


def test_generate_device_assembly_equals_frames_path():
    """generate() assembles codes on device and trims PCM by the valid
    count; it must equal decode_audio(generate_frames()) exactly (same
    seed => same key sequence => same frames; causal codec => zero-pad
    suffix does not affect the emitted prefix)."""
    from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec

    g1 = build_generator(test_tiny_spec(), decode_chunk_frames=4)
    frames = g1.generate_frames("device assembly parity", 1, [],
                                max_audio_length_ms=1600, temperature=0.9, topk=5)
    ref = g1.decode_audio(frames)

    g2 = build_generator(test_tiny_spec(), decode_chunk_frames=4)
    out = g2.generate("device assembly parity", 1, [],
                      max_audio_length_ms=1600, temperature=0.9, topk=5)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_seed_reproducibility(gen):
    """Public ``seed`` kwarg: same seed → identical audio across calls
    AND across generate/generate_stream (per-frame keys are derived from
    the utterance key, so the dispatch schedule can't change sampling);
    different seeds diverge at sampling temperatures."""
    kw = dict(speaker=1, context=[], max_audio_length_ms=640,
              temperature=1.2, topk=5)
    a1 = gen.generate("seeded utterance", seed=7, **kw)
    a2 = gen.generate("seeded utterance", seed=7, **kw)
    np.testing.assert_array_equal(a1, a2)

    streamed = np.concatenate(
        list(gen.generate_stream("seeded utterance", seed=7, chunk_frames=1, **kw))
    )
    assert streamed.shape == a1.shape
    np.testing.assert_allclose(streamed, a1, rtol=1e-4, atol=1e-5)

    frames7 = gen.generate_frames("seeded utterance", seed=7, **kw)
    frames8 = gen.generate_frames("seeded utterance", seed=8, **kw)
    assert frames7.shape != frames8.shape or not np.array_equal(frames7, frames8)


def test_max_positions_override_same_audio(gen):
    """CSMConfig.max_seq_len shrinks the backbone KV capacity (a serving
    throughput lever: the decode step streams the whole static buffer)
    WITHOUT changing numerics: same seed + same weights -> identical
    audio, shorter cache, proportionally tighter length guard."""
    import dataclasses

    spec = tiny_spec()
    spec.csm = spec.csm.replace(max_seq_len=96)
    gen96 = build_generator(spec, decode_chunk_frames=4)
    assert gen96.max_seq_len == 96
    assert gen96.context_budget < gen.context_budget

    kw = dict(speaker=1, context=[], max_audio_length_ms=640,
              temperature=1.2, topk=5)
    a_full = gen.generate("short seeded utterance", seed=11, **kw)
    a_96 = gen96.generate("short seeded utterance", seed=11, **kw)
    np.testing.assert_array_equal(a_full, a_96)

    # the guard now enforces the shrunken capacity (an oversized BUDGET
    # clamps by design; an oversized PROMPT must raise)
    long_text = " ".join(f"w{i}" for i in range(200))
    assert gen96._tokenize_prompt(long_text, 1, [])[0].shape[0] > 96
    with pytest.raises(ValueError):
        gen96.generate(long_text, speaker=1, context=[],
                       max_audio_length_ms=60_000)


def test_clone_shares_weights_and_matches_output(gen):
    """clone() hands back a Generator over the SAME device buffers (no
    re-init/re-quantize — the bench's tuned-schedule and cold-start
    sections depend on this to avoid duplicate flagship builds, VERDICT
    r4 #1c) with fresh jit wrappers and independent schedule knobs.
    Same seed + greedy → identical audio despite a different chunk
    schedule (per-frame keys are absolute-index fold_ins)."""
    c = gen.clone(decode_chunk_frames=2, offline_chunk_frames=2, seed=3)
    # shared, not copied: the exact same device arrays
    assert jax.tree.leaves(c._params)[0] is jax.tree.leaves(gen._params)[0]
    assert c._prefill_params is gen._prefill_params
    assert c._mimi_params is gen._mimi_params
    assert c._tokenizer.text_tokenizer is gen._tokenizer.text_tokenizer
    # knobs are per-instance
    assert c._offline_chunk_frames == 2 and c._decode_chunk_frames == 2
    assert gen._decode_chunk_frames == 4  # original untouched
    kw = dict(speaker=1, context=[], max_audio_length_ms=640,
              temperature=1.0, topk=1)
    a = gen.generate("clone parity utterance", seed=7, **kw)
    b = c.generate("clone parity utterance", seed=7, **kw)
    np.testing.assert_allclose(a, b, atol=1e-5)
    # the clone warms up and streams on its own wrappers
    chunks = list(c.generate_stream("clone stream", 1, [],
                                    max_audio_length_ms=320,
                                    temperature=0.8, topk=5))
    assert all(np.isfinite(ch).all() for ch in chunks)
