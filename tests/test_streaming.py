"""Streaming sinks: AudioStreamWriter + generate_streaming_audio
(reference C9, generator.py:303-434)."""

import numpy as np

from sesameai_tts_tpu.audio.io import read_wav_mono
from sesameai_tts_tpu.runtime.streaming import AudioStreamWriter, generate_streaming_audio


def test_audio_stream_writer(tmp_path):
    p = str(tmp_path / "stream.wav")
    w = AudioStreamWriter(p, 24_000)
    w.add_chunk(np.ones(100, np.float32) * 0.25)
    w.add_chunk(np.ones(50, np.float32) * -0.25)
    w.write_file()
    audio, rate = read_wav_mono(p)
    assert rate == 24_000 and len(audio) == 150
    assert abs(audio[0] - 0.25) < 1e-3 and abs(audio[-1] + 0.25) < 1e-3


def test_writer_empty_noop(tmp_path):
    import os

    p = str(tmp_path / "never.wav")
    AudioStreamWriter(p, 24_000).write_file()
    assert not os.path.exists(p)


def test_generate_streaming_audio(tmp_path):
    from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec

    gen = build_generator(test_tiny_spec(), decode_chunk_frames=4)
    out = str(tmp_path / "gen.wav")
    n = generate_streaming_audio(
        gen, "streaming to a file", 1, [], out,
        max_audio_length_ms=480, temperature=0.8, topk=5, chunk_frames=1,
    )
    audio, rate = read_wav_mono(out)
    assert rate == 24_000
    hop = gen._mimi.cfg.hop_length
    assert len(audio) == n and n % hop == 0 or len(audio) % hop == 0
