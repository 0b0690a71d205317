"""Batched serving engine: concurrent sessions share one batched decode
(BASELINE config 5 — the reference has no equivalent)."""

import numpy as np
import pytest

from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec as tiny_spec
from sesameai_tts_tpu.runtime.serving import BatchedTTSServer


@pytest.fixture(scope="module")
def server():
    gen = build_generator(tiny_spec(), decode_chunk_frames=4)
    srv = BatchedTTSServer(gen, slots=2, chunk_frames=4)
    srv.start()
    yield srv
    srv.stop()


def test_concurrent_sessions_complete(server):
    hop = server.gen._mimi.cfg.hop_length
    sessions = [
        server.submit(f"session number {i} speaking", speaker=i % 2,
                      max_audio_length_ms=480, temperature=0.8, topk=5)
        for i in range(3)  # 3 sessions > 2 slots → queueing exercised
    ]
    for s in sessions:
        audio = s.audio(timeout=300)
        assert audio.dtype == np.float32
        assert audio.shape[0] % hop == 0
        total_frames = sum(f.shape[0] for f in s.frames_out)
        assert audio.shape[0] == total_frames * hop


def test_session_error_propagates(server):
    s = server.submit("x " * 3000, max_audio_length_ms=480)  # too long
    with pytest.raises(ValueError, match="Inputs too long"):
        s.audio(timeout=120)
