"""Metrics/profiling utilities + Generator stage timing."""

import time

import numpy as np

from sesameai_tts_tpu.utils.profiling import Metrics, RTFMeter


def test_metrics_aggregation():
    m = Metrics()
    for v in [0.1, 0.2, 0.3]:
        m.record("stage", v)
    with m.timer("timed"):
        time.sleep(0.01)
    s = m.summary()
    assert s["stage"]["count"] == 3
    assert abs(s["stage"]["mean"] - 0.2) < 1e-9
    assert s["timed"]["count"] == 1 and s["timed"]["p50"] >= 0.01
    m.reset()
    assert m.summary() == {}


def test_rtf_meter():
    meter = RTFMeter(sample_rate=24_000)
    time.sleep(0.01)
    meter.on_chunk(np.zeros(24_000, np.float32))  # 1 s of audio
    r = meter.result()
    assert r["audio_s"] == 1.0
    assert r["first_audio_ms"] >= 10.0
    assert r["rtf"] > 0 and r["xrt"] > 0
