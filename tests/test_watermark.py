"""Watermark: embed→verify round trip is the acceptance gate
(SURVEY.md §7 hard-parts list; semantics from reference
watermarking.py:28-59)."""

import numpy as np
import pytest

from sesameai_tts_tpu.watermark.api import (
    CSM_1B_WATERMARK,
    load_watermarker,
    verify,
    watermark,
)
from sesameai_tts_tpu.watermark.dsp import WATERMARK_RATE


def _speechlike(seconds: float, rate: int, seed=0) -> np.ndarray:
    """Colored noise with formant-ish resonances + pauses."""
    rng = np.random.default_rng(seed)
    n = int(seconds * rate)
    x = rng.normal(size=n).astype(np.float32)
    # crude 1/f shaping via cumulative smoothing
    from scipy.signal import lfilter

    x = lfilter([1.0], [1.0, -0.95], x).astype(np.float32)
    t = np.arange(n) / rate
    envelope = (0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 1.7 * t))).astype(np.float32)
    x = x * envelope
    return (0.3 * x / np.abs(x).max()).astype(np.float32)


@pytest.fixture(scope="module")
def wm():
    return load_watermarker()


def test_embed_verify_roundtrip_44k(wm):
    audio = _speechlike(3.0, WATERMARK_RATE)
    encoded, _ = wm.encode_wav(audio, WATERMARK_RATE, CSM_1B_WATERMARK, message_sdr=36.0)
    res = wm.decode_wav(
        encoded, WATERMARK_RATE, phase_shift_decoding=True,
        expected_message=CSM_1B_WATERMARK,
    )
    assert res["status"], f"confidence {res['confidence']}"
    assert res["messages"][0] == CSM_1B_WATERMARK


def test_blind_decode_recovers_message(wm):
    """Without the expected key, blind CDMA decode still recovers the
    bytes at a stronger embed / longer clip."""
    audio = _speechlike(6.0, WATERMARK_RATE, seed=5)
    encoded, _ = wm.encode_wav(audio, WATERMARK_RATE, CSM_1B_WATERMARK, message_sdr=27.0)
    res = wm.decode_wav(encoded, WATERMARK_RATE, phase_shift_decoding=True)
    assert res["status"], f"confidence {res['confidence']}"
    assert res["messages"][0] == CSM_1B_WATERMARK


def test_embed_is_subtle(wm):
    audio = _speechlike(2.0, WATERMARK_RATE)
    encoded, sdr = wm.encode_wav(
        audio, WATERMARK_RATE, CSM_1B_WATERMARK, calc_sdr=True, message_sdr=36.0
    )
    assert encoded.shape == audio.shape
    assert sdr > 25.0, f"watermark too loud: SDR {sdr} dB"


def test_unwatermarked_audio_rejected(wm):
    audio = _speechlike(3.0, WATERMARK_RATE, seed=7)
    res = wm.decode_wav(audio, WATERMARK_RATE, phase_shift_decoding=True)
    assert not res["status"] or res["messages"][0] != CSM_1B_WATERMARK


def test_wrong_key_rejected(wm):
    audio = _speechlike(3.0, WATERMARK_RATE, seed=3)
    encoded, _ = wm.encode_wav(audio, WATERMARK_RATE, [1, 2, 3, 4, 5])
    assert not verify(wm, encoded, WATERMARK_RATE, CSM_1B_WATERMARK)


def test_full_pipeline_24k_resample_roundtrip(wm):
    """The production path: 24 kHz audio → watermark (44.1k inside) →
    back to 24 kHz → verify (reference watermarking.py:35-39 +
    tts_service.py:250-257)."""
    audio_24k = _speechlike(3.0, 24_000, seed=11)
    marked, out_rate = watermark(wm, audio_24k, 24_000, CSM_1B_WATERMARK)
    assert out_rate == 24_000
    assert verify(wm, marked, out_rate, CSM_1B_WATERMARK)
