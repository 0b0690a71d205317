"""Audio host library: WAV I/O, resampling (scipy vs C++ vs XLA), clip ops."""

import numpy as np
import pytest

from sesameai_tts_tpu.audio.io import read_wav, read_wav_mono, write_wav
from sesameai_tts_tpu.audio.resample import resample, resample_jax
from sesameai_tts_tpu.audio.segment import AudioClip


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=24_000) * 0.3).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 24_000)
    y, rate = read_wav(p)
    assert rate == 24_000 and y.shape == (1, 24_000)
    np.testing.assert_allclose(y[0], x, atol=1.5 / 32767)


def test_wav_stereo_monoize(tmp_path):
    x = np.stack([np.ones(100, np.float32) * 0.5, -np.ones(100, np.float32) * 0.5])
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 44_100)
    mono, rate = read_wav_mono(p)
    assert rate == 44_100
    np.testing.assert_allclose(mono, 0.0, atol=1e-3)


def test_resample_tone_preserved():
    """A 1 kHz tone must survive 24k→44.1k→24k with its frequency intact."""
    sr = 24_000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, 24_000, 44_100)
    assert abs(len(y) - 44_100) <= 1
    z = resample(y, 44_100, 24_000)
    # compare interior (filter edges excluded)
    a, b = x[2000:-2000], z[2000 : len(x) - 2000]
    assert np.corrcoef(a, b[: len(a)])[0, 1] > 0.999


def test_resample_jax_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=4800).astype(np.float32) * 0.3
    ref = resample(x, 24_000, 44_100)
    jx = np.asarray(resample_jax(x, 24_000, 44_100))
    assert jx.shape == ref.shape
    np.testing.assert_allclose(jx[100:-100], ref[100:-100], atol=5e-4)


def test_read_wav_extensible_float32(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) with an IEEE-float SubFormat — the
    common DAW/sox float export — must decode as float, not be
    reinterpreted as int32 garbage."""
    import struct

    x = (np.sin(np.arange(480) / 10.0) * 0.5).astype(np.float32)
    data = x.tobytes()
    # fmt chunk: extensible (40 bytes) with SubFormat GUID for IEEE float
    guid = struct.pack("<H", 3) + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 24_000, 24_000 * 4, 4, 32)
    # cbSize=22, validBitsPerSample=32, channelMask — SubFormat at offset 24
    fmt += struct.pack("<HHI", 22, 32, 0x4) + guid
    riff = b"WAVE"
    riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    p = tmp_path / "ext_f32.wav"
    p.write_bytes(blob)

    from sesameai_tts_tpu.audio.io import read_wav

    y, rate = read_wav(str(p))
    assert rate == 24_000
    np.testing.assert_array_equal(y[0], x)


def test_native_resample_matches_scipy():
    from sesameai_tts_tpu.audio import native

    if not native.available():
        pytest.skip("native audio lib unavailable")
    rng = np.random.default_rng(2)
    x = rng.normal(size=4800).astype(np.float32) * 0.3
    ref = resample(x, 24_000, 44_100)
    nat = native.resample_native(x, 24_000, 44_100)
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat[100:-100], ref[100:-100], atol=5e-4)


def test_native_helpers():
    from sesameai_tts_tpu.audio import native

    if not native.available():
        pytest.skip("native audio lib unavailable")
    x = np.ones(1000, np.float32) * 0.5
    y = native.fade_inplace(x.copy(), 100, 100)
    assert y[0] == 0.0 and abs(y[500] - 0.5) < 1e-6
    i16 = native.to_int16(np.array([0.0, 1.0, -1.0, 2.0], np.float32))
    assert list(i16) == [0, 32767, -32767, 32767]
    z = native.peak_normalize_inplace(np.array([0.25, -0.5], np.float32), 1.0)
    np.testing.assert_allclose(z, [0.5, -1.0], atol=1e-6)


def test_native_fade_and_int16_sample_exact_vs_numpy():
    """The native helpers promise SAMPLE-EXACT parity with AudioClip:
    fade ramps hit both linspace endpoints and int16 truncates like
    ndarray.astype — a pipeline may switch backends without bitwise
    drift."""
    from sesameai_tts_tpu.audio import native

    if not native.available():
        pytest.skip("native audio lib unavailable")
    rng = np.random.default_rng(5)
    x = (rng.normal(size=2400) * 0.4).astype(np.float32)
    sr = 24_000
    ms = 10.0  # 240 samples
    clip = AudioClip.from_float(x.copy(), sr).fade_in(ms).fade_out(ms)
    n = int(ms / 1000.0 * sr)
    nat = native.fade_inplace(x.copy(), n, n)
    np.testing.assert_array_equal(nat, clip.samples)

    y = (rng.normal(size=1000) * 1.2).astype(np.float32)  # some clipping
    np.testing.assert_array_equal(
        native.to_int16(y.copy()), AudioClip.from_float(y, sr).to_int16()
    )


def test_clip_ops():
    clip = AudioClip.from_float(np.ones(2400, np.float32) * 0.5, 24_000)
    assert clip.duration_seconds == pytest.approx(0.1)
    assert len(clip) == 100  # ms
    padded = clip.pad(50, 25)
    assert len(padded) == 175
    faded = padded.fade_in(10).fade_out(10)
    assert faded.samples[0] == 0.0
    two = clip + clip
    assert len(two) == 200
    norm = AudioClip.from_float(np.array([0.25, -0.25], np.float32), 24_000).normalize()
    assert abs(norm.samples).max() == pytest.approx(1.0)


def test_clip_speedup():
    clip = AudioClip.from_float(np.random.default_rng(0).normal(size=48_000).astype(np.float32), 24_000)
    fast = clip.speedup(1.3)
    assert len(fast.samples) < len(clip.samples)
    assert len(fast.samples) > len(clip.samples) / 1.6
