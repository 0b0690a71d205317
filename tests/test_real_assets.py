"""Real voice-asset integration: the reference checkout in this
environment ships the actual maya/melina voice WAVs (reference
``samples.py`` + ``wav/``), so the voice-cloning input path — samples.py
registry reflection, real 44.1k/24k/22.05k mono s16 WAV decode,
resample-to-codec-rate, Mimi encode, context build — runs on REAL
recorded speech here, not synthetic noise (SURVEY.md C11/C12; reference
tts_service.py:37-42, 105-139).

Skipped wholesale when no reference checkout is present.
"""

import json
import os

import numpy as np
import pytest

from sesameai_tts_tpu.audio.io import read_wav_mono
from sesameai_tts_tpu.runtime.loader import test_tiny_spec as tiny_spec
from sesameai_tts_tpu.service.tts import TTS
from sesameai_tts_tpu.service.voices import load_registry

REF = os.environ.get("SESAME_TTS_REFERENCE", "/root/reference")
SAMPLES = os.path.join(REF, "samples.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SAMPLES), reason="no reference checkout with voice assets"
)


def test_reference_samples_module_loads_from_anywhere():
    # the reference registry uses paths relative to its repo root
    # (samples.py:4); our loader must resolve them against the module dir
    reg = load_registry(SAMPLES)
    assert {"maya", "melina"} <= set(reg)
    assert len(reg["maya"]) == 4
    for voice in ("maya", "melina"):
        for path, transcript in reg[voice].items():
            assert os.path.isabs(path)
            assert os.path.exists(path), path
            assert transcript.strip()


def test_env_var_registry_source(monkeypatch):
    monkeypatch.setenv("SESAME_TTS_VOICES", SAMPLES)
    monkeypatch.chdir("/tmp")  # no ./samples.py or ./voices here
    reg = load_registry(None)
    assert "maya" in reg


def test_real_wav_decode_and_resample():
    # 44.1 kHz mono s16, 15.0 s — the resample-on-load path
    # (reference tts_service.py:141-168)
    path = os.path.join(REF, "wav", "crab-story", "mono_2.wav")
    wav, sr = read_wav_mono(path, 24_000)
    assert sr == 24_000
    assert wav.dtype == np.float32
    assert abs(len(wav) / 24_000 - 15.0) < 0.1
    assert np.all(np.isfinite(wav))
    peak = float(np.max(np.abs(wav)))
    assert 0.05 < peak <= 1.0  # real speech, not silence or clipping junk

    # 24 kHz native clip: no resample, duration preserved exactly
    path24 = os.path.join(REF, "wav", "melina", "melina-02.wav")
    wav24, _ = read_wav_mono(path24, 24_000)
    raw, src = read_wav_mono(path24, None)
    assert src == 24_000 and len(wav24) == len(raw)


@pytest.fixture(scope="module")
def real_voice_tts(tmp_path_factory):
    # shortest real clip (22.05 kHz, 1.4 s) keeps tiny-codec encode cheap
    clip = os.path.join(REF, "wav", "crab-story", "split", "wherewasi.wav")
    reg = tmp_path_factory.mktemp("reg") / "voices.json"
    reg.write_text(json.dumps({"maya-split": {clip: "Alright, where was I?"}}))
    engine = TTS(spec=tiny_spec(), voices=str(reg), enable_watermark=False)
    engine.load_model()
    engine.load_voice("maya-split", warmup=False)
    return engine


def test_voice_clone_context_from_real_speech(real_voice_tts):
    # context frames built from real audio: text rows + Mimi-coded rows
    state, length = real_voice_tts.cached_context
    assert length > 0
    assert int(state.pos[0]) == length


def test_generate_conditioned_on_real_voice(real_voice_tts):
    audio = real_voice_tts.generate_with_context(
        "Hello there.", max_audio_length_ms=480, temperature=0.8, topk=5
    )
    assert audio.dtype == np.float32
    assert np.all(np.isfinite(audio))


def test_load_voice_real_57s_clip(caplog):
    """The melina voice is ONE 57 s clip — far past the tiny codec's
    encode window.  load_voice must tail-trim the clip (then the frames)
    and serve, not crash in Mimi.encode (found driving the CLI against
    the reference registry)."""
    import logging as _logging

    engine = TTS(spec=tiny_spec(), voices=SAMPLES, enable_watermark=False)
    engine.load_model()
    with caplog.at_level(_logging.WARNING, "sesameai_tts_tpu.service.tts"):
        engine.load_voice("melina", warmup=False)
    assert any("encode window" in r.message for r in caplog.records)
    state, length = engine.cached_context
    assert 0 < length <= engine.generator.context_budget
    audio = engine.generate_with_context(
        "hi", max_audio_length_ms=480, temperature=0.8, topk=5
    )
    assert np.all(np.isfinite(audio))


def test_watermark_real_speech_production_path():
    """Embed→verify on REAL recorded speech at the default strength
    through the production channel (24 kHz round trip, reference
    watermarking.py:35-39): the synthetic 'speechlike' fixtures
    approximate this — real speech with actual pauses/formants is the
    content the robustness claims are about."""
    from sesameai_tts_tpu.watermark.api import (
        CSM_1B_WATERMARK, load_watermarker, verify, watermark,
    )

    wav, sr = read_wav_mono(
        os.path.join(REF, "wav", "crab-story", "mono_2.wav"), 24_000
    )
    wav = wav[: 10 * 24_000]
    wm = load_watermarker()
    marked, out_rate = watermark(wm, wav, 24_000, CSM_1B_WATERMARK)
    assert out_rate == 24_000
    # 16-bit export (the WAV files actually shipped) must still verify
    pcm16 = (np.clip(np.round(marked * 32767), -32768, 32767) / 32767
             ).astype(np.float32)
    assert verify(wm, pcm16, out_rate, CSM_1B_WATERMARK)
    # and the unmarked original must not
    assert not verify(wm, wav, 24_000, CSM_1B_WATERMARK)


def test_mimi_oracle_on_real_speech():
    """Tiny-config codec oracle (tests/test_mimi_oracle.py) re-run on
    real speech: encode codes bit-exact vs torch MimiModel on content
    with actual spectral structure, where RVQ argmin ties behave
    differently than on white noise."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from safetensors.numpy import save_file
    from test_mimi_oracle import _tiny_hf_mimi

    from sesameai_tts_tpu.codec.mimi import Mimi, mimi_test_tiny
    from sesameai_tts_tpu.core.weights import load_mimi_checkpoint

    wav, _ = read_wav_mono(
        os.path.join(REF, "wav", "crab-story", "split", "wherewasi.wav"), 24_000
    )
    wav = wav[: (len(wav) // 48) * 48]  # tiny hop = 48

    hf = _tiny_hf_mimi()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "hf_tiny.safetensors")
        save_file({k: v.detach().numpy() for k, v in hf.state_dict().items()},
                  path)
        mine = Mimi(mimi_test_tiny())
        params = load_mimi_checkpoint(path, mine)

    with torch.no_grad():
        codes_t = hf.encode(torch.from_numpy(wav)[None, None]).audio_codes
    codes_j = np.asarray(mine.encode(params, jnp.asarray(wav)[None, None]))
    np.testing.assert_array_equal(codes_j[0], codes_t.numpy()[0])
