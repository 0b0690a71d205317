"""Robustness/edge-case tier: watermark under channel perturbations,
tokenizer unicode handling, generator degenerate inputs, codec edges."""

import numpy as np
import pytest

from sesameai_tts_tpu.watermark.api import CSM_1B_WATERMARK, load_watermarker, verify
from sesameai_tts_tpu.watermark.dsp import WATERMARK_RATE


def _speechlike(seconds, rate, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * rate)
    from scipy.signal import lfilter

    x = lfilter([1.0], [1.0, -0.95], rng.normal(size=n)).astype(np.float32)
    t = np.arange(n) / rate
    x *= (0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 1.7 * t))).astype(np.float32)
    return (0.3 * x / np.abs(x).max()).astype(np.float32)


@pytest.fixture(scope="module")
def marked():
    wm = load_watermarker()
    audio = _speechlike(3.0, WATERMARK_RATE, seed=42)
    enc, _ = wm.encode_wav(audio, WATERMARK_RATE, CSM_1B_WATERMARK, message_sdr=30.0)
    return wm, enc


def test_watermark_survives_gain_change(marked):
    wm, enc = marked
    assert verify(wm, enc * 0.3, WATERMARK_RATE, CSM_1B_WATERMARK)
    assert verify(wm, np.clip(enc * 2.0, -1, 1), WATERMARK_RATE, CSM_1B_WATERMARK)


def test_watermark_survives_16bit_quantization(marked):
    wm, enc = marked
    pcm = np.round(np.clip(enc, -1, 1) * 32767) / 32767
    assert verify(wm, pcm.astype(np.float32), WATERMARK_RATE, CSM_1B_WATERMARK)


def test_watermark_survives_trimming(marked):
    """Leading trims desynchronize the chip-block grid only modulo its
    time period: the offset × row-phase search in decode_wav re-locks it
    (reference silentcipher's learned decoder is shift-tolerant,
    watermarking.py:43-59)."""
    wm, enc = marked
    assert verify(wm, enc, WATERMARK_RATE, CSM_1B_WATERMARK)
    for trim_s in (0.5, 1.33):
        trimmed = enc[int(trim_s * WATERMARK_RATE):]
        assert verify(wm, trimmed, WATERMARK_RATE, CSM_1B_WATERMARK), (
            f"lost watermark after {trim_s}s leading trim"
        )


def test_watermark_rejects_noise(marked):
    wm, _ = marked
    noise = np.random.default_rng(9).normal(size=3 * WATERMARK_RATE).astype(np.float32)
    assert not verify(wm, noise * 0.1, WATERMARK_RATE, CSM_1B_WATERMARK)


# ---------------------------------------------------------------------------
# tokenizer unicode
# ---------------------------------------------------------------------------


def test_byte_tokenizer_unicode_roundtrip():
    from sesameai_tts_tpu.tokenizer.text import ByteTokenizer

    t = ByteTokenizer()
    for text in ["héllo wörld", "日本語テスト", "emoji 🎤 test", "mixed ASCII+日本"]:
        assert t.decode(t.encode(text)) == text


def test_native_bpe_unicode_matches_rust(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=380,
        special_tokens=["<|begin_of_text|>", "<|end_of_text|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(["héllo wörld 日本語 🎤 test"] * 30, trainer)
    path = str(tmp_path / "tok.json")
    tok.save(path)

    from sesameai_tts_tpu.tokenizer.native_bpe import NativeBPETokenizer

    native = NativeBPETokenizer(path)
    for text in ["héllo wörld", "日本語", "🎤 emoji", "unseen ünïcode"]:
        expected = tok.encode(text, add_special_tokens=False).ids
        assert native.encode(text)[1:-1] == expected, text


# ---------------------------------------------------------------------------
# generator degenerate inputs
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gen():
    from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec

    return build_generator(test_tiny_spec(), decode_chunk_frames=4)


def test_empty_text_still_generates(gen):
    audio = gen.generate("", 1, [], max_audio_length_ms=240, temperature=0.8, topk=5)
    assert audio.dtype == np.float32  # BOS/EOS rows alone form a valid prompt


def test_zero_budget(gen):
    audio = gen.generate("hi", 1, [], max_audio_length_ms=80, temperature=0.8, topk=5)
    hop = gen._mimi.cfg.hop_length
    assert audio.shape[0] <= hop  # at most the prefill frame


def test_negative_speaker_id(gen):
    audio = gen.generate("speaker test", -1, [], max_audio_length_ms=240,
                         temperature=0.8, topk=5)
    assert audio.dtype == np.float32


# ---------------------------------------------------------------------------
# codec edges
# ---------------------------------------------------------------------------


def test_mimi_silence_roundtrip():
    import jax
    import jax.numpy as jnp

    from sesameai_tts_tpu.codec.mimi import Mimi, mimi_test_tiny

    m = Mimi(mimi_test_tiny())
    params = m.init(jax.random.PRNGKey(0))
    hop = m.cfg.hop_length
    silence = jnp.zeros((1, 1, 4 * hop))
    codes = m.encode(params, silence)
    out = m.decode(params, codes)
    assert out.shape == (1, 1, 4 * hop)
    assert np.isfinite(np.asarray(out)).all()


def test_mimi_single_frame():
    import jax
    import jax.numpy as jnp

    from sesameai_tts_tpu.codec.mimi import Mimi, mimi_test_tiny

    m = Mimi(mimi_test_tiny())
    params = m.init(jax.random.PRNGKey(0))
    codes = jnp.ones((1, m.cfg.num_codebooks, 1), jnp.int32)
    out = m.decode(params, codes)
    assert out.shape == (1, 1, m.cfg.hop_length)
