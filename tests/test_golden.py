"""Golden-artifact witness (SURVEY.md §4: the reference commits
output.wav at its repo root as an informal "it produced audio" witness,
reference tts_service.py:537).  Here the witness is load-bearing: a
seeded test-tiny synthesis committed at tests/golden/ and re-generated
by the suite, pinning the WHOLE service pipeline end to end — tokenizer,
prefill/decode numerics, sampler keys, Mimi decode, clip
normalize/pad/fade, and the WAV writer.  Generated under the exact test
config (CPU, matmul precision "highest" — see conftest.py): regenerate
with tests/golden/regen.py if an INTENTIONAL numerics change lands.
"""

import os

import numpy as np
import pytest

from sesameai_tts_tpu.audio.io import read_wav
from sesameai_tts_tpu.runtime.loader import test_tiny_spec as _tiny_spec
from sesameai_tts_tpu.service.tts import TTS

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_seed123.wav")
TEXT = "The quick brown fox jumps over the lazy dog."


@pytest.fixture(scope="module")
def tts():
    t = TTS(spec=_tiny_spec(), enable_watermark=False)
    t.load_model()
    return t


def test_golden_witness_reproduces(tts, tmp_path):
    out = str(tmp_path / "regen.wav")
    tts.export_wav(TEXT, out, seed=123)

    got, sr_got = read_wav(out)
    want, sr_want = read_wav(GOLDEN)
    assert sr_got == sr_want == 24_000
    assert got.shape == want.shape, (
        f"golden length changed: {want.shape} -> {got.shape} — a seeded "
        f"generation took a different trajectory (sampler, prefill, or "
        f"frame-layout change)"
    )
    # s16 WAV: allow 2 quantization steps of slack for float jitter;
    # anything larger is a real numerics change
    diff = np.max(np.abs(got.astype(np.float64) - want.astype(np.float64)))
    assert diff <= 2.0 / 32768.0, f"golden audio diverged: max diff {diff}"


def test_seed_repeatable_via_service_layer(tts, tmp_path):
    a, b = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    tts.export_wav(TEXT, a, seed=7)
    tts.export_wav(TEXT, b, seed=7)
    wa, _ = read_wav(a)
    wb, _ = read_wav(b)
    np.testing.assert_array_equal(wa, wb)

    tts.export_wav(TEXT, b, seed=8)
    wc, _ = read_wav(b)
    assert wa.shape != wc.shape or np.max(np.abs(wa - wc)) > 0
