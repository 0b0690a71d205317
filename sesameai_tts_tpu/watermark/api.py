"""Watermark embed/verify surface (reference sesameai/watermarking.py).

``watermark``: resample to 44.1 kHz, embed the 5-byte key at
``message_sdr=36``, resample back (reference watermarking.py:28-40).
``verify``: resample to 44.1 kHz, decode with phase-shift search,
compare message to key (reference watermarking.py:43-59).
``check_audio_from_file`` + CLI: reference watermarking.py:12-17, 62-69.

**Interoperability caveat**: the underlying scheme (watermark/dsp.py) is
this framework's own STFT spread-spectrum watermark, NOT the learned
silentcipher model — audio marked here is not detectable by
silentcipher-based verifiers and vice versa.  API and key semantics
match, so swapping in a converted silentcipher model later changes no
call sites.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from sesameai_tts_tpu.audio.io import read_wav_mono
from sesameai_tts_tpu.audio.resample import resample
from sesameai_tts_tpu.watermark.dsp import (
    CSM_1B_GH_WATERMARK,
    CSM_1B_WATERMARK,
    WATERMARK_RATE,
    Watermarker,
    load_watermarker,
)


def watermark(
    watermarker: Watermarker,
    audio: np.ndarray,
    sample_rate: int,
    watermark_key: List[int],
    message_sdr: float = 30.0,
) -> Tuple[np.ndarray, int]:
    """Embed → resample like the reference (watermarking.py:28-40).

    Default strength is 30 dB message-SDR (the reference's learned
    silentcipher runs at 36 dB; this framework's DSP watermark needs
    ~6 dB more energy for reliable verification across signals —
    measured verify-confidence 5.2-6.7 at 30 dB vs a threshold of 4,
    robust to gain changes, 16-bit quantization, resampling and leading
    trims, which the decoder re-synchronizes via an offset × grid-phase
    search).  Not silentcipher-compatible — see the module docstring."""
    audio_44k = resample(audio, sample_rate, WATERMARK_RATE)
    encoded, _ = watermarker.encode_wav(
        audio_44k, WATERMARK_RATE, watermark_key, calc_sdr=False, message_sdr=message_sdr
    )
    output_sample_rate = min(WATERMARK_RATE, sample_rate)
    encoded = resample(encoded, WATERMARK_RATE, output_sample_rate)
    return encoded, output_sample_rate


def verify(
    watermarker: Watermarker,
    watermarked_audio: np.ndarray,
    sample_rate: int,
    watermark_key: List[int],
) -> bool:
    audio_44k = resample(watermarked_audio, sample_rate, WATERMARK_RATE)
    result = watermarker.decode_wav(
        audio_44k, WATERMARK_RATE, phase_shift_decoding=True,
        expected_message=watermark_key,
    )
    is_watermarked = result["status"]
    if is_watermarked:
        is_csm_watermarked = result["messages"][0] == watermark_key
    else:
        is_csm_watermarked = False
    return bool(is_watermarked and is_csm_watermarked)


def check_audio_from_file(audio_path: str) -> bool:
    watermarker = load_watermarker()
    audio, sample_rate = read_wav_mono(audio_path)
    is_watermarked = verify(watermarker, audio, sample_rate, CSM_1B_WATERMARK)
    outcome = "Watermarked" if is_watermarked else "Not watermarked"
    print(f"{outcome}: {audio_path}")
    return is_watermarked


def cli_check_audio() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--audio_path", type=str, required=True)
    args = parser.parse_args()
    check_audio_from_file(args.audio_path)


if __name__ == "__main__":
    cli_check_audio()
