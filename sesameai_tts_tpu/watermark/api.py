"""Watermark embed/verify surface (reference sesameai/watermarking.py).

``watermark``: resample to 44.1 kHz, embed the 5-byte key at
``message_sdr=36``, resample back (reference watermarking.py:28-40).
``verify``: resample to 44.1 kHz, decode with phase-shift search,
compare message to key (reference watermarking.py:43-59).
``check_audio_from_file`` + CLI: reference watermarking.py:12-17, 62-69.

Two interchangeable backends behind one API:

* **net** (watermark/net.py): JAX port of the silentcipher 44.1 kHz
  encoder/decoder network + torch checkpoint converter — selected when
  ``load_watermarker(ckpt_path=...)`` points at a silentcipher
  checkpoint (or ``SILENTCIPHER_CKPT`` is set).  With the published
  weights this is bit-for-bit the reference's provenance scheme.
* **dsp** (watermark/dsp.py): this framework's self-verifying STFT
  spread-spectrum watermark — the no-weights default in environments
  (like this one) without the silentcipher checkpoint.  Same key/API
  semantics, NOT silentcipher-interoperable (disclosed).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from sesameai_tts_tpu.audio.io import read_wav_mono
from sesameai_tts_tpu.audio.resample import resample
from sesameai_tts_tpu.watermark.dsp import (
    CSM_1B_GH_WATERMARK,
    CSM_1B_WATERMARK,
    WATERMARK_RATE,
    Watermarker,
)
from sesameai_tts_tpu.watermark.dsp import load_watermarker as _load_dsp


def load_watermarker(
    verify_threshold: float = None,
    blind_threshold: float = None,
    ckpt_path: Optional[str] = None,
    hparams: Optional[dict] = None,
):
    """Parity constructor (reference watermarking.py:20-25).

    With a silentcipher checkpoint (``ckpt_path`` argument or the
    ``SILENTCIPHER_CKPT`` env var) this returns the ported learned
    network (watermark/net.py); otherwise the DSP scheme.  Both expose
    ``encode_wav`` / ``decode_wav`` exactly as the reference calls them."""
    ckpt_path = ckpt_path or os.environ.get("SILENTCIPHER_CKPT")
    if ckpt_path:
        from sesameai_tts_tpu.watermark.net import load_silentcipher_checkpoint

        return load_silentcipher_checkpoint(ckpt_path, hparams)
    return _load_dsp(verify_threshold, blind_threshold)


def watermark(
    watermarker,
    audio: np.ndarray,
    sample_rate: int,
    watermark_key: List[int],
    message_sdr: Optional[float] = None,
) -> Tuple[np.ndarray, int]:
    """Embed → resample like the reference (watermarking.py:28-40).

    Strength defaults to the backend's calibration: 36 dB message-SDR
    for the ported silentcipher network (the reference's value,
    watermarking.py:37) and 30 dB for the DSP scheme, which needs ~6 dB
    more embedded energy for reliable verification across signals —
    measured verify-confidence 5.2-6.7 at 30 dB vs a threshold of 4,
    robust to gain changes, 16-bit quantization, resampling and leading
    trims (the decoder re-synchronizes those via an offset × grid-phase
    search)."""
    if message_sdr is None:
        message_sdr = getattr(watermarker, "default_message_sdr", 30.0)
    # the backend's operating rate: 44.1 kHz for the DSP scheme and the
    # published silentcipher model, but converted checkpoints may carry
    # a different hparams sample_rate (silentcipher also ships 16 kHz)
    wm_rate = getattr(getattr(watermarker, "cfg", None), "sample_rate",
                      WATERMARK_RATE)
    audio_wm = resample(audio, sample_rate, wm_rate)
    encoded, _ = watermarker.encode_wav(
        audio_wm, wm_rate, watermark_key, calc_sdr=False, message_sdr=message_sdr
    )
    output_sample_rate = min(wm_rate, sample_rate)
    encoded = resample(encoded, wm_rate, output_sample_rate)
    return encoded, output_sample_rate


def verify(
    watermarker,
    watermarked_audio: np.ndarray,
    sample_rate: int,
    watermark_key: List[int],
) -> bool:
    wm_rate = getattr(getattr(watermarker, "cfg", None), "sample_rate",
                      WATERMARK_RATE)
    audio_wm = resample(watermarked_audio, sample_rate, wm_rate)
    result = watermarker.decode_wav(
        audio_wm, wm_rate, phase_shift_decoding=True,
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
