"""Polyphase resampling — host (numpy) and on-device (XLA) variants.

Replaces ``torchaudio.functional.resample`` (reference
tts_service.py:164, watermarking.py:35-39, 50): kaiser-windowed-sinc
polyphase at the reduced rational ratio.  The XLA variant expresses the
polyphase filterbank as one strided convolution so the 24 k↔44.1 k hops
of the watermark path stay on-chip (SURVEY.md C-N3/C-N6 plan).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np


def _design_filter(up: int, down: int, num_zeros: int = 24, beta: float = 9.90322):
    """Kaiser-windowed sinc lowpass at cutoff min(1/up, 1/down)."""
    max_rate = max(up, down)
    cutoff = 0.5 / max_rate  # normalized to the upsampled rate
    half_len = num_zeros * max_rate
    n = np.arange(-half_len, half_len + 1, dtype=np.float64)
    taps = 2 * cutoff * np.sinc(2 * cutoff * n) * np.kaiser(len(n), beta)
    return (taps * up).astype(np.float32)


@lru_cache(maxsize=64)
def _resample_plan(orig_rate: int, new_rate: int):
    g = math.gcd(orig_rate, new_rate)
    up, down = new_rate // g, orig_rate // g
    return up, down, _design_filter(up, down)


def resample(x: np.ndarray, orig_rate: int, new_rate: int) -> np.ndarray:
    """(T,) float32 → resampled (ceil(T*new/orig),) float32."""
    if orig_rate == new_rate:
        return x
    up, down, taps = _resample_plan(orig_rate, new_rate)
    from scipy.signal import resample_poly

    return resample_poly(x.astype(np.float64), up, down, window=taps / up).astype(
        np.float32
    )


def resample_jax(x, orig_rate: int, new_rate: int):
    """On-device polyphase resample: (..., T) → (..., ceil(T*up/down)).

    Implemented as upsample-by-zero-stuffing expressed through a strided
    ``conv_general_dilated`` with lhs_dilation=up — one XLA conv, no
    host round-trip (used by the watermark embed path).
    """
    import jax.numpy as jnp
    from jax import lax

    if orig_rate == new_rate:
        return x
    up, down, taps = _resample_plan(orig_rate, new_rate)
    T = x.shape[-1]
    out_len = -(-T * up // down)  # ceil
    half = (len(taps) - 1) // 2

    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, 1, T)).astype(jnp.float32)
    w = jnp.asarray(taps, jnp.float32)[None, None, :]
    y = lax.conv_general_dilated(
        xb,
        w,
        window_strides=(down,),
        padding=[(half, half + down * out_len - T * up + up - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y[:, 0, :out_len].reshape(batch_shape + (out_len,))
