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


class StreamingResampler:
    """Stateful polyphase resampler: feed() chunks, get settled output.

    Produces BIT-IDENTICAL samples to the offline ``resample`` of the
    concatenated input (same filter, same centering): output j is
    ``conv(taps, zero-stuffed x)[j*down + half]`` and is emitted only
    once every input sample its filter support touches has arrived.
    Replaces the per-group resample calls in streaming pipelines, whose
    independent edge paddings put discontinuities at group boundaries.

    Latency: ``half/up`` input samples (~1 ms at the watermark rates).
    """

    def __init__(self, orig_rate: int, new_rate: int):
        assert orig_rate != new_rate
        self.up, self.down, self.taps = _resample_plan(orig_rate, new_rate)
        self._taps64 = self.taps.astype(np.float64)
        self.L = len(self.taps)
        self.half = (self.L - 1) // 2
        self._buf = np.zeros(0, np.float64)
        self._start = 0  # absolute input index of _buf[0]
        self._j = 0  # next output index
        self._n_in = 0

    def feed(self, x: np.ndarray) -> np.ndarray:
        """Append input samples; return all newly-settled output samples."""
        self._buf = np.concatenate([self._buf, np.asarray(x, np.float64)])
        self._n_in += len(x)
        # settled: j*down + half < up*n_in (no future input touches them)
        j_end = (self.up * self._n_in - self.half - 1) // self.down + 1
        return self._drain(j_end)

    def close(self) -> np.ndarray:
        """Flush: return the tail, completing ceil(n_in*up/down) outputs
        (the offline ``resample`` length)."""
        return self._drain(-(-self._n_in * self.up // self.down))

    def _drain(self, j_end: int) -> np.ndarray:
        from scipy.signal import upfirdn

        if j_end <= self._j:
            return np.zeros(0, np.float32)
        # drop input no output ≥ j still needs
        lo = max(0, (self._j * self.down + self.half - self.L + 1) // self.up)
        if lo > self._start:
            self._buf = self._buf[lo - self._start:]
            self._start = lo
        z = upfirdn(self._taps64, self._buf, self.up, 1)
        m = np.arange(self._j, j_end) * self.down + self.half - self.up * self._start
        out = np.zeros(j_end - self._j)
        ok = (m >= 0) & (m < len(z))
        out[ok] = z[m[ok]]
        self._j = j_end
        return out.astype(np.float32)
