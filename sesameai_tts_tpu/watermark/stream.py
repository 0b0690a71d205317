"""Streaming watermark embedding: low-latency provenance for PCM streams.

The offline embed (watermark/dsp.py) marks a whole clip at once, which
forced the HTTP streaming surface to buffer ≥4 s groups so every flush
carried a verifiable mark — turning an 80 ms-granular engine into ~0.5 s
first-byte wall time, with per-group resampler edge effects at every
boundary.  This module streams the SAME spread-spectrum scheme
incrementally:

* ``StreamingResampler`` (audio/resample.py) converts 24 k↔44.1 k with
  bit-identical output to the offline ``resample`` — no group edges;
* ``StreamingEmbedder`` runs the STFT chip embedding frame-by-frame with
  a 4-frame lookahead, so the emitted stream is one CONTINUOUS watermark
  grid: any prefix a verifier captures is the same signal the offline
  embedder would have produced for that prefix (same grid phase, same
  OLA normalization), and every ≥4 s prefix verifies;
* ``StreamingWatermarker`` chains resample → embed → resample for the
  service layer (feed 24 kHz PCM chunks, get 24 kHz watermarked PCM).

Pipeline latency is ~95 ms of audio (4-frame lookahead + one STFT
window + resampler half-filters), vs 4 s for group mode.  The embedder
is pure numpy ON PURPOSE: blocks are ~µs of host FFT work, while
routing them through the remote-attached TPU would cost a ~30 ms round
trip per 186 ms block.

Role parity: reference sesameai/watermarking.py:28-40 (watermark()) —
the reference has no streaming watermark path at all (its streaming
surfaces emit unwatermarked audio); this is framework-added capability.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from sesameai_tts_tpu.audio.resample import StreamingResampler
from sesameai_tts_tpu.watermark.dsp import (
    _BIN_HI,
    _BIN_LO,
    _EDGE_FRAMES,
    _BLOCK_F,
    _BLOCK_T,
    _prn,
    HOP,
    N_BYTES,
    N_CODES,
    N_FFT,
    P_TIME,
    WATERMARK_RATE,
    Watermarker,
)

_FR = 4  # frames per processing block (multiple of _BLOCK_T; small so the
#          first marked samples emerge after ~130 ms of input — numpy FFT
#          on 4×2048 is ~µs, so block granularity costs nothing)
_LOOKAHEAD = _EDGE_FRAMES  # frames of lookahead so feed() never marks a
#                            frame that could end up in the final 4


def _chip_signs_np(message: np.ndarray, f0: int, frames: int) -> np.ndarray:
    """±1 chips for absolute frames [f0, f0+frames) — numpy port of
    dsp._chip_signs/_grid with an absolute frame offset (the grid is
    time-periodic, so a stream marked block-by-block at the right offset
    is indistinguishable from one offline embed)."""
    nbins = _BIN_HI - _BIN_LO
    nbf = (nbins + _BLOCK_F - 1) // _BLOCK_F
    bt = ((f0 + np.arange(frames))[:, None] // _BLOCK_T) % P_TIME
    bf = np.arange(nbins)[None, :] // _BLOCK_F
    block = bt * nbf + bf
    slots = block % N_BYTES
    chips = (block // N_BYTES) % N_CODES
    prn = _prn()
    return prn[(chips + message[slots]) % N_CODES]


class StreamingEmbedder:
    """Incremental 44.1 kHz spread-spectrum embed (one continuous grid).

    feed() accepts arbitrary sample counts and returns every sample whose
    OLA accumulation is complete; close() flushes the tail with the
    offline edge policy (final ``_EDGE_FRAMES`` frames unmarked).
    """

    def __init__(self, message: List[int], message_sdr: float = 30.0):
        self._msg = np.asarray(message, np.int64)
        assert self._msg.shape == (N_BYTES,)
        self._alpha = float(10.0 ** (-message_sdr / 20.0))
        self._win = np.hanning(N_FFT).astype(np.float64)
        self._win2 = self._win * self._win
        self._buf = np.zeros(0, np.float64)  # input; buf[0] is abs sample _buf0
        self._buf0 = 0
        self._n_in = 0
        self._f_next = 0  # next frame to process
        # OLA carries, covering absolute samples [_out0, _out0 + len)
        self._ola = np.zeros(0, np.float64)
        self._wsum = np.zeros(0, np.float64)
        self._out0 = 0
        self._closed = False

    # -- internals ---------------------------------------------------------

    def _process_block(self, f0: int, frames: int, mark: np.ndarray,
                       x: np.ndarray) -> None:
        """Embed frames [f0, f0+frames) from x (starting at abs sample
        f0*HOP, zero-padded past the signal end) into the OLA carry."""
        idx = np.arange(frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
        segs = x[idx] * self._win[None, :]
        spec = np.fft.rfft(segs, axis=-1)
        signs = _chip_signs_np(self._msg, f0, frames)
        gain = np.ones((frames, N_FFT // 2 + 1))
        gain[:, _BIN_LO:_BIN_HI] = 1.0 + self._alpha * signs * mark[:, None]
        out = np.fft.irfft(spec * gain, n=N_FFT, axis=-1) * self._win[None, :]

        need = (f0 + frames - 1) * HOP + N_FFT - self._out0
        if need > len(self._ola):
            pad = need - len(self._ola)
            self._ola = np.concatenate([self._ola, np.zeros(pad)])
            self._wsum = np.concatenate([self._wsum, np.zeros(pad)])
        for t in range(frames):
            s = (f0 + t) * HOP - self._out0
            self._ola[s : s + N_FFT] += out[t]
            self._wsum[s : s + N_FFT] += self._win2

    def _block_input(self, f0: int, frames: int) -> np.ndarray:
        lo = f0 * HOP
        hi = lo + (frames - 1) * HOP + N_FFT
        x = np.zeros(hi - lo)
        src_lo = max(lo, self._buf0)
        src_hi = min(hi, self._buf0 + len(self._buf))
        if src_hi > src_lo:
            x[src_lo - lo : src_hi - lo] = self._buf[
                src_lo - self._buf0 : src_hi - self._buf0
            ]
        return x

    def _emit_until(self, settled: int) -> np.ndarray:
        n = settled - self._out0
        if n <= 0:
            return np.zeros(0, np.float32)
        out = self._ola[:n] / np.maximum(self._wsum[:n], 1e-8)
        self._ola = self._ola[n:]
        self._wsum = self._wsum[n:]
        self._out0 = settled
        # input before the next frame's window start is no longer needed
        keep_from = self._f_next * HOP
        if keep_from > self._buf0:
            self._buf = self._buf[keep_from - self._buf0 :]
            self._buf0 = keep_from
        return out.astype(np.float32)

    # -- public ------------------------------------------------------------

    def feed(self, x: np.ndarray) -> np.ndarray:
        assert not self._closed
        self._buf = np.concatenate([self._buf, np.asarray(x, np.float64)])
        self._n_in += len(x)
        # a block is safe once _LOOKAHEAD extra full frames exist past it
        while (
            (self._f_next + _FR - 1 + _LOOKAHEAD) * HOP + N_FFT <= self._n_in
        ):
            f0 = self._f_next
            mark = (
                (f0 + np.arange(_FR)) >= _EDGE_FRAMES
            ).astype(np.float64)
            self._process_block(f0, _FR, mark, self._block_input(f0, _FR))
            self._f_next += _FR
        return self._emit_until(self._f_next * HOP)

    def close(self) -> np.ndarray:
        """Process the remaining frames (final _EDGE_FRAMES unmarked) and
        flush every remaining real sample."""
        assert not self._closed
        self._closed = True
        L = self._n_in
        if L == 0:
            return np.zeros(0, np.float32)
        f_total = (L - 1) // HOP + 1  # every real sample covered 4×
        while self._f_next < f_total:
            f0 = self._f_next
            f = np.arange(f0, f0 + _FR)
            mark = ((f >= _EDGE_FRAMES) & (f < f_total - _EDGE_FRAMES)).astype(
                np.float64
            )
            self._process_block(f0, _FR, mark, self._block_input(f0, _FR))
            self._f_next += _FR
        return self._emit_until(L)


class StreamingWatermarker:
    """24 kHz PCM in → 24 kHz watermarked PCM out, chunk by chunk.

    The output stream is sample-for-sample a single continuous
    resample→embed→resample pipeline: no group boundaries, and any
    prefix long enough to carry the mark (~4 s) verifies with the
    standard offline verifier (watermark/api.py::verify)."""

    def __init__(self, message: List[int], io_rate: int,
                 message_sdr: float = 30.0):
        self._up = (
            StreamingResampler(io_rate, WATERMARK_RATE)
            if io_rate != WATERMARK_RATE else None
        )
        self._emb = StreamingEmbedder(message, message_sdr)
        self._down = (
            StreamingResampler(WATERMARK_RATE, io_rate)
            if io_rate != WATERMARK_RATE else None
        )

    def feed(self, pcm: np.ndarray) -> np.ndarray:
        x = self._up.feed(pcm) if self._up else np.asarray(pcm, np.float32)
        y = self._emb.feed(x)
        return self._down.feed(y) if self._down else y

    def close(self) -> np.ndarray:
        x = self._up.close() if self._up else np.zeros(0, np.float32)
        y = np.concatenate([self._emb.feed(x), self._emb.close()])
        if not self._down:
            return y
        return np.concatenate([self._down.feed(y), self._down.close()])


def make_streaming_watermarker(
    watermarker, key: List[int], io_rate: int,
    message_sdr: Optional[float] = None,
):
    """Streaming pipeline for a watermark backend, or None.

    Only the DSP scheme supports incremental embedding; the ported
    silentcipher network (watermark/net.py) operates on whole clips, so
    callers fall back to ≥4 s group mode when it is active."""
    if not isinstance(watermarker, Watermarker):
        return None
    if message_sdr is None:
        message_sdr = getattr(watermarker, "default_message_sdr", 30.0)
    return StreamingWatermarker(key, io_rate, message_sdr)
