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
  service layer (feed 24 kHz PCM chunks, get 24 kHz watermarked PCM);
* ``StreamingNetEmbedder`` streams the ported silentcipher NETWORK the
  same way — exact overlap-save over the conv stacks' receptive field —
  so real-weight deployments keep the low-latency path too.

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

import threading

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
    offline edge policy (mark cutoff at the offline frame BUCKET minus
    ``_EDGE_FRAMES``, exactly as ``dsp._embed_jit`` applies it).
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
        """Process the remaining frames and flush every remaining real
        sample.  The mark cutoff is the OFFLINE bucket's (frames <
        bucket - _EDGE_FRAMES, where offline pads full-window frame
        counts to a power of two): cutting at the stream's own last
        frame left the final ~80 ms unmarked relative to offline embed,
        weakening short captured suffixes of the streamed output."""
        assert not self._closed
        self._closed = True
        L = self._n_in
        if L == 0:
            return np.zeros(0, np.float32)
        f_total = (L - 1) // HOP + 1  # every real sample covered 4×
        nf_off = max(1, 1 + (L - N_FFT) // HOP) if L >= N_FFT else 1
        bucket = 1 << (nf_off - 1).bit_length()  # dsp._pad_to_frames
        while self._f_next < f_total:
            f0 = self._f_next
            f = np.arange(f0, f0 + _FR)
            mark = ((f >= _EDGE_FRAMES) & (f < bucket - _EDGE_FRAMES)).astype(
                np.float64
            )
            self._process_block(f0, _FR, mark, self._block_input(f0, _FR))
            self._f_next += _FR
        return self._emit_until(L)


class _ResampleEmbedPipe:
    """io_rate PCM in → io_rate watermarked PCM out, chunk by chunk,
    through an embedder operating at ``embed_rate``.  The output stream
    is sample-for-sample a single continuous resample→embed→resample
    pipeline: no group boundaries, and any prefix long enough to carry
    the mark verifies with the standard offline verifier
    (watermark/api.py::verify).  Shared by the DSP and ported-net
    backends — ONE copy of the chaining/flush logic."""

    def __init__(self, embedder, embed_rate: int, io_rate: int):
        self._up = (
            StreamingResampler(io_rate, embed_rate)
            if io_rate != embed_rate else None
        )
        self._emb = embedder
        self._down = (
            StreamingResampler(embed_rate, io_rate)
            if io_rate != embed_rate else None
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


class StreamingWatermarker(_ResampleEmbedPipe):
    """24 kHz PCM in → 24 kHz watermarked PCM out (DSP backend)."""

    def __init__(self, message: List[int], io_rate: int,
                 message_sdr: float = 30.0):
        super().__init__(
            StreamingEmbedder(message, message_sdr), WATERMARK_RATE, io_rate
        )


def make_streaming_watermarker(
    watermarker, key: List[int], io_rate: int,
    message_sdr: Optional[float] = None,
):
    """Streaming pipeline for a watermark backend, or None.

    Both backends stream: the DSP scheme via ``StreamingWatermarker``,
    the ported silentcipher network via ``StreamingNetEmbedder`` (exact
    overlap-save over the conv receptive field).  Unknown backends get
    None and callers fall back to ≥4 s group mode."""
    if isinstance(watermarker, Watermarker):
        if message_sdr is None:
            message_sdr = getattr(watermarker, "default_message_sdr", 30.0)
        return StreamingWatermarker(key, io_rate, message_sdr)
    return make_streaming_net_watermarker(watermarker, key, io_rate, message_sdr)


# ---------------------------------------------------------------------------
# Streaming embed for the ported silentcipher NETWORK backend
#
# The net's residual at STFT frame t depends on mag frames
# [t-L, t+L] only (L = Σ kw//2 over the enc_c+dec_c conv stacks) and on
# the frame's own phase — so overlap-save streaming is EXACT: each block
# is computed with L real context frames on both sides and only the
# center kept.  Offline-bucket zero-pad frames are reproduced by zero
# sample context at the stream end (a zero-input frame is what the
# offline encoder sees there, which is NOT the same as conv zero-pad
# beyond the first layer — bias terms flow).  The only deviation from
# offline encode_wav is α: offline solves the message-SDR gain over the
# whole clip at once, the stream uses the cumulative energies up to
# each emitted block (converges within the first seconds).
# ---------------------------------------------------------------------------


def _net_receptive_halfwidth(params: dict) -> int:
    return sum(
        int(blk["w"].shape[3]) // 2
        for stack in (params["enc_c"], params["dec_c"])
        for blk in stack
    )


_NET_BLOCK_IMPL = None
_NET_BLOCK_LOCK = threading.Lock()


def _net_block_segs(params, cfg, xseg, message, frames: int, keep_lo: int,
                    valid_t: int):
    """Jitted per-block net residual. MODULE-LEVEL so the jit cache is
    shared across embedder instances: per-request construction (one
    embedder per /tts/stream response) never re-traces or re-compiles —
    two (frames, keep_lo) signatures total per config.

    Runs on the DEFAULT backend: pinning to host CPU was tried and
    abandoned — on the remote-attached axon platform, touching the CPU
    backend after the TPU client is live hangs the process."""
    global _NET_BLOCK_IMPL
    if _NET_BLOCK_IMPL is None:
        with _NET_BLOCK_LOCK:
            # double-checked: two concurrent cold requests must share ONE
            # jitted impl (a second function object means every block
            # signature compiles twice — minutes each on this platform)
            if _NET_BLOCK_IMPL is None:
                _NET_BLOCK_IMPL = _make_net_block_impl()
    return _NET_BLOCK_IMPL(params, cfg, xseg, message, frames, keep_lo,
                           np.int32(valid_t))


def _make_net_block_impl():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("cfg", "frames", "keep_lo"))
    def impl(params, cfg, xseg, message, frames, keep_lo, valid_t):
        n_fft, hop = cfg.n_fft, cfg.hop
        win = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
        starts = jnp.arange(frames) * hop
        segs = jax.vmap(
            lambda s: jax.lax.dynamic_slice(xseg, (s,), (n_fft,))
        )(starts)
        spec = jnp.fft.rfft(segs * win, axis=-1)
        mag = jnp.abs(spec)
        phase = spec / (mag + 1e-8)
        # offline runs the convs on EXACTLY the bucketed frame count and
        # zero-pads activations past it; valid_t (traced — one program)
        # reproduces that boundary when this block extends past it
        t_mask = (jnp.arange(frames) < valid_t).astype(mag.dtype)[
            None, None, None, :
        ]
        mag4 = mag.T[None, None] * t_mask
        from sesameai_tts_tpu.watermark.net import _stack_apply

        feats = _stack_apply(params["enc_c"], mag4, t_mask)
        msg = params["enc_m"][message]
        msg_ch = jnp.broadcast_to(
            msg[None, :, :, None], (1, msg.shape[0], msg.shape[1], frames)
        )
        resid = _stack_apply(
            params["dec_c"],
            jnp.concatenate([mag4, feats, msg_ch], axis=1) * t_mask,
            t_mask,
        )[0, 0].T  # (frames, n_bins)
        out = jnp.fft.irfft(resid * phase, n=n_fft, axis=-1) * win
        return out[keep_lo:]

    return impl


class StreamingNetEmbedder:
    """Incremental 44.1 kHz embed through the ported silentcipher net.

    feed()/close() mirror ``StreamingEmbedder``; per-block compute runs
    one jitted program (static block size → one compile).  ``alpha``
    pins the embed gain for exactness tests; by default the gain tracks
    the cumulative signal/residual energies (offline solves it globally).
    """

    _BLOCK = 32  # frames per jitted block

    def __init__(self, model, message, message_sdr: Optional[float] = None,
                 alpha: Optional[float] = None):
        self._model = model
        cfg = model.cfg
        self._pad = cfg.n_fft // 2
        self._hop = cfg.hop
        self._n_fft = cfg.n_fft
        self._L = _net_receptive_halfwidth(model.params)
        self._msg = np.asarray(message, np.int64)
        sdr = cfg.default_message_sdr if message_sdr is None else message_sdr
        self._gain = 10.0 ** (-sdr / 20.0)
        self._alpha_fixed = alpha
        win = np.hanning(cfg.n_fft + 1)[:-1].astype(np.float32)
        self._win2 = (win * win).astype(np.float64)

        # input buffer in OUTPUT coords, trimmed as frames/emission drain
        self._xin = np.zeros(0, np.float32)
        self._xin0 = 0
        self._n_in = 0
        self._head: Optional[np.ndarray] = None  # the offline reflect pad
        self._endpad: Optional[np.ndarray] = None  # offline END reflect pad
        self._end0 = 0  # xpad coord where the end reflection begins
        self._fmax: Optional[int] = None  # offline frame count (close only)
        self._f_done = 0
        self._ola = np.zeros(0, np.float64)  # resid OLA from _out0 (xpad coords)
        self._wsum = np.zeros(0, np.float64)
        self._out0 = 0
        self._emitted = 0
        self._cum_sig = 0.0
        self._cum_noise = 0.0
        self._closed = False

    # -- internals ---------------------------------------------------------

    def _xpad_slice(self, lo: int, hi: int) -> np.ndarray:
        """xpad[lo:hi] where xpad = reflect_head(pad) + input + zeros to
        the frame bucket + reflect_end(pad) — the exact signal the
        offline STFT frames see (the end reflection exists only once
        close() has fixed the stream length)."""
        out = np.zeros(hi - lo, np.float32)
        h_lo, h_hi = max(lo, 0), min(hi, self._pad)
        if h_hi > h_lo:
            out[h_lo - lo : h_hi - lo] = self._head[h_lo:h_hi]
        x_lo = max(lo, self._pad)
        x_hi = min(hi, self._pad + self._n_in)
        if x_hi > x_lo:
            a = x_lo - self._pad - self._xin0
            out[x_lo - lo : x_hi - lo] = self._xin[a : a + (x_hi - x_lo)]
        if self._endpad is not None and hi > self._end0:
            e_lo, e_hi = max(lo, self._end0), min(hi, self._end0 + self._pad)
            if e_hi > e_lo:
                out[e_lo - lo : e_hi - lo] = self._endpad[
                    e_lo - self._end0 : e_hi - self._end0
                ]
        return out

    def _process_blocks(self, f_end: Optional[int]) -> None:
        """Process frame blocks; with f_end None only blocks whose full
        ±L context has arrived run, else run through frame f_end with
        zero context past the stream end (the offline bucket padding)."""
        hop, n_fft, L, B = self._hop, self._n_fft, self._L, self._BLOCK
        while True:
            a = self._f_done
            if f_end is not None and a >= f_end:
                return
            # blocks are ALWAYS full B frames — a residual-sized close
            # block would mint a fresh jit signature per utterance length
            # (minutes of remote compile each). Frames past f_end read
            # zero samples and only write OLA beyond the emitted range.
            b = a + B
            hi_sample = (b + L - 1) * hop + n_fft  # xpad coords
            if f_end is None and hi_sample > self._pad + self._n_in:
                return
            lo_f = max(0, a - L)
            seg = self._xpad_slice(lo_f * hop, hi_sample)
            n_frames = b + L - lo_f
            valid_t = (
                min(self._fmax - lo_f, n_frames)
                if self._fmax is not None
                else n_frames
            )
            out = np.asarray(
                _net_block_segs(
                    self._model.params, self._model.cfg, seg, self._msg,
                    n_frames, a - lo_f, valid_t,
                ),
                np.float64,
            )[: b - a]
            need = (b - 1) * hop + n_fft - self._out0
            if need > len(self._ola):
                grow = need - len(self._ola)
                self._ola = np.concatenate([self._ola, np.zeros(grow)])
                self._wsum = np.concatenate([self._wsum, np.zeros(grow)])
            for t in range(b - a):
                if self._fmax is not None and (a + t) >= self._fmax:
                    continue  # offline has exactly _fmax frames: phantom
                    # block-fill frames past it must not enter OLA/wsum
                    # (they overlap the emitted tail when bucket == nf)
                s = (a + t) * hop - self._out0
                self._ola[s : s + n_fft] += out[t]
                self._wsum[s : s + n_fft] += self._win2
            self._f_done = b

    def _emit_ready(self) -> np.ndarray:
        """Emit y = x + α·resid for settled output samples, trim buffers."""
        settled = min(self._f_done * self._hop - self._pad, self._n_in)
        n = settled - self._emitted
        if n <= 0:
            return np.zeros(0, np.float32)
        lo = self._emitted + self._pad - self._out0
        resid = self._ola[lo : lo + n] / np.maximum(self._wsum[lo : lo + n], 1e-8)
        xs = self._xin[self._emitted - self._xin0 : settled - self._xin0]
        self._cum_sig += float(np.sum(xs.astype(np.float64) ** 2))
        self._cum_noise += float(np.sum(resid**2))
        alpha = (
            self._alpha_fixed
            if self._alpha_fixed is not None
            else self._gain * np.sqrt(self._cum_sig / max(self._cum_noise, 1e-20))
        )
        y = (xs + alpha * resid).astype(np.float32)
        drop = self._emitted + self._pad - self._out0 + n
        self._ola = self._ola[drop:]
        self._wsum = self._wsum[drop:]
        self._out0 += drop
        self._emitted = settled
        # keep input still needed by future frames or emission
        keep = min(self._emitted,
                   max(0, (self._f_done - self._L) * self._hop - self._pad))
        if keep > self._xin0:
            self._xin = self._xin[keep - self._xin0 :]
            self._xin0 = keep
        return y

    # -- public ------------------------------------------------------------

    def feed(self, x: np.ndarray) -> np.ndarray:
        assert not self._closed
        x = np.asarray(x, np.float32)
        self._xin = np.concatenate([self._xin, x])
        self._n_in += len(x)
        if self._head is None:
            if self._n_in < self._pad + 1:
                return np.zeros(0, np.float32)
            first = self._xin[: self._pad + 1]  # _xin0 == 0 before any trim
            self._head = first[1:][::-1].copy()  # np.pad reflect semantics
        self._process_blocks(None)
        return self._emit_ready()

    def close(self) -> np.ndarray:
        assert not self._closed
        self._closed = True
        if self._n_in == 0:
            return np.zeros(0, np.float32)
        if self._head is None:  # shorter than one pad: offline zero-pads
            # the clip to the frame bucket BEFORE reflecting — reproduce
            ext = np.pad(self._xin, (0, self._pad + 1 - self._n_in))
            self._head = ext[1:][::-1].copy()
        nf = 1 + self._n_in // self._hop
        from sesameai_tts_tpu.watermark.net import _bucket_frames

        self._fmax = _bucket_frames(nf)  # offline frame count
        need = self._fmax * self._hop
        # offline reflect-pads xp = input + zeros(need - n) at the end:
        # xpad[pad+need+i] = xp[need-2-i]. When the zero gap is < pad
        # (every length where 1+n//hop lands exactly on a power of two)
        # the reflection mirrors REAL samples that the last frames read.
        idx = need - 2 - np.arange(self._pad)
        vals = np.zeros(self._pad, np.float32)
        real = (idx >= self._xin0) & (idx < self._n_in)
        if real.any():
            vals[real] = self._xin[idx[real] - self._xin0]
        self._endpad = vals
        self._end0 = self._pad + need
        f_end = nf + -(-self._pad // self._hop)  # covers every real sample
        self._process_blocks(max(f_end, self._f_done))
        return self._emit_ready()


def make_streaming_net_watermarker(model, key, io_rate: int,
                                   message_sdr: Optional[float] = None):
    """Streaming pipeline (resample → net embed → resample) for the
    ported silentcipher backend."""
    from sesameai_tts_tpu.watermark.net import NetWatermarker

    if not isinstance(model, NetWatermarker):
        return None
    return _ResampleEmbedPipe(
        StreamingNetEmbedder(model, key, message_sdr),
        model.cfg.sample_rate, io_rate,
    )
