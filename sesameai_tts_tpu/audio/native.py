"""ctypes bindings for the native audio kernels (native/audio.cpp,
SURVEY.md C-N6).  Every entry point is a sample-exact equivalent of its
numpy counterpart in audio/resample.py / audio/segment.py (parity
tests in tests/test_audio.py).

These are an ALTERNATIVE host backend, not the default path: the
product's ``resample()`` stays on scipy because the streaming
resampler's bit-identical-to-offline contract (watermark/stream.py
depends on it) is defined against scipy's ``upfirdn`` — mixing backends
within one pipeline would break it.  Embedders/deployments without
scipy can call these directly."""

from __future__ import annotations

import ctypes
import math
import os
from functools import lru_cache
from typing import Optional

import numpy as np


@lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    try:
        import sys

        root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
        if root not in sys.path:
            sys.path.insert(0, root)
        from native.build import build

        lib = ctypes.CDLL(build("audio"))
    except Exception:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.resample_poly.argtypes = [f32p, i64, f32p, i64, i64, i64, f32p, i64]
    lib.apply_fade.argtypes = [f32p, i64, i64, i64]
    lib.f32_to_i16.argtypes = [f32p, i64, i16p]
    lib.i16_to_f32.argtypes = [i16p, i64, f32p]
    lib.peak_normalize.argtypes = [f32p, i64, ctypes.c_float]
    return lib


def available() -> bool:
    return _lib() is not None


def resample_native(x: np.ndarray, orig_rate: int, new_rate: int) -> np.ndarray:
    """Polyphase resample via the C++ kernel; same filter design as the
    scipy path (audio/resample.py)."""
    from sesameai_tts_tpu.audio.resample import _resample_plan

    lib = _lib()
    assert lib is not None
    if orig_rate == new_rate:
        return x
    up, down, taps = _resample_plan(orig_rate, new_rate)
    x = np.ascontiguousarray(x, np.float32)
    n_out = -(-len(x) * up // down)
    out = np.empty(n_out, np.float32)
    lib.resample_poly(x, len(x), np.ascontiguousarray(taps), len(taps),
                      up, down, out, n_out)
    return out


def fade_inplace(x: np.ndarray, fade_in_n: int, fade_out_n: int) -> np.ndarray:
    lib = _lib()
    assert lib is not None, "native audio library unavailable (use AudioClip)"
    x = np.ascontiguousarray(x, np.float32)
    lib.apply_fade(x, len(x), fade_in_n, fade_out_n)
    return x


def to_int16(x: np.ndarray) -> np.ndarray:
    lib = _lib()
    assert lib is not None, "native audio library unavailable (use AudioClip)"
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(len(x), np.int16)
    lib.f32_to_i16(x, len(x), out)
    return out


def peak_normalize_inplace(x: np.ndarray, peak: float = 1.0) -> np.ndarray:
    lib = _lib()
    assert lib is not None, "native audio library unavailable (use AudioClip)"
    x = np.ascontiguousarray(x, np.float32)
    lib.peak_normalize(x, len(x), peak)
    return x
