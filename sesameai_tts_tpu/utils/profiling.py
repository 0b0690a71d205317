"""Profiling + structured metrics (SURVEY.md §5: the reference has only
ad-hoc prints — CUDA events in gputest.py:36-53, RTF prints
tts_service.py:390-397, TTFS/TTFF prints ogwebapp.py:81-120).

Here: per-stage wall-clock timers (prefill / frame decode / codec /
watermark), a structured metrics registry that aggregates
counts/totals/percentiles, and a ``jax.profiler`` trace context for real
device profiles (``tensorboard --logdir`` on the output).
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np


class Metrics:
    """Thread-safe metric aggregation; values are wall-clock seconds or
    caller-defined units.

    Each series is BOUNDED to the most recent ``maxlen`` samples so a
    long-lived server's metrics stay O(1) in memory and /metrics-style
    percentile queries stay O(maxlen), not O(total sessions)."""

    def __init__(self, maxlen: int = 4096):
        self._lock = threading.Lock()
        self._maxlen = maxlen
        self._series: Dict[str, List[float]] = defaultdict(list)

    def record(self, name: str, value: float) -> None:
        with self._lock:
            s = self._series[name]
            s.append(float(value))
            if len(s) > self._maxlen:
                del s[: len(s) - self._maxlen]

    @contextlib.contextmanager
    def timer(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def summary(self) -> Dict[str, dict]:
        with self._lock:
            out = {}
            for name, vals in self._series.items():
                arr = np.asarray(vals)
                out[name] = {
                    "count": int(arr.size),
                    "total": float(arr.sum()),
                    "mean": float(arr.mean()),
                    "p50": float(np.percentile(arr, 50)),
                    "p90": float(np.percentile(arr, 90)),
                    "max": float(arr.max()),
                }
            return out

    def dump_json(self) -> str:
        return json.dumps(self.summary(), indent=2)

    def reset(self) -> None:
        with self._lock:
            self._series.clear()


# module-level default registry (opt-in; the Generator accepts its own)
metrics = Metrics()


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace context — captures XLA/TPU timelines viewable
    in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RTFMeter:
    """Realtime-factor accounting for one utterance (the reference's
    per-sentence RTF print, tts_service.py:390-397, as data)."""

    sample_rate: int
    start: float = field(default_factory=time.perf_counter)
    first_audio_at: Optional[float] = None
    samples: int = 0

    def on_chunk(self, chunk: np.ndarray) -> None:
        if self.first_audio_at is None:
            self.first_audio_at = time.perf_counter() - self.start
        self.samples += len(chunk)

    def result(self) -> dict:
        proc = time.perf_counter() - self.start
        audio_s = self.samples / self.sample_rate
        return {
            "proc_s": proc,
            "audio_s": audio_s,
            "rtf": proc / audio_s if audio_s else float("inf"),
            "xrt": audio_s / proc if proc else 0.0,
            "first_audio_ms": (self.first_audio_at or 0.0) * 1000.0,
        }
