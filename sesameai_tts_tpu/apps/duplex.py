"""Full-duplex voice loop (the reference's legacy ogwebapp capability,
reference ogwebapp.py:76-130, C19 — "aspirational" per SURVEY.md §1, now
first-class).

Pipeline per user turn: STT → rolling CSM context append → streaming LLM
→ incremental sentence split over token deltas → frame-granular TTS
stream → assistant segment appended back into context.  Fixes the two
problems the reference documents (ogwebapp.py:17-21): context is managed
by RollingContext (pinned voice prefix + eviction — no hard 2048 wall),
and audio is emitted per frame (80 ms) instead of per 10-frame chunk.

The WebRTC/mic layer (fastrtc in the reference) is injected: anything
that calls ``respond(user_audio)`` and consumes the yielded
``(sample_rate, pcm)`` tuples works — fastrtc, a websocket server, or a
test harness.  STT is likewise an injected callable (the reference uses
DistilWhisper locally and an HTTP API in audio_to_text.py:30-33).
"""

from __future__ import annotations

import logging
import re
import time
from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np

from sesameai_tts_tpu.llm.client import AskLLM, global_config as llm_config
from sesameai_tts_tpu.runtime.context import RollingContext
from sesameai_tts_tpu.runtime.frames import Segment
from sesameai_tts_tpu.runtime.generator import Generator
from sesameai_tts_tpu.utils.text import clean_text_for_tts

logger = logging.getLogger(__name__)


def sentence_stream(deltas: Iterator[str]) -> Iterator[str]:
    """Incremental sentence splitter over LLM token deltas (reference
    ogwebapp.py:133-151, without the nltk dependency)."""
    buf = ""
    for delta in deltas:
        buf += delta
        while True:
            m = re.search(r"(.+?[.!?])(?:\s+|$)", buf, re.S)
            if not m or m.end() >= len(buf):
                break  # keep accumulating until a boundary is confirmed
            yield m.group(1).strip()
            buf = buf[m.end():]
    tail = buf.strip()
    if tail:
        yield tail


class DuplexVoiceApp:
    """STT → LLM → TTS loop with rolling context recycling."""

    def __init__(
        self,
        generator: Generator,
        stt: Callable[[np.ndarray, int], str],
        llm: Optional[AskLLM] = None,
        voice_context: Optional[List] = None,  # Segments or (tokens, mask) pairs
        user_speaker: int = 0,
        bot_speaker: int = 1,
        max_dialog_segments: int = 7,  # reference's last-7 window (ogwebapp.py:109)
        temperature: float = 0.8,
        topk: int = 40,
        max_sentence_ms: float = 20_000.0,
    ):
        self.generator = generator
        self.stt = stt
        self.llm = llm or AskLLM("local-default", llm_config)
        self.user_speaker = user_speaker
        self.bot_speaker = bot_speaker
        self.temperature = temperature
        self.topk = topk
        self.max_sentence_ms = max_sentence_ms

        self.context = RollingContext(
            max_positions=generator._max_seq_len,
            max_segments=max_dialog_segments,
        )
        if voice_context:
            pairs = [
                generator.frame_tokenizer.segment(s) if isinstance(s, Segment) else s
                for s in voice_context
            ]
            self.context.pin_prefix(pairs)

    # -- one user turn ------------------------------------------------------

    def respond(
        self, user_audio: np.ndarray, sample_rate: int
    ) -> Iterator[Tuple[int, np.ndarray]]:
        """Yields (sample_rate, pcm chunk) per generated frame; latency
        marks (STT / first-sentence / first-frame) are logged as in the
        reference (ogwebapp.py:81-83, 106, 116-120)."""
        t0 = time.time()
        user_text = self.stt(user_audio, sample_rate)
        logger.info(f"stt: {time.time()-t0:.2f}s — {user_text!r}")
        if not user_text.strip():
            return

        # user turn joins the CSM context (text + their audio)
        if sample_rate != self.generator.sample_rate:
            from sesameai_tts_tpu.audio.resample import resample

            user_audio = resample(user_audio, sample_rate, self.generator.sample_rate)
        # a live loop must degrade, not crash: an over-long turn keeps its
        # tail (module contract: "no hard 2048 wall")
        self.context.append(
            self.generator.frame_tokenizer.segment(
                Segment(self.user_speaker, user_text, user_audio.astype(np.float32))
            ),
            oversize="trim",
        )

        t_first_sentence = None
        t_first_frame = None
        deltas = self.llm.query(user_text, stream=True)
        for sentence in sentence_stream(deltas):
            if t_first_sentence is None:
                t_first_sentence = time.time() - t0
                logger.info(f"ttfs: {t_first_sentence:.2f}s")
            sentence = clean_text_for_tts(sentence)
            if not sentence:
                continue


            def on_chunk(_):
                nonlocal t_first_frame
                if t_first_frame is None:
                    t_first_frame = time.time() - t0
                    logger.info(f"ttff: {t_first_frame:.2f}s")

            chunks = []
            for chunk in self.generator.generate_stream(
                sentence,
                self.bot_speaker,
                self.context.pairs(),
                max_audio_length_ms=self.max_sentence_ms,
                temperature=self.temperature,
                topk=self.topk,
                on_chunk_generated=on_chunk,
                chunk_frames=1,
            ):
                chunks.append(chunk)
                yield (self.generator.sample_rate, chunk)

            if chunks:
                bot_audio = np.concatenate(chunks)
                # recycle the assistant turn into context (ogwebapp.py:124-125)
                self.context.append(
                    self.generator.frame_tokenizer.segment(
                        Segment(self.bot_speaker, sentence, bot_audio)
                    ),
                    oversize="trim",
                )

    def clear_dialog(self) -> None:
        self.context.clear()
        self.llm.history_manager.clear_history()


def main(argv=None):
    """Mic loop via fastrtc when available (reference ogwebapp.py:154-174)."""
    import argparse

    parser = argparse.ArgumentParser(description="Full-duplex voice chat (TPU)")
    parser.add_argument("--flavor", type=str, default="csm-1b",
                        choices=["csm-1b", "test-tiny"])
    parser.add_argument("-m", "--model", type=str, default="local-default")
    args = parser.parse_args(argv)

    try:
        from fastrtc import ReplyOnPause, Stream  # type: ignore
    except ImportError:
        raise SystemExit(
            "fastrtc is not installed; install it for the mic loop. "
            "DuplexVoiceApp is usable programmatically without it."
        )

    from sesameai_tts_tpu.runtime.loader import build_generator, csm_1b_spec, test_tiny_spec

    spec = test_tiny_spec() if args.flavor == "test-tiny" else csm_1b_spec()
    gen = build_generator(spec)

    def stt_stub(audio, rate):
        raise SystemExit("wire an STT callable (e.g. whisper API) here")

    app = DuplexVoiceApp(gen, stt=stt_stub)

    def respond(audio):
        rate, pcm = audio
        yield from app.respond(np.asarray(pcm, np.float32), rate)

    Stream(ReplyOnPause(respond, can_interrupt=True)).ui.launch()


if __name__ == "__main__":
    main()
