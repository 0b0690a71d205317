"""TTSBaseApp — shared app state & sentence pipeline (reference
utils/tts_base.py:17-170, C15).

Owns a TTS engine, splits cleaned text into sentences, generates one
sentence at a time under a lock, converts clips to the
``(sample_rate, float32 ndarray)`` streaming tuple the web UIs consume
(reference tts_base.py:118-132), and tracks status strings with timing.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

from sesameai_tts_tpu.audio.segment import AudioClip
from sesameai_tts_tpu.runtime.loader import ModelSpec, csm_1b_spec
from sesameai_tts_tpu.service.tts import TTS
from sesameai_tts_tpu.utils.text import split_clean_sentences

logger = logging.getLogger(__name__)


class TTSBaseApp:
    def __init__(
        self,
        voice: Optional[str] = None,
        spec: Optional[ModelSpec] = None,
        voices: Optional[str] = None,
        tts: Optional[TTS] = None,
    ):
        self.tts = tts or TTS(spec=spec or csm_1b_spec(), voices=voices)
        if self.tts.generator is None:
            self.tts.load_model()

        self.current_voice: Optional[str] = None
        default_voice = voice or (self.tts.list_voices()[0] if self.tts.list_voices() else None)
        if default_voice:
            try:
                self.tts.load_voice(default_voice)
                self.current_voice = default_voice
                self.current_status = f"Ready. Using voice: {default_voice}"
            except Exception as e:
                logger.error(f"Error loading default voice: {e}")
                self.current_status = "Ready. TTS initialized with no voice."
        else:
            self.current_status = "Ready. TTS initialized with no voice."

        self.sentences: List[str] = []
        self.current_sample_rate: Optional[int] = None
        self.lock = threading.Lock()

    # -- text ---------------------------------------------------------------

    def split_text_into_sentences(self, text: str) -> List[str]:
        return split_clean_sentences(text)

    # -- voice --------------------------------------------------------------

    def change_voice(self, new_voice_name: str) -> str:
        print(f"Attempting to change voice to: {new_voice_name}")
        with self.lock:
            try:
                self.tts.load_voice(new_voice_name)
                self.current_voice = new_voice_name
                self.current_status = f"Voice changed to {new_voice_name}. Ready."
            except Exception as e:
                logger.exception(f"Error changing voice to {new_voice_name}: {e}")
                self.current_status = f"Error changing voice to {new_voice_name}: {e}"
            return self.current_status

    def list_available_voices(self) -> List[str]:
        try:
            return self.tts.list_voices()
        except Exception as e:
            logger.error(f"Error listing voices: {e}")
            return ["Error loading voices"]

    # -- per-sentence generation ---------------------------------------------

    def generate_audio_for_sentence_index(
        self,
        sentence_index: int,
        temperature: float = 0.8,
        topk: int = 40,
        speed_factor: float = 1.0,
    ) -> Tuple[str, Optional[Tuple[int, np.ndarray]]]:
        """→ (status, (sample_rate, float32 audio) | None)
        (reference tts_base.py:76-155)."""
        with self.lock:
            if sentence_index >= len(self.sentences):
                status = (
                    f"Sentence index {sentence_index} out of bounds "
                    f"(total: {len(self.sentences)})"
                )
                logger.warning(status)
                return status, None
            sentence = self.sentences[sentence_index]
            total = len(self.sentences)
            self.current_status = (
                f"Generating audio for sentence {sentence_index+1}/{total}: "
                f"{sentence[:50]}..."
            )

        try:
            start = time.time()
            clip = self.tts.generate_audio_segment(
                sentence,
                temperature=temperature,
                topk=topk,
                fade_duration=50,
                start_silence_duration=150,
                end_silence_duration=150,
            )
            if speed_factor != 1.0:
                clip = clip.speedup(playback_speed=speed_factor)

            with self.lock:
                if self.current_sample_rate is None:
                    self.current_sample_rate = clip.sample_rate
                self._store_audio_segment(clip, sentence_index)

            audio_data = clip.to_gradio()
            proc = time.time() - start
            status = (
                f"Processed sentence {sentence_index+1}/{total} "
                f"({clip.duration_seconds:.1f}s audio / {proc:.1f}s proc)"
            )
            with self.lock:
                is_last = sentence_index == len(self.sentences) - 1
                status += ". All sentences processed." if is_last else ". Generating next..."
                self.current_status = status
            return self.current_status, audio_data
        except Exception as e:
            logger.exception(f"Error generating audio for sentence {sentence_index+1}: {e}")
            with self.lock:
                self.current_status = (
                    f"Error on sentence {sentence_index+1}/{len(self.sentences)}. Skipping."
                )
            return self.current_status, None

    def _store_audio_segment(self, clip: AudioClip, sentence_index: int) -> None:
        """Override point for app-specific storage (reference tts_base.py:157-162)."""
