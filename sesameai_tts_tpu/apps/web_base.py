"""WebAppBase — LLM-wired app base (reference utils/web_base.py:14-177, C16).

Adds to TTSBaseApp: LLM client construction with alias resolution, the
incremental sentence→audio pump (``sentence_generator_loop``), interrupt
/ clear-session handling, and runtime model switching.
"""

from __future__ import annotations

import abc
import logging
import os
import time
from typing import Optional

from sesameai_tts_tpu.apps.tts_base import TTSBaseApp
from sesameai_tts_tpu.llm.client import AskLLM, ModelManager, global_config as llm_config

logger = logging.getLogger(__name__)


class WebAppBase(TTSBaseApp, abc.ABC):
    def __init__(self, voice: Optional[str], model: str, **tts_kwargs):
        self.temp_audio_files = []
        self.audio_segments = []

        self.model_manager = ModelManager(llm_config)
        llm_config.VERBOSE = False

        self.current_resolved_alias = self.model_manager.resolve_model_alias(model)
        if not self.current_resolved_alias:
            raise ValueError(f"Could not resolve initial model alias: {model}")
        print(f"Resolved initial model alias: {self.current_resolved_alias}")
        self.llm = AskLLM(
            resolved_model_alias=self.current_resolved_alias, config=llm_config
        )
        self.available_models = llm_config.MODEL_OPTIONS
        self.current_model = self.current_resolved_alias
        super().__init__(voice=voice, **tts_kwargs)

    # UI hooks (subclasses wire these to their frontend)
    def get_answer(self, query: str):
        pass

    def update_status(self, message: str):
        pass

    def stream_audio_response(self, audio_chunk):
        pass

    def clear_ui(self):
        pass

    def _store_audio_segment(self, clip, sentence_index):
        self.audio_segments.append(clip)

    def interrupt_and_reset(self):
        logger.info("Interrupting any ongoing TTS generation.")
        with self.lock:
            self.sentences = []
            self.audio_segments = []
        self.update_status("Interrupted previous response.")

    def sentence_generator_loop(
        self, start_index, end_index, active, temperature=0.7,
        speed_factor=1.2, topk=40,
    ):
        """Incremental TTS pump: per sentence, yield (active, audio_tuple)
        (reference web_base.py:67-115)."""
        if not active:
            logger.info("Generator triggered but not active.")
            self.update_status("Processing stopped.")
            yield False, None
            return

        current_index = start_index
        while True:
            with self.lock:
                total = len(self.sentences)
                in_bounds = current_index < total and current_index < end_index

            if not active or not in_bounds:
                final = (
                    "All sentences processed. Audio playback complete."
                    if active else "Processing stopped."
                )
                self.update_status(final)
                yield False, None
                return

            status, audio_tuple = self.generate_audio_for_sentence_index(
                current_index, temperature, topk=topk, speed_factor=speed_factor
            )
            if "Error" in status and audio_tuple is None:
                self.update_status(status)
                yield False, None
                return

            self.update_status(status)
            self.stream_audio_response(audio_tuple)
            yield active, audio_tuple
            current_index += 1
            time.sleep(0.05)

    def clear_session(self):
        logger.info("Clearing base session state...")
        for audio_path in self.temp_audio_files:
            try:
                if os.path.exists(audio_path):
                    os.remove(audio_path)
            except Exception as e:
                logger.error(f"Error removing temp file {audio_path}: {e}")
        self.temp_audio_files = []
        with self.lock:
            self.sentences = []
            self.audio_segments = []
            self.current_sample_rate = None
        self.clear_ui()

    def change_model(self, new_model_requested: str):
        print(f"Attempting to change model to: {new_model_requested}")
        with self.lock:
            resolved = self.model_manager.resolve_model_alias(new_model_requested)
            if not resolved:
                status = f"Error: Could not resolve requested model alias '{new_model_requested}'."
            else:
                try:
                    self.llm = AskLLM(resolved_model_alias=resolved, config=llm_config)
                    self.current_resolved_alias = resolved
                    self.current_model = resolved
                    status = f"Model changed to {resolved}. Ready."
                except Exception as e:
                    status = f"Error initializing LLM for {resolved}: {e}"
            print(status)
        return self.update_status(status)

    def change_voice(self, voice: str):
        super().change_voice(voice)
        return self.update_status(f"Voice changed to {self.current_voice}")
