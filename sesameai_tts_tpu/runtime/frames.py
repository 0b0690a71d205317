"""Segment → 33-column frame tokenization (host-side prep, numpy).

Frame layout parity with the reference (reference generator.py:63-109):

* a text token becomes a (K+1)-wide row with the token in column K and
  only column K masked (reference _tokenize_text_segment, :63-76);
* audio is Mimi-encoded to (K, F) codes, one all-zero EOS frame is
  appended, and each frame becomes a row with codes in columns 0..K-1
  and those columns masked (reference _tokenize_audio, :78-99);
* a Segment is text rows followed by audio rows (reference :101-109);
* text prompts are encoded as ``f"[{speaker}]{text}"`` wrapped in
  BOS…EOS (reference :67 + the tokenizer patch :24-38).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class Segment:
    """A conversation turn: speaker id, transcript, 24 kHz mono audio.

    Mirror of the reference ``Segment`` (generator.py:16-21) with numpy
    in place of torch tensors.
    """

    speaker: int
    text: str
    audio: np.ndarray  # (num_samples,) float32 @ 24 kHz


def pad_audio_to_frame_bucket(
    audio: np.ndarray, hop: int
) -> Tuple[np.ndarray, int]:
    """(T,) waveform → ((1, 1, bucket·hop) zero-padded wav, frame count).

    Pads to whole codec frames then to a power-of-2 frame bucket so the
    number of compiled encode programs stays logarithmic; the causal
    encoder makes right-padding exact. The single definition is shared
    by the Generator and the training pipeline — train-time rows must be
    bit-identical to inference-time prompt rows."""
    T = len(audio)
    frames = max(1, -(-T // hop))
    bucket = 1 << (frames - 1).bit_length()
    wav = np.zeros((1, 1, bucket * hop), np.float32)
    wav[0, 0, :T] = audio
    return wav, frames


def tokenize_text_segment(
    tokenizer, text: str, speaker: int, num_codebooks: int
) -> Tuple[np.ndarray, np.ndarray]:
    """→ ((S, K+1) int32 tokens, (S, K+1) bool mask)."""
    K = num_codebooks
    ids = tokenizer.encode(f"[{speaker}]{text}")
    S = len(ids)
    tokens = np.zeros((S, K + 1), np.int32)
    mask = np.zeros((S, K + 1), bool)
    tokens[:, K] = ids
    mask[:, K] = True
    return tokens, mask


def tokenize_audio_codes(
    codes: np.ndarray, num_codebooks: int, append_eos: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """(K, F) Mimi codes → ((F[+1], K+1) tokens, mask) with EOS frame."""
    K = num_codebooks
    assert codes.shape[0] == K, f"expected {K} codebooks, got {codes.shape[0]}"
    if append_eos:
        codes = np.concatenate([codes, np.zeros((K, 1), codes.dtype)], axis=1)
    F = codes.shape[1]
    tokens = np.zeros((F, K + 1), np.int32)
    mask = np.zeros((F, K + 1), bool)
    tokens[:, :K] = codes.T
    mask[:, :K] = True
    return tokens, mask


class FrameTokenizer:
    """Binds a text tokenizer + Mimi encoder into Segment tokenization."""

    def __init__(self, text_tokenizer, audio_encoder, num_codebooks: int):
        """audio_encoder: callable (num_samples,) float32 → (K, F) int codes
        (a jitted Mimi encode closure; kept abstract so tests can stub)."""
        self.text_tokenizer = text_tokenizer
        self.audio_encoder = audio_encoder
        self.num_codebooks = num_codebooks

    def text_segment(self, text: str, speaker: int):
        return tokenize_text_segment(
            self.text_tokenizer, text, speaker, self.num_codebooks
        )

    def audio_segment(self, audio: np.ndarray):
        assert audio.ndim == 1, "Audio must be single channel"  # generator.py:79
        codes = np.asarray(self.audio_encoder(audio))
        return tokenize_audio_codes(codes, self.num_codebooks)

    def segment(self, segment: Segment):
        """→ ((S, K+1), (S, K+1)) — text rows then audio rows."""
        tt, tm = self.text_segment(segment.text, segment.speaker)
        at, am = self.audio_segment(segment.audio)
        return np.concatenate([tt, at]), np.concatenate([tm, am])
