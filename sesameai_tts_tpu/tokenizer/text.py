"""Text tokenization (host-side prep; never on the TPU hot path).

The reference loads the Llama-3.2-1B tokenizer from the HF hub and
patches a ``TemplateProcessing`` post-processor wrapping every encode in
BOS…EOS (reference generator.py:24-38).  This environment has no
network, so the equivalent here:

* ``HFTokenizer`` — wraps a **local** HF ``tokenizer.json`` (the
  Rust-backed ``tokenizers`` package is available offline) and applies
  the same BOS…EOS wrap explicitly.
* ``ByteTokenizer`` — dependency-free byte-level tokenizer for tests
  and tiny flavors (the "fake backend" of SURVEY.md §4).
* A native C++ BPE implementation lives in native/ (SURVEY.md C-N4);
  ``load_text_tokenizer`` prefers it when built.

All implementations return ids already wrapped in BOS/EOS, matching the
reference's encode semantics for ``f"[{speaker}]{text}"`` prompts
(reference generator.py:67).
"""

from __future__ import annotations

import os
from typing import List, Protocol


class TextTokenizer(Protocol):
    bos_id: int
    eos_id: int
    vocab_size: int

    def encode(self, text: str) -> List[int]:  # BOS…EOS wrapped
        ...

    def decode(self, ids: List[int]) -> str:
        ...


class ByteTokenizer:
    """UTF-8 bytes + BOS/EOS specials; ids fit any vocab ≥ 258."""

    def __init__(self, vocab_size: int = 512):
        self.vocab_size = vocab_size
        self.bos_id = 256
        self.eos_id = 257

    def encode(self, text: str) -> List[int]:
        body = list(text.encode("utf-8"))
        return [self.bos_id] + body + [self.eos_id]

    def decode(self, ids: List[int]) -> str:
        body = bytes(i for i in ids if i < 256)
        return body.decode("utf-8", errors="replace")


class TinyHashTokenizer:
    """Deterministic word-hash tokenizer bounded by a tiny vocab — lets
    test flavors (text_vocab_size 128) exercise the full pipeline."""

    def __init__(self, vocab_size: int = 128):
        self.vocab_size = vocab_size
        self.bos_id = 0
        self.eos_id = 1

    def encode(self, text: str) -> List[int]:
        import zlib

        ids = [
            2 + (zlib.crc32(w.encode("utf-8")) % (self.vocab_size - 2))
            for w in text.split()
        ]
        return [self.bos_id] + ids + [self.eos_id]

    def decode(self, ids: List[int]) -> str:
        return " ".join(f"<{i}>" for i in ids)


class HFTokenizer:
    """Local HF tokenizer.json with explicit BOS…EOS wrap
    (equivalent of the reference's TemplateProcessing patch,
    generator.py:32-36)."""

    def __init__(self, path: str, bos_token: str = "<|begin_of_text|>",
                 eos_token: str = "<|end_of_text|>"):
        from tokenizers import Tokenizer

        tok_file = path
        if os.path.isdir(path):
            tok_file = os.path.join(path, "tokenizer.json")
        self._tok = Tokenizer.from_file(tok_file)
        self.bos_id = self._tok.token_to_id(bos_token)
        self.eos_id = self._tok.token_to_id(eos_token)
        if self.bos_id is None or self.eos_id is None:
            raise ValueError(
                f"tokenizer at {path} lacks {bos_token}/{eos_token} specials"
            )
        self.vocab_size = self._tok.get_vocab_size()

    def encode(self, text: str) -> List[int]:
        ids = self._tok.encode(text, add_special_tokens=False).ids
        return [self.bos_id] + ids + [self.eos_id]

    def decode(self, ids: List[int]) -> str:
        return self._tok.decode(ids, skip_special_tokens=True)


def _load_bpe(path: str) -> TextTokenizer:
    """Exact-first tokenizer resolution for a real tokenizer.json:

    1. native C++ BPE with the exact llama-3 pretokenizer (needs `regex`);
    2. Rust-backed HFTokenizer (always exact);
    3. native BPE with the ASCII-approximate `re` pretokenizer — last
       resort only, with a loud warning (diverges on non-ASCII text).
    """
    from sesameai_tts_tpu.tokenizer.native_bpe import NativeBPETokenizer

    errors = []
    try:
        return NativeBPETokenizer(path)
    except Exception as e:
        errors.append(f"native BPE: {e!r}")
    try:
        return HFTokenizer(path)
    except Exception as e:
        errors.append(f"HF tokenizers: {e!r}")
        import warnings

        # name the REAL causes — "regex/tokenizers unavailable" was often
        # wrong (a corrupt tokenizer.json or a failed native build look
        # identical from here), sending the user down the wrong trail
        warnings.warn(
            "exact tokenizer backends failed ("
            + "; ".join(errors)
            + "): falling back to an ASCII-approximate pretokenizer "
            "(tokenization diverges from Llama-3 on non-ASCII text)",
            stacklevel=3,
        )
        return NativeBPETokenizer(path, require_exact_pretokenizer=False)


def load_llama3_tokenizer(path: str) -> TextTokenizer:
    """Name-compatible loader (reference generator.py:24-38): the
    Llama-3.2 tokenizer with BOS…EOS wrapping, from a LOCAL
    tokenizer.json/model dir instead of the HF hub."""
    return _load_bpe(path)


def load_text_tokenizer(spec: str) -> TextTokenizer:
    """spec: 'byte', 'tiny', a tokenizer.json path, or a model dir."""
    if spec == "byte":
        return ByteTokenizer()
    if spec == "tiny":
        return TinyHashTokenizer()
    return _load_bpe(spec)
