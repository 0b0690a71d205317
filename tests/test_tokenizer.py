"""Tokenizers: byte/tiny fallbacks + native C++ BPE vs the Rust
``tokenizers`` oracle (trained on the fly — real byte-level BPE with the
llama-3 pretokenizer pattern)."""

import json

import pytest

from sesameai_tts_tpu.tokenizer.text import ByteTokenizer, TinyHashTokenizer


def test_byte_tokenizer_roundtrip():
    t = ByteTokenizer()
    ids = t.encode("hello world")
    assert ids[0] == t.bos_id and ids[-1] == t.eos_id
    assert t.decode(ids) == "hello world"


def test_tiny_tokenizer_bounded_and_deterministic():
    t = TinyHashTokenizer(vocab_size=128)
    a = t.encode("the same text")
    b = t.encode("the same text")
    assert a == b
    assert all(0 <= i < 128 for i in a)


@pytest.fixture(scope="module")
def trained_tokenizer(tmp_path_factory):
    """Train a small byte-level BPE with the Rust library → tokenizer.json."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=["<|begin_of_text|>", "<|end_of_text|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "The quick brown fox jumps over the lazy dog.",
        "Sesame street speech synthesis on tensor processing units!",
        "Numbers like 12345 and symbols #@% get split differently.",
        "[0]hello world [1]how are you today?",
    ] * 20
    tok.train_from_iterator(corpus, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return str(path), tok


def test_native_bpe_matches_rust_oracle(trained_tokenizer):
    path, rust = trained_tokenizer
    from sesameai_tts_tpu.tokenizer.native_bpe import NativeBPETokenizer

    native = NativeBPETokenizer(path)
    for text in [
        "The quick brown fox jumps over the lazy dog.",
        "[1]hello world, numbers 987 and synthesis!",
        "unseen words decompose into pieces",
        "punctuation?! spacing  and\nnewlines",
    ]:
        expected = rust.encode(text, add_special_tokens=False).ids
        got = native.encode(text)
        assert got[0] == native.bos_id and got[-1] == native.eos_id
        assert got[1:-1] == expected, f"mismatch on {text!r}"


def test_native_bpe_decode(trained_tokenizer):
    path, _ = trained_tokenizer
    from sesameai_tts_tpu.tokenizer.native_bpe import NativeBPETokenizer

    native = NativeBPETokenizer(path)
    text = "round trip of text"
    assert native.decode(native.encode(text)) == text


def test_hf_tokenizer_wrapper(trained_tokenizer):
    path, rust = trained_tokenizer
    from sesameai_tts_tpu.tokenizer.text import HFTokenizer

    t = HFTokenizer(path)
    ids = t.encode("hello world")
    assert ids[0] == t.bos_id and ids[-1] == t.eos_id
    assert ids[1:-1] == rust.encode("hello world", add_special_tokens=False).ids
