"""Service layer: voice registry, cached-context generation, export, CLI.

Covers the reference TTS wrapper surface (reference tts_service.py
C11-C13) on the tiny flavor with a synthetic voice fixture.
"""

import os

import numpy as np
import pytest

from sesameai_tts_tpu.audio.io import read_wav_mono, write_wav
from sesameai_tts_tpu.runtime.loader import test_tiny_spec as tiny_spec
from sesameai_tts_tpu.service.tts import TTS
from sesameai_tts_tpu.service.voices import load_registry
from sesameai_tts_tpu.utils.text import clean_text_for_tts, split_clean_sentences


@pytest.fixture(scope="module")
def voice_dir(tmp_path_factory):
    """Synthetic voice: two clips + transcripts (dir convention)."""
    root = tmp_path_factory.mktemp("voices")
    vdir = root / "testvoice"
    vdir.mkdir()
    rng = np.random.default_rng(0)
    for i, text in enumerate(["hello there", "a second clip"]):
        wav = (rng.normal(size=4800) * 0.1).astype(np.float32)
        write_wav(str(vdir / f"clip{i}.wav"), wav, 24_000)
        (vdir / f"clip{i}.txt").write_text(text)
    return str(root)


@pytest.fixture(scope="module")
def tts(voice_dir):
    engine = TTS(spec=tiny_spec(), voices=voice_dir, enable_watermark=False)
    engine.load_model()
    engine.load_voice("testvoice", warmup=False)
    return engine


def test_registry_discovery(voice_dir):
    reg = load_registry(voice_dir)
    assert "testvoice" in reg
    assert len(reg["testvoice"]) == 2


def test_registry_json(voice_dir, tmp_path):
    import json

    reg = load_registry(voice_dir)
    j = tmp_path / "reg.json"
    j.write_text(json.dumps({"v": {p: t for p, t in reg["testvoice"].items()}}))
    reg2 = load_registry(str(j))
    assert "v" in reg2 and len(reg2["v"]) == 2


def test_load_voice_caches_context(tts):
    assert tts.cached_context is not None
    state, length = tts.cached_context
    assert length > 0
    assert int(state.pos[0]) == length


def test_generate_with_cached_context(tts):
    audio = tts.generate_with_context("hi there", max_audio_length_ms=480,
                                      temperature=0.8, topk=5)
    assert audio.dtype == np.float32
    assert len(audio) >= 0  # EOS can hit immediately with random weights


def test_cached_context_matches_uncached(tts):
    """KV-prefix caching must not change results: same seed, cached vs
    raw-context prompts produce identical frames."""
    import jax

    gen = tts.generator
    gen._key = jax.random.PRNGKey(77)
    f_cached = gen.generate_frames(
        "check equivalence", 1, [], max_audio_length_ms=480,
        temperature=1.0, topk=1, cached_context=tts.cached_context,
    )
    gen._key = jax.random.PRNGKey(77)
    f_raw = gen.generate_frames(
        "check equivalence", 1, tts.cached_segments, max_audio_length_ms=480,
        temperature=1.0, topk=1,
    )
    np.testing.assert_array_equal(f_cached, f_raw)


def test_fit_context_trims_tail_first():
    """Over-budget voice context: oldest clips drop whole, then the
    newest clip keeps its TAIL rows; under-budget passes through."""
    from sesameai_tts_tpu.service.tts import _fit_context

    def seg(n, tag):
        t = np.full((n, 9), tag, np.int32)
        return t, np.ones((n, 9), bool)

    segs = [seg(50, 1), seg(80, 2), seg(100, 3)]
    out, rows, trimmed = _fit_context(segs, budget=300)
    assert not trimmed and rows == 230 and len(out) == 3

    out, rows, trimmed = _fit_context(segs, budget=190)
    assert trimmed and rows == 180
    assert [o[0][0, 0] for o in out] == [2, 3]  # clip 1 dropped whole

    out, rows, trimmed = _fit_context(segs, budget=60)
    assert trimmed and rows == 60 and len(out) == 1
    assert out[0][0].shape[0] == 60  # tail of the newest clip
    assert out[0][0][0, 0] == 3


def test_load_voice_overlong_context_trims(voice_dir, caplog):
    """A voice whose clips exceed the KV budget loads anyway (tail-trim
    + warning) and the cached prefix fits the cache. Regression: this
    used to die in precompute_context_state with a numpy broadcast
    error (1 s of tiny-codec audio is ~500 rows vs max_seq_len=256)."""
    import logging as _logging
    from pathlib import Path

    root = Path(voice_dir)
    vdir = root / "longvoice"
    vdir.mkdir(exist_ok=True)
    rng = np.random.default_rng(3)
    wav = (rng.normal(size=24_000) * 0.1).astype(np.float32)  # 1 s
    write_wav(str(vdir / "clip.wav"), wav, 24_000)
    (vdir / "clip.txt").write_text("a deliberately long reference clip")

    engine = TTS(spec=tiny_spec(), voices=voice_dir, enable_watermark=False)
    engine.load_model()
    with caplog.at_level(_logging.WARNING, "sesameai_tts_tpu.service.tts"):
        engine.load_voice("longvoice", warmup=False)
    assert any("tail-trimmed" in r.message for r in caplog.records)
    state, length = engine.cached_context
    assert 0 < length <= engine.generator.max_seq_len - 16
    audio = engine.generate_with_context(
        "hi", max_audio_length_ms=480, temperature=0.8, topk=5
    )
    assert audio.dtype == np.float32


def test_load_voice_overlong_clip_trims_before_encode(voice_dir, caplog):
    """A clip longer than the codec's one-pass encode window (or,
    tighter, the KV budget's frame bucket) is tail-trimmed BEFORE Mimi
    encode.  Regression: a 57 s real clip used to crash load_voice with
    the max_latent_positions ValueError instead of loading."""
    import logging as _logging
    from pathlib import Path

    root = Path(voice_dir)
    vdir = root / "hugevoice"
    vdir.mkdir(exist_ok=True)
    rng = np.random.default_rng(9)
    wav = (rng.normal(size=5 * 24_000) * 0.1).astype(np.float32)  # 5 s
    write_wav(str(vdir / "clip.wav"), wav, 24_000)
    (vdir / "clip.txt").write_text("an absurdly long reference clip")

    engine = TTS(spec=tiny_spec(), voices=voice_dir, enable_watermark=False)
    engine.load_model()
    assert 5 * 24_000 > engine.generator.max_clip_samples  # premise
    with caplog.at_level(_logging.WARNING, "sesameai_tts_tpu.service.tts"):
        engine.load_voice("hugevoice", warmup=False)
    assert any("encode window" in r.message for r in caplog.records)
    state, length = engine.cached_context
    assert 0 < length <= engine.generator.context_budget


def test_precompute_context_state_overlong_raises(tts):
    """Generator-level contract: an unfittable context raises a clear
    ValueError, not a numpy broadcast error."""
    K = tts.generator._cfg.audio_num_codebooks
    n = tts.generator.max_seq_len + 10
    t = np.zeros((n, K + 1), np.int32)
    m = np.ones((n, K + 1), bool)
    with pytest.raises(ValueError, match="voice context"):
        tts.generator.precompute_context_state([(t, m)])


def test_export_wav(tts, tmp_path):
    out = tmp_path / "out.wav"
    tts.export_wav("One sentence. Two sentences.", str(out), temperature=0.8, topk=5)
    assert out.exists()
    audio, rate = read_wav_mono(str(out))
    assert rate == 24_000
    assert len(audio) > 0  # at minimum the silence pads


def test_say_collects_clips(tts, tmp_path):
    clips = tts.say(
        "Hello world. Second phrase!", output_filename=str(tmp_path / "say.wav"),
        play=False, temperature=0.8, topk=5,
    )
    assert len(clips) == 2
    assert (tmp_path / "say.wav").exists()


def test_clean_text():
    assert clean_text_for_tts("**bold** and `code` and [link](http://x)") == "bold and and link"
    # em-dash → "..." which then collapses to "." (reference behavior:
    # tts_utils.py:23 then the repeat-punctuation normalizer :40)
    assert clean_text_for_tts("em—dash") == "em. dash"
    assert clean_text_for_tts("wow!!!") == "wow!"


def test_sentence_split():
    s = split_clean_sentences("First one. Second two! Third three? trailing")
    assert s == ["First one.", "Second two!", "Third three?", "trailing"]


def test_cli_tiny_flavor(tmp_path, voice_dir, monkeypatch):
    """CLI end-to-end on the tiny flavor (the reference CLI surface,
    tts_service.py:528-573)."""
    from sesameai_tts_tpu.service.cli import main

    out = tmp_path / "cli.wav"
    main([
        "--flavor", "test-tiny", "--voices", voice_dir, "-v", "testvoice",
        "--no-watermark", "--temp", "0.8", "--topk", "5",
        "--output", str(out), "hello from the cli",
    ])
    assert out.exists()


def test_max_audio_length_plumbs_to_generation(tts, monkeypatch, tmp_path):
    """The CLI's --max-ms was parsed but never used (review finding):
    the cap must reach generate_with_context through BOTH sentence
    pipelines (generation length itself is stochastic — tiny random
    weights may EOS any frame — so pin the plumbing, not the audio)."""
    seen = []
    orig = tts.generate_with_context

    def spy(prompt, **kw):
        seen.append(kw.get("max_audio_length_ms"))
        return orig(prompt, **kw)

    monkeypatch.setattr(tts, "generate_with_context", spy)
    tts.generate_audio_segment("endless", topk=5, max_audio_length_ms=400)
    assert seen == [400]
    seen.clear()
    tts.export_wav("one sentence", str(tmp_path / "m.wav"), topk=5,
                   max_audio_length_ms=720)
    assert seen == [720]


def test_generate_tts_audio_helper(tts, tmp_path):
    """Temp-WAV helper parity (reference utils/tts_utils.py:47-107)."""
    import os

    from sesameai_tts_tpu.utils.text import generate_tts_audio

    path = generate_tts_audio("One short sentence.", tts, temperature=0.8, top_k=5)
    assert path is not None and os.path.exists(path)
    audio, rate = read_wav_mono(path)
    assert rate == 24_000 and len(audio) > 0
    os.remove(path)
    assert generate_tts_audio("", tts) is None  # empty text → None


def test_smoke_harness_tiny_selftest(capsys):
    """sesame-tts-smoke --flavor test-tiny: the acceptance harness runs
    end-to-end on random tiny weights; every check except codec passes
    (random weights can't reconstruct audio — documented in --help),
    proving a real-weight failure would be DETECTED, not skipped."""
    from sesameai_tts_tpu.service.smoke import main as smoke_main

    rc = smoke_main(["--flavor", "test-tiny", "--text", "Smoke self test."])
    out = capsys.readouterr().out
    assert "[PASS] load" in out
    assert "[PASS] generate" in out
    assert "[PASS] greedy" in out
    assert "[PASS] watermark" in out
    assert "[FAIL] codec" in out  # random weights: the gate works
    assert rc == 1  # failing checks propagate to the exit code


@pytest.mark.slow
def test_dress_rehearsal_synthetic_weights(tmp_path):
    """The real-weights dress rehearsal (VERDICT r3 #2), pinned: generate
    layout-exact synthetic upstream artifacts (csm dir + real-format
    tokenizer.json, transformers-Mimi safetensors, silentcipher .pth),
    then run the documented convert → load → generate → codec →
    watermark → serve procedure as ONE command.  Quality checks
    downgrade to informational via the SYNTHETIC_WEIGHTS.json marker;
    every layout/pipeline check stays gated — so the first real-weights
    day is a formality, not a debugging session.

    Runs the two CLIs as subprocesses — exactly what a user types, and a
    single-device CPU env (the 8-virtual-device harness topology triples
    the wall time for no extra coverage here)."""
    import subprocess
    import sys as _sys

    env = dict(os.environ,
               JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    env.pop("XLA_FLAGS", None)  # 1 device, not the harness's virtual 8
    wd = str(tmp_path / "weights")
    gen = subprocess.run(
        [_sys.executable, "-m", "sesameai_tts_tpu.service.fixtures",
         wd, "--flavor", "test-tiny"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]
    assert os.path.exists(os.path.join(wd, "csm-1b", "tokenizer.json"))

    smoke = subprocess.run(
        [_sys.executable, "-m", "sesameai_tts_tpu.service.smoke",
         "--weights-dir", wd, "--flavor", "test-tiny",
         "--text", "Dress rehearsal."],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    out = smoke.stdout
    assert smoke.returncode == 0, out[-2000:] + smoke.stderr[-2000:]
    assert "[PASS] convert" in out
    assert "tokenizer.json" in out          # auto-inferred from the dir
    assert "[PASS] load" in out
    assert "[PASS] serve" in out and "watermarked: True" in out
    assert "[FAIL]" not in out


def test_resolve_tokenizer_auto(tmp_path):
    """tokenizer=None auto-infers from the checkpoint layout: a dir (or a
    checkpoint file's parent) shipping tokenizer.json supplies it; a
    weightless or tokenizer-less run falls back to 'byte'; explicit
    values always win (VERDICT r3 #7 — real-weights serve needs zero
    tokenizer flags)."""
    from sesameai_tts_tpu.runtime.loader import resolve_tokenizer

    assert resolve_tokenizer("tiny", str(tmp_path)) == "tiny"
    assert resolve_tokenizer("byte", str(tmp_path)) == "byte"
    assert resolve_tokenizer(None, None) == "byte"
    assert resolve_tokenizer(None, str(tmp_path)) == "byte"
    tj = tmp_path / "tokenizer.json"
    tj.write_text("{}")
    assert resolve_tokenizer(None, str(tmp_path)) == str(tj)
    # a checkpoint FILE resolves against its parent directory
    assert resolve_tokenizer(
        None, str(tmp_path / "model.safetensors")
    ) == str(tj)


def test_prewarm_cli_tiny(capsys):
    """sesame-tts-prewarm populates the persistent compile cache with
    the exact serve-path program set and reports a machine-readable
    warmup_wall_s record (VERDICT r4 #6 — deploy-time prewarm so serve
    restarts never pay cold remote compiles)."""
    import json as _json

    from sesameai_tts_tpu.service.prewarm import main as prewarm_main

    rc = prewarm_main(["--flavor", "test-tiny", "--slots", "2",
                       "--chunk-frames", "4",
                       "--cache-dir", "/tmp/jax_test_cache"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = _json.loads(out[-1])
    assert rec["programs"] > 10          # buckets + ticks + scatters + ...
    assert rec["warmup_wall_s"] >= 0
    assert rec["slots"] == 2 and rec["chunk_frames"] == 4
