"""Training data pipeline + checkpoint/resume + grad accumulation.

The critical property: train-time rows are produced by the SAME
FrameTokenizer as inference prompts (runtime/frames.py), and padding is
invisible to the loss.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sesameai_tts_tpu.core.config import csm_test_tiny
from sesameai_tts_tpu.models.csm import init_csm_params
from sesameai_tts_tpu.runtime.frames import FrameTokenizer, Segment
from sesameai_tts_tpu.training import checkpoint as ckpt_lib
from sesameai_tts_tpu.training.data import (
    BatchLoader,
    LoaderConfig,
    bucket_for,
    load_directory,
    pad_example,
    prefetch,
)
from sesameai_tts_tpu.training.loss import Batch, csm_loss
from sesameai_tts_tpu.training.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

CFG = csm_test_tiny()
K = CFG.audio_num_codebooks


class _StubTextTok:
    def encode(self, text):
        return [1 + (ord(c) % 100) for c in text][:20]


def _stub_encoder(audio):
    """Deterministic fake Mimi: 1 frame per 100 samples, content-coded."""
    F = max(1, len(audio) // 100)
    seed = int(np.abs(audio).sum() * 1000) % 50
    return (np.arange(K)[:, None] + seed + np.arange(F)[None, :]) % 60 + 1


@pytest.fixture
def ftok():
    return FrameTokenizer(_StubTextTok(), _stub_encoder, K)


def _segments(n, rng):
    return [
        Segment(speaker=i % 2, text=f"utterance number {i}",
                audio=rng.standard_normal(100 * (2 + i % 5)).astype(np.float32))
        for i in range(n)
    ]


def test_bucket_and_pad_layout(ftok):
    assert bucket_for(64, (64, 128)) == 64
    assert bucket_for(65, (64, 128)) == 128
    assert bucket_for(129, (64, 128)) is None

    seg = Segment(0, "hello", np.ones(300, np.float32))
    tokens, mask = ftok.segment(seg)
    S = tokens.shape[0]
    t, m, lm = pad_example(tokens, mask, 64)
    assert t.shape == (64, K + 1) and m.shape == (64, K + 1) and lm.shape == (64,)
    np.testing.assert_array_equal(t[:S], tokens)
    np.testing.assert_array_equal(m[:S], mask)
    assert lm[:S].all() and not lm[S:].any()
    assert not t[S:].any() and not m[S:].any()


def test_loss_invariant_to_bucket_padding(ftok):
    """The same example padded to two bucket sizes yields the same loss."""
    params = init_csm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    seg = Segment(1, "pad invariance", np.ones(500, np.float32))
    tokens, mask = ftok.segment(seg)

    losses = []
    for bucket in (32, 64):
        t, m, lm = pad_example(tokens, mask, bucket)
        batch = Batch(jnp.asarray(t[None]), jnp.asarray(m[None]), jnp.asarray(lm[None]))
        loss, _ = csm_loss(params, CFG, batch, decoder_frames=2)
        losses.append(float(loss))
    assert np.isfinite(losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)


def test_batch_loader_fixed_shapes_and_remainder(ftok):
    rng = np.random.default_rng(0)
    loader = BatchLoader(
        _segments(7, rng), ftok,
        LoaderConfig(batch_size=4, buckets=(32, 64, 128), seed=1),
    )
    batches = list(loader)
    assert batches, "expected at least one batch"
    for b in batches:
        assert b.tokens.shape[0] == 4  # remainder padded by repetition
        assert b.tokens.shape[1] in (32, 64, 128)
        assert b.tokens.shape == b.mask.shape[:2] + (K + 1,)
        assert b.loss_mask.shape == b.tokens.shape[:2]
    # every real example appears somewhere
    total_rows = sum(int(b.loss_mask.sum()) for b in batches)
    assert total_rows >= sum(t.shape[0] for _, t, _ in loader.examples)

    # over-length examples are dropped with a count, not truncated
    long = [Segment(0, "x", np.ones(100 * 200, np.float32))]
    rng2 = np.random.default_rng(1)
    loader2 = BatchLoader(
        _segments(2, rng2) + long, ftok,
        LoaderConfig(batch_size=2, buckets=(64,)),
    )
    assert loader2.dropped == 1


def test_prefetch_order_and_errors():
    assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_early_break_retires_worker():
    """Breaking out of a prefetched infinite iterator (the finetune
    loop's shape) must not leave a blocked worker thread behind."""
    import threading
    import time

    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    before = threading.active_count()
    for _ in range(10):
        for x in prefetch(infinite(), depth=2):
            if x >= 3:
                break
    time.sleep(0.5)  # workers observe stop within their 0.1 s put timeout
    assert threading.active_count() <= before + 1


def test_load_directory_both_conventions(tmp_path):
    from sesameai_tts_tpu.audio.io import write_wav

    wav = np.sin(np.linspace(0, 100, 2400)).astype(np.float32)
    # sidecar convention
    d1 = tmp_path / "sidecar"
    d1.mkdir()
    write_wav(str(d1 / "a.wav"), wav, 24_000)
    (d1 / "a.txt").write_text("hello side")
    write_wav(str(d1 / "skip.wav"), wav, 24_000)  # no txt → skipped
    segs = load_directory(str(d1))
    assert len(segs) == 1 and segs[0].text == "hello side" and segs[0].speaker == 0
    assert segs[0].audio.shape == (2400,)

    # metadata convention (with speakers + plain-string form)
    d2 = tmp_path / "meta"
    d2.mkdir()
    write_wav(str(d2 / "a.wav"), wav, 24_000)
    write_wav(str(d2 / "b.wav"), wav, 24_000)
    (d2 / "metadata.json").write_text(json.dumps(
        {"a.wav": {"text": "spoken A", "speaker": 3}, "b.wav": "spoken B"}
    ))
    segs = load_directory(str(d2))
    assert [(s.text, s.speaker) for s in segs] == [("spoken A", 3), ("spoken B", 0)]


def _rand_batch(rng, B=2, S=24, audio_rows=16):
    """Batch where EVERY example has identical mask structure (so the
    accumulation microbatch means match the full-batch masked mean)."""
    tokens = np.zeros((B, S, K + 1), np.int32)
    mask = np.zeros((B, S, K + 1), bool)
    text_rows = S - audio_rows
    tokens[:, :text_rows, K] = rng.integers(1, CFG.text_vocab_size, (B, text_rows))
    mask[:, :text_rows, K] = True
    tokens[:, text_rows:, :K] = rng.integers(
        1, CFG.audio_vocab_size, (B, audio_rows, K)
    )
    mask[:, text_rows:, :K] = True
    return Batch(
        jnp.asarray(tokens), jnp.asarray(mask), jnp.ones((B, S), bool)
    )


def _fresh_state(params, tx):
    """train_step donates its state, deleting the input buffers — each
    run needs its own copy of the initial params."""
    return init_train_state(jax.tree.map(jnp.copy, params), tx)


def test_checkpoint_resume_bit_exact(tmp_path):
    """2 steps + save + restore + 2 steps == 4 straight steps."""
    rng = np.random.default_rng(0)
    tx = make_optimizer(lr=1e-3, warmup=2)
    params = init_csm_params(jax.random.PRNGKey(1), CFG, jnp.float32)
    step_fn = make_train_step(CFG, tx, decoder_frames=2)
    batches = [_rand_batch(rng) for _ in range(4)]

    s_ref = _fresh_state(params, tx)
    for b in batches:
        s_ref, _ = step_fn(s_ref, b)

    s = _fresh_state(params, tx)
    for b in batches[:2]:
        s, _ = step_fn(s, b)
    path = ckpt_lib.save_checkpoint(str(tmp_path / "ck"), s)
    assert os.path.basename(path) == "step_00000002"
    assert ckpt_lib.latest_checkpoint(str(tmp_path / "ck")) == path

    template = _fresh_state(params, tx)
    s2 = ckpt_lib.restore_checkpoint(path, template)
    assert int(s2.step) == 2
    for b in batches[2:]:
        s2, _ = step_fn(s2, b)

    ref_leaves = jax.tree.leaves(s_ref.params)
    res_leaves = jax.tree.leaves(s2.params)
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint_past_8_digits(tmp_path):
    """step_{:08d} widens beyond 8 digits; discovery must keep up."""
    for step in (7, 99_999_999, 123_456_789):
        (tmp_path / f"step_{step:08d}").mkdir()
    assert ckpt_lib.latest_checkpoint(str(tmp_path)) == str(
        tmp_path / "step_123456789"
    )


def test_resume_requires_ckpt_dir(tmp_path):
    from sesameai_tts_tpu.training.finetune import main

    with pytest.raises(SystemExit, match="ckpt-dir"):
        main(["--data", str(tmp_path), "--flavor", "test-tiny", "--resume"])


def test_unshuffled_loader_is_deterministic(ftok):
    """shuffle=False (the eval loader config): identical batch sequence
    on every epoch, including the repetition-padded tail."""
    segs = [
        Segment(speaker=0, text=f"clip {i}", audio=np.zeros(48 * (i + 1), np.float32))
        for i in range(3)
    ]
    loader = BatchLoader(
        segs, ftok, LoaderConfig(batch_size=2, buckets=(64,), shuffle=False)
    )
    a = [b.tokens for b in loader]
    b = [b.tokens for b in loader]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 on a uniform-mask batch == the unaccumulated step."""
    rng = np.random.default_rng(2)
    tx = make_optimizer(lr=1e-3, warmup=1)
    params = init_csm_params(jax.random.PRNGKey(3), CFG, jnp.float32)
    batch = _rand_batch(rng, B=4)

    s1, m1 = make_train_step(CFG, tx, decoder_frames=2)(
        _fresh_state(params, tx), batch
    )
    s2, m2 = make_train_step(CFG, tx, decoder_frames=2, accum_steps=2)(
        _fresh_state(params, tx), batch
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_finetune_driver_smoke_and_resume(tmp_path):
    """End-to-end CLI: tiny flavor, 3 steps, checkpoint, resume to 5."""
    from sesameai_tts_tpu.audio.io import write_wav
    from sesameai_tts_tpu.training.finetune import main

    data = tmp_path / "clips"
    data.mkdir()
    rng = np.random.default_rng(4)
    for i in range(3):
        wav = (0.1 * rng.standard_normal(960 * (i + 1))).astype(np.float32)
        write_wav(str(data / f"c{i}.wav"), wav, 24_000)
        (data / f"c{i}.txt").write_text(f"tiny clip {i}")

    ckpt = str(tmp_path / "run")
    argv = ["--data", str(data), "--flavor", "test-tiny", "--steps", "3",
            "--batch-size", "2", "--buckets", "64,128", "--ckpt-dir", ckpt,
            "--save-every", "100", "--log-every", "1", "--warmup", "1"]
    main(argv)
    assert ckpt_lib.latest_checkpoint(ckpt).endswith("step_00000003")
    assert os.path.isdir(os.path.join(ckpt, "params"))  # servable export

    main(argv + ["--steps", "5", "--resume"])
    assert ckpt_lib.latest_checkpoint(ckpt).endswith("step_00000005")


def test_finetune_eval_split(tmp_path):
    """--eval-frac holds out clips and reports a finite eval_loss."""
    from sesameai_tts_tpu.audio.io import write_wav
    from sesameai_tts_tpu.training.finetune import main

    data = tmp_path / "clips"
    data.mkdir()
    rng = np.random.default_rng(6)
    for i in range(4):
        wav = (0.1 * rng.standard_normal(960 * (i + 1))).astype(np.float32)
        write_wav(str(data / f"c{i}.wav"), wav, 24_000)
        (data / f"c{i}.txt").write_text(f"eval clip {i}")

    metrics = main(["--data", str(data), "--flavor", "test-tiny",
                    "--steps", "2", "--batch-size", "2", "--buckets", "64",
                    "--eval-frac", "0.5", "--eval-every", "1",
                    "--log-every", "1", "--warmup", "1"])
    assert np.isfinite(metrics["eval_loss"])
