"""LoRA finetuning: adapter init/merge contracts + the LoRA train step.

Key properties: merge at init is exactly the base (B = 0); ΔW has rank
≤ r; only adapters receive gradients (the base is frozen by
construction); the finetune CLI's --lora-rank path exports MERGED dense
params loadable like a full finetune's.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sesameai_tts_tpu.core.config import csm_test_tiny
from sesameai_tts_tpu.models.csm import init_csm_params
from sesameai_tts_tpu.training.loss import Batch
from sesameai_tts_tpu.training.lora import (
    DEFAULT_TARGETS,
    count_params,
    init_lora_params,
    merge_lora,
)
from sesameai_tts_tpu.training.train_step import (
    init_train_state,
    make_lora_train_step,
    make_optimizer,
)

CFG = csm_test_tiny()
K = CFG.audio_num_codebooks


@pytest.fixture(scope="module")
def base():
    return init_csm_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def _batch(rng, B=2, S=16, audio_rows=10):
    tokens = np.zeros((B, S, K + 1), np.int32)
    mask = np.zeros((B, S, K + 1), bool)
    text_rows = S - audio_rows
    tokens[:, :text_rows, K] = rng.integers(1, CFG.text_vocab_size, (B, text_rows))
    mask[:, :text_rows, K] = True
    tokens[:, text_rows:, :K] = rng.integers(1, CFG.audio_vocab_size, (B, audio_rows, K))
    mask[:, text_rows:, :K] = True
    return Batch(jnp.asarray(tokens), jnp.asarray(mask), jnp.ones((B, S), bool))


def test_init_merge_is_identity(base):
    lora = init_lora_params(jax.random.PRNGKey(1), base, rank=2)
    merged = merge_lora(base, lora, alpha=16.0)
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adapter_coverage_and_size(base):
    lora = init_lora_params(jax.random.PRNGKey(1), base, rank=2)
    # every default target in both trunks is adapted, nothing else
    for trunk in ("backbone", "decoder"):
        assert set(lora[trunk]["layers"]) == set(DEFAULT_TARGETS)
    assert set(lora) == {"backbone", "decoder"}
    # the whole point: adapters are a small fraction of the base
    assert count_params(lora) < 0.25 * count_params(base)

    with pytest.raises(ValueError, match="no LoRA targets"):
        init_lora_params(jax.random.PRNGKey(1), base, 2, targets=("nope",))


def test_merge_delta_has_rank_r(base):
    r = 2
    lora = init_lora_params(jax.random.PRNGKey(2), base, rank=r)
    # poke B away from zero so the delta is nontrivial
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    merged = merge_lora(base, lora, alpha=8.0)
    d0 = np.asarray(merged["backbone"]["layers"]["qkv"][0]) - np.asarray(
        base["backbone"]["layers"]["qkv"][0]
    )
    s = np.linalg.svd(d0, compute_uv=False)
    assert s[0] > 1e-6  # nontrivial
    np.testing.assert_allclose(s[r:], 0.0, atol=1e-5 * s[0])


def test_lora_train_step_updates_only_adapters(base):
    rng = np.random.default_rng(0)
    tx = make_optimizer(lr=1e-2, warmup=1)
    lora = init_lora_params(jax.random.PRNGKey(3), base, rank=2)
    lora_before = jax.tree.map(lambda x: np.asarray(x).copy(), lora)
    state = init_train_state(lora, tx)  # donated by step: lora arrays die
    step = make_lora_train_step(CFG, tx, alpha=16.0, decoder_frames=2)

    batch = _batch(rng)
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), base)
    state, m = step(state, base, batch)
    assert np.isfinite(float(m["loss"])) and float(m["grad_norm"]) > 0
    # the frozen base is untouched (not donated, not updated)
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(base)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # loss decreases over a few steps on the SAME batch (sanity that the
    # adapters actually steer the merged model); note the warmup
    # schedule makes step 1's lr exactly 0, so movement is checked after
    first = float(m["loss"])
    for _ in range(4):
        state, m = step(state, base, batch)
    assert float(m["loss"]) < first
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(lora_before), jax.tree.leaves(state.params))
    )
    assert moved


def test_lora_accum_matches_full_batch(base):
    rng = np.random.default_rng(1)
    tx = make_optimizer(lr=1e-3, warmup=1)
    lora = init_lora_params(jax.random.PRNGKey(4), base, rank=2)
    batch = _batch(rng, B=4)

    s1, m1 = make_lora_train_step(CFG, tx, decoder_frames=2)(
        init_train_state(jax.tree.map(jnp.copy, lora), tx), base, batch
    )
    s2, m2 = make_lora_train_step(CFG, tx, decoder_frames=2, accum_steps=2)(
        init_train_state(jax.tree.map(jnp.copy, lora), tx), base, batch
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_finetune_cli_lora_exports_merged(tmp_path):
    from sesameai_tts_tpu.audio.io import write_wav
    from sesameai_tts_tpu.core.weights import load_pytree
    from sesameai_tts_tpu.training.finetune import main

    data = tmp_path / "clips"
    data.mkdir()
    rng = np.random.default_rng(5)
    for i in range(2):
        wav = (0.1 * rng.standard_normal(960 * (i + 1))).astype(np.float32)
        write_wav(str(data / f"c{i}.wav"), wav, 24_000)
        (data / f"c{i}.txt").write_text(f"lora clip {i}")

    ckpt = str(tmp_path / "run")
    # --save-every divides --steps: the final step is already saved by the
    # periodic path, and the params export must STILL be written (a guard
    # against double-saving once skipped the export with it)
    main(["--data", str(data), "--flavor", "test-tiny", "--steps", "2",
          "--batch-size", "2", "--buckets", "64", "--ckpt-dir", ckpt,
          "--save-every", "2",
          "--lora-rank", "2", "--log-every", "1", "--warmup", "1"])

    # export is the MERGED dense tree — same structure as init_csm_params
    like = init_csm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    params = load_pytree(os.path.join(ckpt, "params"), like)
    assert jax.tree.structure(params) == jax.tree.structure(like)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params))

    # the export serves directly: ModelSpec.csm_checkpoint accepts the
    # orbax params dir (weights.py::_is_orbax_dir) and the small-vocab
    # flavor is exempt from the real-weights tokenizer guard
    import dataclasses

    from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec

    spec = dataclasses.replace(
        test_tiny_spec(), csm_checkpoint=os.path.join(ckpt, "params")
    )
    gen = build_generator(spec)
    audio = gen.generate("served from export", speaker=0, context=[],
                         max_audio_length_ms=400)
    assert audio.size > 0 and np.isfinite(audio).all()
