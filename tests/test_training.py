"""Training stack: CSM loss semantics + optimization progress + sharded
train step on an 8-device mesh (greenfield capability; SURVEY.md §5
notes the reference is inference-only)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesameai_tts_tpu.core.config import csm_test_tiny
from sesameai_tts_tpu.models.csm import init_csm_params
from sesameai_tts_tpu.training.loss import Batch, csm_loss
from sesameai_tts_tpu.training.train_step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

CFG = csm_test_tiny()
K = CFG.audio_num_codebooks


def _batch(B=2, S=16, seed=0):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((B, S, K + 1), np.int32)
    mask = np.zeros((B, S, K + 1), bool)
    tokens[:, : S // 2, K] = rng.integers(0, CFG.text_vocab_size, (B, S // 2))
    mask[:, : S // 2, K] = True
    tokens[:, S // 2 :, :K] = rng.integers(0, CFG.audio_vocab_size, (B, S // 2, K))
    mask[:, S // 2 :, :K] = True
    return Batch(
        tokens=jnp.asarray(tokens),
        mask=jnp.asarray(mask),
        loss_mask=jnp.ones((B, S), bool),
    )


def test_loss_finite_and_decomposed():
    params = init_csm_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    loss, metrics = csm_loss(params, CFG, _batch(), decoder_frames=2)
    assert np.isfinite(float(loss))
    assert float(metrics["c0_loss"]) > 0
    assert float(metrics["decoder_loss"]) > 0
    # random init → near-uniform CE ≈ log(vocab)
    assert abs(float(metrics["c0_loss"]) - np.log(CFG.audio_vocab_size)) < 1.5


def test_loss_masks_text_rows():
    """A batch with NO audio rows has zero-weight losses (not NaN)."""
    B, S = 1, 8
    tokens = np.zeros((B, S, K + 1), np.int32)
    mask = np.zeros((B, S, K + 1), bool)
    mask[:, :, K] = True  # all text
    params = init_csm_params(jax.random.PRNGKey(1), CFG, jnp.float32)
    loss, metrics = csm_loss(
        params, CFG,
        Batch(jnp.asarray(tokens), jnp.asarray(mask), jnp.ones((B, S), bool)),
        decoder_frames=2,
    )
    assert np.isfinite(float(loss))
    assert float(metrics["c0_loss"]) == 0.0
    assert float(metrics["decoder_loss"]) == 0.0


def test_train_step_reduces_loss():
    params = init_csm_params(jax.random.PRNGKey(2), CFG, jnp.float32)
    tx = make_optimizer(lr=3e-3, warmup=1)
    state = init_train_state(params, tx)
    step = make_train_step(CFG, tx, decoder_frames=2)
    batch = _batch(seed=3)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert losses[-1] < losses[0], f"no learning: {losses}"
    assert all(np.isfinite(l) for l in losses)


def test_mixed_precision_step():
    """compute_dtype=bf16 with f32 params: the step's loss equals the
    loss of bf16-cast params, master params/moments stay f32 and move."""
    from sesameai_tts_tpu.training.train_step import _cast_floating

    params = init_csm_params(jax.random.PRNGKey(7), CFG, jnp.float32)
    batch = _batch(seed=9)
    tx = make_optimizer(lr=3e-3, warmup=1)

    # reference: forward on explicitly-cast bf16 params
    ref_loss, _ = csm_loss(
        _cast_floating(params, jnp.bfloat16), CFG, batch, decoder_frames=2
    )

    step = make_train_step(CFG, tx, decoder_frames=2,
                           compute_dtype=jnp.bfloat16, subset_rng=False)
    state = init_train_state(jax.tree.map(jnp.copy, params), tx)
    state, metrics = step(state, batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_loss),
                               rtol=1e-6)
    assert all(
        x.dtype == jnp.float32
        for x in jax.tree.leaves(state.params)
    ), "master params must stay f32"
    # lr is 0 at step 1 (warmup); check movement after step 2
    state, _ = step(state, batch)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params))
    )
    assert moved


def test_decoder_subset_randomizes_across_steps():
    """With subset_rng (the default), different steps train different
    audio rows — long clips are not forever onset-only (review finding).
    The per-step scores are a pure function of the step counter, so the
    same step index reproduces the same subset."""
    from sesameai_tts_tpu.training.train_step import _subset_scores

    r1 = np.asarray(_subset_scores(jnp.int32(1), 2, 16, seed=0))
    r2 = np.asarray(_subset_scores(jnp.int32(2), 2, 16, seed=0))
    r1b = np.asarray(_subset_scores(jnp.int32(1), 2, 16, seed=0))
    assert not np.array_equal(r1, r2)
    np.testing.assert_array_equal(r1, r1b)

    # distinct subsets produce distinct decoder losses on a batch whose
    # audio rows outnumber decoder_frames
    params = init_csm_params(jax.random.PRNGKey(3), CFG, jnp.float32)
    batch = _batch(B=1, S=16, seed=5)  # 8 audio rows, n=2
    _, m1 = csm_loss(params, CFG, batch, decoder_frames=2,
                     subset_r=jnp.asarray(r1[:1]))
    _, m2 = csm_loss(params, CFG, batch, decoder_frames=2,
                     subset_r=jnp.asarray(r2[:1]))
    assert float(m1["decoder_loss"]) != float(m2["decoder_loss"])
    # c0 loss covers every audio row either way
    np.testing.assert_allclose(float(m1["c0_loss"]), float(m2["c0_loss"]))


def test_sharded_train_step_on_mesh():
    """(dp=4, tp=2) mesh over the 8 virtual CPU devices."""
    from sesameai_tts_tpu.parallel.mesh import make_mesh
    from sesameai_tts_tpu.training.train_step import (
        make_sharded_train_state,
        shard_batch,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=4, tp=2)
    tx = make_optimizer()
    with mesh:
        state = make_sharded_train_state(jax.random.PRNGKey(0), CFG, mesh, tx)
        step = make_train_step(CFG, tx, decoder_frames=2)
        batch = shard_batch(_batch(B=8, seed=4), mesh)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1


def test_remat_train_step_matches():
    """jax.checkpoint over the layer scan changes memory, not math: loss
    and gradients agree with the non-remat step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.models.csm import init_csm_params
    from sesameai_tts_tpu.training.loss import Batch, csm_loss

    cfg = csm_test_tiny()
    K = cfg.audio_num_codebooks
    params = init_csm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    B, S = 2, 12
    tokens = np.zeros((B, S, K + 1), np.int32)
    mask = np.zeros((B, S, K + 1), bool)
    tokens[:, : S // 2, K] = rng.integers(0, cfg.text_vocab_size, (B, S // 2))
    mask[:, : S // 2, K] = True
    tokens[:, S // 2 :, :K] = rng.integers(0, cfg.audio_vocab_size, (B, S // 2, K))
    mask[:, S // 2 :, :K] = True
    batch = Batch(tokens=jnp.asarray(tokens), mask=jnp.asarray(mask),
                  loss_mask=jnp.ones((B, S), bool))

    def loss_of(remat):
        (l, _), g = jax.value_and_grad(
            lambda p: csm_loss(p, cfg, batch, 2, remat=remat), has_aux=True
        )(params)
        return l, g

    l0, g0 = loss_of(False)
    l1, g1 = loss_of(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_applies_to_unstacked_layout_too():
    """remat must not silently no-op for unstacked (per-layer) params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.models.csm import embed_frames, init_csm_params, unstack_csm_params
    from sesameai_tts_tpu.models.transformer import precompute_rope, transformer_forward

    cfg = csm_test_tiny()
    bb = cfg.backbone
    params = init_csm_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    u = unstack_csm_params(params)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, bb.embed_dim))
    rope = precompute_rope(bb)
    pos = jnp.zeros((2,), jnp.int32)

    def loss(trunk, remat):
        h, _ = transformer_forward(trunk, bb, x, pos, None, rope, remat=remat)
        return (h.astype(jnp.float32) ** 2).mean()

    g0 = jax.grad(lambda t: loss(t, False))(u["backbone"])
    g1 = jax.grad(lambda t: loss(t, True))(u["backbone"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
