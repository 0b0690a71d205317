"""Weight-only int8 quantization: accuracy + pipeline integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesameai_tts_tpu.ops.quant import (
    is_quantized,
    qdot,
    quantize_csm,
    quantize_weight,
)


def test_quantize_weight_accuracy():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8
    deq = qw["q"].astype(jnp.float32) * qw["scale"][None, :]
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # int8 per-channel: <1% of max


def test_qdot_matches_dense():
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 64)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    ref = x @ w
    out = qdot(x, quantize_weight(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.05, atol=0.02)
    # plain arrays pass through untouched
    np.testing.assert_allclose(np.asarray(qdot(x, w)), np.asarray(ref), rtol=1e-6)


def test_quantized_csm_generates():
    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.models.csm import generate_frame, init_csm_params, init_state

    cfg = csm_test_tiny()
    K = cfg.audio_num_codebooks
    params = init_csm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_csm(params)
    assert is_quantized(qparams["backbone"]["layers"]["qkv"])
    assert not is_quantized(qparams["audio_head"])

    rng = np.random.default_rng(0)
    tokens = np.zeros((1, 6, K + 1), np.int32)
    mask = np.zeros((1, 6, K + 1), bool)
    tokens[0, :, K] = rng.integers(0, cfg.text_vocab_size, 6)
    mask[0, :, K] = True

    f_q, _ = generate_frame(
        qparams, cfg, init_state(cfg, 1, jnp.float32),
        jnp.asarray(tokens), jnp.asarray(mask), jax.random.PRNGKey(1), 1.0, 1,
    )
    f = np.asarray(f_q)
    assert f.shape == (1, K)
    assert (f >= 0).all() and (f < cfg.audio_vocab_size).all()

    # int8 logits stay close to dense logits → greedy tokens mostly agree
    f_d, _ = generate_frame(
        params, cfg, init_state(cfg, 1, jnp.float32),
        jnp.asarray(tokens), jnp.asarray(mask), jax.random.PRNGKey(1), 1.0, 1,
    )
    agree = (f == np.asarray(f_d)).mean()
    assert agree >= 0.5, f"quantized greedy diverged too much: {agree}"
