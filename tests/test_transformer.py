"""Transformer trunk numerics.

Golden oracle: HuggingFace ``LlamaModel`` (an independent, battle-tested
implementation of the same llama3.2 architecture the reference gets from
torchtune — reference sesameai/models.py:10-39). HF uses the rotate-half
RoPE convention with permuted q/k weights; we use the meta/interleaved
convention (torchtune checkpoint layout), so the test permutes weights
when exporting to HF form — exactly what Meta→HF checkpoint conversion
does.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesameai_tts_tpu.core.config import TransformerConfig, RoPEConfig
from sesameai_tts_tpu.models.transformer import (
    init_transformer_params,
    transformer_forward,
    init_kv_cache,
    precompute_rope,
)

CFG = TransformerConfig(
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    embed_dim=32,
    max_seq_len=64,
    intermediate_dim=64,
    dtype=jnp.float32,
    rope=RoPEConfig(base=500_000.0, scale_factor=32),
)


@pytest.fixture(scope="module")
def params():
    return init_transformer_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def rope_cs():
    return precompute_rope(CFG)


def test_matches_hf_llama(params, rope_cs):
    import torch

    from oracles import build_hf_llama

    B, S = 2, 11
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, CFG.embed_dim), jnp.float32)

    ours, _ = transformer_forward(
        params, CFG, x, jnp.zeros((B,), jnp.int32), None, rope_cs
    )

    model = build_hf_llama(params, CFG)
    with torch.no_grad():
        theirs = model(
            inputs_embeds=torch.from_numpy(np.array(x, np.float32))
        ).last_hidden_state.numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward(params, rope_cs):
    """Prefill + step-by-step decode == one cache-free pass (SURVEY.md §4a)."""
    B, S = 1, 10
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, CFG.embed_dim), jnp.float32)

    full, _ = transformer_forward(
        params, CFG, x, jnp.zeros((B,), jnp.int32), None, rope_cs
    )

    cache = init_kv_cache(CFG, B)
    pre = 4
    h_pre, cache = transformer_forward(
        params, CFG, x[:, :pre], jnp.zeros((B,), jnp.int32), cache, rope_cs
    )
    outs = [h_pre]
    for t in range(pre, S):
        h_t, cache = transformer_forward(
            params, CFG, x[:, t : t + 1], jnp.full((B,), t, jnp.int32), cache, rope_cs
        )
        outs.append(h_t)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), rtol=1e-4, atol=1e-4)


def test_padded_prefill_matches_unpadded(params, rope_cs):
    """Right-padded prefill (bucketed compile) must not change valid rows or
    later decode steps."""
    B, S, PAD = 1, 7, 16
    x = jax.random.normal(jax.random.PRNGKey(3), (B, S, CFG.embed_dim), jnp.float32)
    x_pad = jnp.concatenate(
        [x, jnp.ones((B, PAD - S, CFG.embed_dim), jnp.float32)], axis=1
    )

    cache_a = init_kv_cache(CFG, B)
    h_a, cache_a = transformer_forward(
        params, CFG, x, jnp.zeros((B,), jnp.int32), cache_a, rope_cs
    )

    cache_b = init_kv_cache(CFG, B)
    h_b, cache_b = transformer_forward(
        params,
        CFG,
        x_pad,
        jnp.zeros((B,), jnp.int32),
        cache_b,
        rope_cs,
        valid_len=jnp.array([S], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(h_b[:, :S]), np.asarray(h_a), rtol=1e-4, atol=1e-4
    )

    # a decode step at position S must agree (pad KV slots masked out)
    xt = jax.random.normal(jax.random.PRNGKey(4), (B, 1, CFG.embed_dim), jnp.float32)
    ha_t, _ = transformer_forward(
        params, CFG, xt, jnp.full((B,), S, jnp.int32), cache_a, rope_cs
    )
    hb_t, _ = transformer_forward(
        params, CFG, xt, jnp.full((B,), S, jnp.int32), cache_b, rope_cs
    )
    np.testing.assert_allclose(np.asarray(hb_t), np.asarray(ha_t), rtol=1e-4, atol=1e-4)


def test_update_cache_scatter_matches_loop(monkeypatch):
    """The batched-scatter KV update (KV_UPDATE_B=scatter, S=1 decode)
    writes exactly what the chained-DUS loop writes."""
    from sesameai_tts_tpu.models.transformer import _update_cache

    B, KV, T, hd = 5, 2, 16, 8
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.normal(size=(B, KV, T, hd)).astype(np.float32))
    new = jnp.asarray(rng.normal(size=(B, KV, 1, hd)).astype(np.float32))
    pos0 = jnp.asarray([0, 3, 15, 7, 7], jnp.int32)

    monkeypatch.setenv("KV_UPDATE_B", "loop")
    out_loop = _update_cache(cache, new, pos0)
    monkeypatch.setenv("KV_UPDATE_B", "scatter")
    out_scatter = _update_cache(cache, new, pos0)
    np.testing.assert_array_equal(np.asarray(out_loop), np.asarray(out_scatter))
