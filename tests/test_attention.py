"""Pallas flash attention vs the XLA reference attention (interpret mode
on CPU; the real kernel path compiles on TPU)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesameai_tts_tpu.ops.attention import flash_attention


def _reference(q, k, v, pos0, valid_end):
    B, H, S, hd = q.shape
    KV, T = k.shape[1], k.shape[2]
    G = H // KV
    positions = pos0[:, None] + jnp.arange(S)[None, :]
    key_pos = jnp.arange(T)
    mask = (key_pos[None, None, :] <= positions[:, :, None]) & (
        key_pos[None, None, :] < valid_end[:, None, None]
    )
    qr = q.reshape(B, KV, G, S, hd)
    logits = jnp.einsum("bkgsh,bkth->bkgst", qr, k) / math.sqrt(hd)
    logits = jnp.where(mask[:, None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgst,bkth->bkgsh", probs, v)
    return out.reshape(B, H, S, hd)


@pytest.mark.parametrize("B,H,KV,S,T,hd,pos0", [
    (1, 4, 2, 128, 256, 64, 0),
    (1, 4, 2, 128, 256, 64, 100),  # decode-extension window
    (2, 8, 2, 256, 256, 64, 0),
])
def test_flash_matches_reference(B, H, KV, S, T, hd, pos0):
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, H, S, hd), jnp.float32)
    k = jax.random.normal(kk, (B, KV, T, hd), jnp.float32)
    v = jax.random.normal(kv_, (B, KV, T, hd), jnp.float32)
    p0 = jnp.full((B,), pos0, jnp.int32)
    valid = jnp.full((B,), pos0 + S - 7, jnp.int32)  # right-padded rows

    ref = _reference(q, k, v, p0, valid)
    out = flash_attention(q, k, v, p0, valid, interpret=True)

    # rows whose position < valid_end are meaningful; compare those
    ok_rows = np.arange(S) + pos0 < (pos0 + S - 7)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, ok_rows], np.asarray(ref)[:, :, ok_rows],
        rtol=2e-4, atol=2e-4,
    )
