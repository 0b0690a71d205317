"""Top-k + temperature sampling, fully on device.

Distributionally equivalent to the reference sampler (reference
sesameai/models.py:72-87): temperature-scale, keep top-k, renormalize,
draw via the exponential/Gumbel trick.  The reference's
``_multinomial_sample_one_no_sync`` exists to dodge a CUDA sync; on TPU
the whole sampler lives inside the jitted frame program, so there is
nothing to sync — a Gumbel-argmax over the top-k-masked logits is the
same distribution in one fused pass.

With ``topk == 1`` this is exact greedy argmax (used by parity tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_topk(
    key: jax.Array,
    logits: jnp.ndarray,  # (..., vocab)
    topk: int,
    temperature: float | jnp.ndarray,
    gumbel: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Returns int32 samples with shape ``logits.shape[:-1]``.

    ``gumbel`` may be precomputed (one batched RNG op for a whole frame's
    32 draws beats 32 small per-step ops inside a scan)."""
    logits = logits.astype(jnp.float32) / temperature
    kth = jax.lax.top_k(logits, topk)[0][..., -1:]
    masked = jnp.where(logits < kth, -jnp.inf, logits)
    if gumbel is None:
        gumbel = jax.random.gumbel(key, logits.shape, jnp.float32)
    return jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)
