"""Top-k + temperature sampling, fully on device.

Distributionally equivalent to the reference sampler (reference
sesameai/models.py:72-87): temperature-scale, keep top-k, renormalize,
draw via the exponential/Gumbel trick.  The reference's
``_multinomial_sample_one_no_sync`` exists to dodge a CUDA sync; on TPU
the whole sampler lives inside the jitted frame program, so there is
nothing to sync — a Gumbel-argmax over the top-k-masked logits is the
same distribution in one fused pass.

The top-k mask threshold (the k-th largest logit) is found by fixed-depth
bisection over the logit range instead of ``lax.top_k`` — the sort a
top_k lowers to on TPU costs more than the whole rest of the sampler,
and the CSM hot loop samples 32×/frame.  30 halvings shrink the bracket
by 2^30, far below bf16-grade logit spacing, and the resulting mask
``logits >= lo`` keeps ties at the k-th value exactly like the
``logits < kth → -inf`` sort-based mask.

With ``topk == 1`` this is exact greedy argmax (used by parity tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def topk_threshold(logits: jnp.ndarray, k: int, iters: int = 30) -> jnp.ndarray:
    """k-th largest value along the last axis via bisection.

    Invariant: count(logits >= lo) >= k and count(logits >= hi) < k
    (hi starts just above the max).  Returns lo with shape
    ``logits.shape[:-1] + (1,)``.
    """
    lo = jnp.min(logits, axis=-1, keepdims=True)
    hi = jnp.max(logits, axis=-1, keepdims=True)
    # open the top bracket so count(>= hi) < k holds from the start
    hi = hi + 0.001 * (hi - lo) + 1e-6

    # unrolled (iters is static): the CSM hot loop runs this 32×/frame
    # inside one jitted program, and a lax loop pays per-iteration
    # control overhead that straight-line scheduling does not
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        enough = jnp.sum(logits >= mid, axis=-1, keepdims=True) >= k
        lo, hi = jnp.where(enough, mid, lo), jnp.where(enough, hi, mid)
    return lo


def sample_topk(
    key: jax.Array,
    logits: jnp.ndarray,  # (..., vocab)
    topk: int,
    temperature: float | jnp.ndarray,
    gumbel: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Returns int32 samples with shape ``logits.shape[:-1]``.

    ``gumbel`` may be precomputed (one batched RNG op for a whole frame's
    32 draws beats 32 small per-step ops inside a scan).  ``temperature``
    may be a scalar or a per-batch ``(...,)`` array broadcast over vocab
    (per-slot sampling params in batched serving)."""
    logits = logits.astype(jnp.float32)
    static_k = isinstance(topk, (int, np.integer))
    if static_k and topk <= 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temperature = jnp.asarray(temperature, jnp.float32)
    if temperature.ndim:
        temperature = temperature[..., None]
    logits = logits / temperature
    if not static_k:
        # per-slot topk (batched serving): (...,) traced ints, broadcast
        # over vocab. k<=1 degenerates to greedy via the threshold; k>=V
        # keeps everything — both exact.
        k = jnp.asarray(topk, jnp.int32)[..., None]
        masked = jnp.where(logits < topk_threshold(logits, k), -jnp.inf, logits)
    elif topk < logits.shape[-1]:
        masked = jnp.where(logits < topk_threshold(logits, topk), -jnp.inf, logits)
    else:
        masked = logits
    if gumbel is None:
        gumbel = jax.random.gumbel(key, logits.shape, jnp.float32)
    return jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)
