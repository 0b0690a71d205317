"""Sampler statistics: top-k threshold exactness and distributional
correctness of the Gumbel top-k sampler (reference models.py:72-87).

The χ² test draws a deterministic batch of samples under a fixed PRNG
key and compares empirical frequencies against the exact
top-k-masked/temperature-scaled softmax.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sesameai_tts_tpu.ops.sampling import sample_topk, topk_threshold


@pytest.mark.parametrize("k", [1, 3, 10, 40, 100])
def test_bisection_threshold_matches_sort(k):
    key = jax.random.PRNGKey(k)
    logits = jax.random.normal(key, (7, 257)) * 5.0
    thr = topk_threshold(logits, k)
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    # identical keep-mask (ties at the k-th value kept by both)
    np.testing.assert_array_equal(
        np.asarray(logits >= thr), np.asarray(logits >= kth)
    )


def test_greedy_is_argmax():
    logits = jax.random.normal(jax.random.PRNGKey(0), (5, 64))
    out = sample_topk(jax.random.PRNGKey(1), logits, 1, 0.8)
    np.testing.assert_array_equal(np.asarray(out), np.argmax(logits, -1))


def test_never_samples_outside_topk():
    key = jax.random.PRNGKey(2)
    logits = jax.random.normal(key, (64,)) * 3.0
    k = 5
    topset = set(np.asarray(jax.lax.top_k(logits, k)[1]).tolist())
    keys = jax.random.split(jax.random.PRNGKey(3), 512)
    draws = jax.vmap(lambda kk: sample_topk(kk, logits, k, 1.0))(keys)
    assert set(np.asarray(draws).tolist()) <= topset


def test_banned_tokens_stay_banned_and_topk_holds():
    """-inf logits (a vocab ban mask) must not poison the bracket search:
    the unguarded version returned a -inf threshold and silently sampled
    the FULL vocabulary."""
    logits = jax.random.normal(jax.random.PRNGKey(4), (64,)) * 3.0
    banned = np.zeros(64, bool)
    banned[::3] = True  # ban a third of the vocab, incl. possibly the max
    masked_logits = jnp.where(jnp.asarray(banned), -jnp.inf, logits)
    k = 5
    finite_top = set(
        np.asarray(jax.lax.top_k(masked_logits, k)[1]).tolist()
    )
    keys = jax.random.split(jax.random.PRNGKey(5), 512)
    draws = jax.vmap(lambda kk: sample_topk(kk, masked_logits, k, 1.0))(keys)
    drawn = set(np.asarray(draws).tolist())
    assert drawn <= finite_top  # never a banned token, never outside top-k


@pytest.mark.parametrize("temperature,k", [(0.7, 10), (1.3, 5)])
def test_chi_square_against_exact_distribution(temperature, k):
    V = 50
    logits = jax.random.normal(jax.random.PRNGKey(4), (V,)) * 2.0

    # exact top-k + temperature distribution
    scaled = np.asarray(logits, np.float64) / temperature
    kth = np.sort(scaled)[-k]
    masked = np.where(scaled < kth, -np.inf, scaled)
    p = np.exp(masked - masked.max())
    p /= p.sum()

    N = 20_000
    keys = jax.random.split(jax.random.PRNGKey(5), N)
    draws = np.asarray(
        jax.vmap(lambda kk: sample_topk(kk, logits, k, temperature))(keys)
    )
    counts = np.bincount(draws, minlength=V)

    support = p > 0
    assert counts[~support].sum() == 0
    chi2 = np.sum((counts[support] - N * p[support]) ** 2 / (N * p[support]))
    # df = k-1; p=0.001 critical values: df9≈27.9, df4≈18.5. Deterministic
    # fixed-key draw, so no flake risk; generous margin anyway.
    assert chi2 < 30.0, f"chi2={chi2:.1f} (df={k-1})"


def test_per_batch_temperature_broadcasts():
    logits = jnp.stack([jnp.arange(8.0), jnp.arange(8.0)[::-1]])
    temps = jnp.array([0.5, 2.0])
    out = sample_topk(jax.random.PRNGKey(6), logits, 3, temps)
    assert out.shape == (2,)
    # extreme cold temperature → effectively greedy
    cold = sample_topk(jax.random.PRNGKey(7), logits, 3, jnp.array([1e-4, 1e-4]))
    np.testing.assert_array_equal(np.asarray(cold), [7, 0])


def test_threshold_leak_bound_at_vocab_scale():
    """Exactness contract at the REAL audio-vocab size (V=2051): the
    bracket search never drops a top-k token, and any extra kept token's
    logit is within range/2^20 of the true k-th value."""
    import numpy as np

    from sesameai_tts_tpu.ops.sampling import topk_threshold

    for seed in range(20):
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.normal(size=(16, 2051)) * 8.0, jnp.float32)
        for k in (5, 40, 200, 2000):
            lo = np.asarray(topk_threshold(logits, k))
            arr = np.asarray(logits)
            kth = np.sort(arr, axis=-1)[:, -k]
            # never undercount: every true top-k token is kept
            assert (lo[:, 0] <= kth + 1e-6).all()
            # leak bound: threshold within range/2^20 of the k-th value
            rng_ = arr.max(axis=-1) - arr.min(axis=-1)
            assert (kth - lo[:, 0] <= rng_ / 2**20 + 1e-6).all()
