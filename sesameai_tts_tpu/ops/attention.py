"""Pallas flash attention (SURVEY.md C-N1/C-N5 plan).

Online-softmax attention over the KV cache without materializing the
(S, T) score matrix in HBM.

Measured on v5e at CSM's scale (S=512, T=2048, 32 heads, hd 64): XLA's
fused attention is FASTER (1.8 ms vs 2.8 ms) — 2048 positions are small
enough that the materialized-scores path stays in the fusion sweet spot.
The kernel is therefore NOT wired into the default prefill; it exists
(correct, tested vs the XLA reference) for long-context variants where
the (S, T) buffer stops fitting: crossover is roughly T ≥ 8k.

Layout: q (B, H, S, hd), cache k/v (B, KV, T, hd), GQA with G = H/KV.
Masking is positional: query at absolute position p attends cache slots
t ≤ p, and (for right-padded prefill) slots t < valid_end.  Positions
are ``pos0 + row`` — contiguous windows, like everything in this
framework.

Grid: (B·H, S/BQ, T/BK), sequential on TPU; m/l/acc live in VMEM scratch
and persist across the T dimension (the canonical revisited-output flash
pattern); blocks entirely above the causal diagonal are masked (not
skipped — fixed trip count keeps the program shape static).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale, block_q, block_k):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BQ, hd)
    k = k_ref[0]  # (BK, hd)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK)

    pos0 = pos_ref[2 * bh]
    valid_end = pos_ref[2 * bh + 1]
    q_pos = pos0 + qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = (k_pos <= q_pos) & (k_pos < valid_end)
    s = jnp.where(mask, s, -jnp.inf)

    m_prev = m_ref[:]  # (BQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # rows with no valid keys yet keep m = -inf; exp(-inf - -inf) guards:
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p = jnp.exp(s - m_safe)
    p = jnp.where(mask, p, 0.0)
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,  # (B, H, S, hd)
    k: jnp.ndarray,  # (B, KV, T, hd)
    v: jnp.ndarray,
    pos0: jnp.ndarray,  # (B,) first absolute position of q rows
    valid_end: jnp.ndarray,  # (B,) cache slots ≥ this are masked
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, S, hd = q.shape
    KV, T = k.shape[1], k.shape[2]
    G = H // KV
    assert S % block_q == 0 and T % block_k == 0
    scale = 1.0 / math.sqrt(hd)

    # scalars per (b, h) grid row: [pos0_b, valid_end_b] int32
    scalars = jnp.stack([pos0.astype(jnp.int32), valid_end.astype(jnp.int32)], 1)
    scalars = jnp.repeat(scalars, H, axis=0)  # (B*H, 2)

    qf = q.reshape(B * H, S, hd)
    kf = k.reshape(B * KV, T, hd)  # GQA: index_map maps bh -> bh // G
    vf = v.reshape(B * KV, T, hd)

    grid = (B * H, S // block_q, T // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_q=block_q, block_k=block_k
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki, s: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, hd), lambda bh, qi, ki, s: (bh // G, ki, 0)),
                pl.BlockSpec((1, block_k, hd), lambda bh, qi, ki, s: (bh // G, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, hd), lambda bh, qi, ki, s: (bh, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, hd), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, S, hd), q.dtype),
        interpret=interpret,
    )(jnp.reshape(scalars, (-1,)), qf, kf, vf)
    return out.reshape(B, H, S, hd)