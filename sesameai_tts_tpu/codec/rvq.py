"""Residual vector quantization (Mimi's split RVQ: 1 semantic + N acoustic).

The reference consumes this inside moshi's Mimi (SURVEY.md C-N2):
``SplitResidualVectorQuantizer`` — a 1-codebook semantic RVQ and an
(N-1)-codebook acoustic RVQ that both quantize the *same* 25→12.5 Hz
latent; their decoded embeddings sum.  Each RVQ: 1×1 input projection
512→256 (no bias), per-stage Euclidean codebooks (2048 × 256), residual
subtraction, and a 1×1 output projection 256→512.

On TPU the nearest-neighbour search is one ``argmax(x·Eᵀ − ‖E‖²/2)``
matmul per stage — MXU-shaped — and decode is an embedding gather + sum,
exactly the "RVQ de-quantize = embedding-sum gather" plan of
SURVEY.md C-N2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class RVQConfig:
    dimension: int = 256  # codebook dim
    input_dim: int = 512
    output_dim: int = 512
    bins: int = 2048
    n_q_semantic: int = 1
    n_q_acoustic: int = 31

    @property
    def total_codebooks(self) -> int:
        return self.n_q_semantic + self.n_q_acoustic


def _init_rvq(key: jax.Array, cfg: RVQConfig, n_q: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        # 1x1 convs stored as plain (in, out) matrices
        "input_proj": (
            jax.random.normal(k1, (cfg.input_dim, cfg.dimension)) * cfg.input_dim**-0.5
        ).astype(dtype),
        "output_proj": (
            jax.random.normal(k2, (cfg.dimension, cfg.output_dim)) * cfg.dimension**-0.5
        ).astype(dtype),
        "codebooks": jax.random.normal(k3, (n_q, cfg.bins, cfg.dimension)).astype(dtype),
    }


def init_split_rvq(key: jax.Array, cfg: RVQConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "semantic": _init_rvq(k1, cfg, cfg.n_q_semantic, dtype),
        "acoustic": _init_rvq(k2, cfg, cfg.n_q_acoustic, dtype),
    }


def _rvq_encode(params: dict, x: jnp.ndarray, n_q: int) -> jnp.ndarray:
    """x: (B, F, input_dim) → codes (B, n_q, F)."""
    z = x.astype(jnp.float32) @ params["input_proj"].astype(jnp.float32)  # (B, F, d)
    cb = params["codebooks"].astype(jnp.float32)  # (n_q, bins, d)

    def stage(residual, codebook):
        # nearest center: argmax(x·e − ‖e‖²/2)
        scores = jnp.einsum("bfd,nd->bfn", residual, codebook) - 0.5 * jnp.sum(
            codebook * codebook, axis=-1
        )
        idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (B, F)
        quantized = codebook[idx]  # (B, F, d)
        return residual - quantized, idx

    _, codes = jax.lax.scan(stage, z, cb[:n_q])
    return codes.transpose(1, 0, 2)  # (B, n_q, F)


def _rvq_decode(params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """codes: (B, n_q, F) → (B, F, output_dim)."""
    cb = params["codebooks"][: codes.shape[1]]  # (n_used, bins, d)

    def gather(codebook, idx):
        return codebook[idx]  # (B, F, d)

    embs = jax.vmap(gather, in_axes=(0, 1), out_axes=0)(cb, codes)  # (n_q, B, F, d)
    summed = jnp.sum(embs.astype(jnp.float32), axis=0)
    return summed @ params["output_proj"].astype(jnp.float32)


def split_rvq_encode(params: dict, cfg: RVQConfig, latent: jnp.ndarray, num_codebooks: int) -> jnp.ndarray:
    """latent: (B, input_dim, F) → codes (B, K, F); code 0 semantic.

    Both RVQs quantize the same latent (split design); matches
    ``mimi.set_num_codebooks(K)`` semantics (reference generator.py:54)
    via the ``num_codebooks`` cap.
    """
    total = cfg.n_q_semantic + cfg.n_q_acoustic
    if not cfg.n_q_semantic <= num_codebooks <= total:
        # _rvq_encode's cb[:n_q] slice would silently CLAMP an oversized
        # request and return fewer codebooks than asked
        raise ValueError(
            f"num_codebooks={num_codebooks} outside "
            f"[{cfg.n_q_semantic}, {total}] for this RVQ config"
        )
    x = latent.transpose(0, 2, 1)  # (B, F, D)
    sem = _rvq_encode(params["semantic"], x, cfg.n_q_semantic)
    ac = _rvq_encode(params["acoustic"], x, num_codebooks - cfg.n_q_semantic)
    return jnp.concatenate([sem, ac], axis=1)


def split_rvq_decode(params: dict, cfg: RVQConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes: (B, K, F) → latent (B, output_dim, F)."""
    sem = _rvq_decode(params["semantic"], codes[:, : cfg.n_q_semantic])
    ac = _rvq_decode(params["acoustic"], codes[:, cfg.n_q_semantic :])
    return (sem + ac).transpose(0, 2, 1)
