"""LoRA finetuning: low-rank adapters over the CSM linears.

Greenfield capability (the reference is inference-only, SURVEY.md §5).
Rationale on TPU: full-parameter AdamW triples the parameter HBM
footprint (m + v); LoRA trains ~1% of the leaves so the optimizer state
is negligible and the base params stay frozen (no donation churn).
The forward MERGES the adapters into the dense weights inside the jitted
step — one small matmul + add per target leaf, fused by XLA — so the
model code needs no LoRA-awareness and TP shardings propagate from the
base weight (adapters replicate; they are tiny).

Layout contract: target leaves are either stacked-layer ``(L, din,
dout)`` (the trunk layout, models/transformer.py) or plain ``(din,
dout)``; the adapter pair is ``A: (..., din, r)`` (scaled normal init)
and ``B: (..., r, dout)`` (zeros — merge at init is exactly the base).
ΔW = (alpha / r) · A @ B, the standard LoRA parameterization.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# trunk linears; embeddings/heads stay frozen by default (the published
# LoRA recipe: adapt attention + MLP projections)
DEFAULT_TARGETS = ("qkv", "o_proj", "w13", "w2")


def _is_target(path: Tuple[str, ...], targets: Sequence[str]) -> bool:
    return path[-1] in targets


def _iter_leaves(params: dict, prefix: Tuple[str, ...] = ()):
    for k in sorted(params):
        v = params[k]
        if isinstance(v, dict):
            yield from _iter_leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def init_lora_params(
    key: jax.Array,
    params: dict,
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """→ pytree of ``{path...: {"a": A, "b": B}}`` mirroring ``params``.

    Only leaves whose final path component is in ``targets`` (and which
    are ≥2-D) get adapters.  ``B`` is zeros so the merged model at init
    is bit-identical to the base.
    """
    assert rank >= 1, f"rank must be ≥ 1, got {rank}"
    lora: dict = {}
    leaves = [
        (path, v) for path, v in _iter_leaves(params)
        if _is_target(path, targets) and getattr(v, "ndim", 0) >= 2
    ]
    if not leaves:
        raise ValueError(f"no LoRA targets matched {targets!r}")
    matched_names = {path[-1] for path, _ in leaves}
    unmatched = [t for t in targets if t not in matched_names]
    if unmatched:
        # a typo ('oproj', a stray space) must not silently train fewer
        # adapters — the run would complete with a quietly weaker model
        raise ValueError(
            f"LoRA target(s) {unmatched!r} matched no parameter leaf; "
            f"available leaf names include "
            f"{sorted({p[-1] for p, v in _iter_leaves(params) if getattr(v, 'ndim', 0) >= 2})}"
        )
    keys = jax.random.split(key, len(leaves))
    for k, (path, v) in zip(keys, leaves):
        *batch, din, dout = v.shape
        a = jax.random.normal(k, (*batch, din, rank), dtype) / jnp.sqrt(
            jnp.asarray(din, dtype)
        )
        b = jnp.zeros((*batch, rank, dout), dtype)
        node = lora
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = {"a": a, "b": b}
    return lora


def merge_lora(params: dict, lora: dict, alpha: float = 16.0) -> dict:
    """Dense params with ΔW = (alpha/r)·A@B added on every adapted leaf.

    Pure function of both trees — safe inside jit; the contraction
    broadcasts over any leading (layer-stack) axes.
    """

    def walk(p: dict, l: dict) -> dict:
        out = {}
        for k, v in p.items():
            if k in l and isinstance(l[k], dict) and "a" in l[k]:
                a, b = l[k]["a"], l[k]["b"]
                rank = a.shape[-1]
                delta = (alpha / rank) * (a @ b)
                out[k] = v + delta.astype(v.dtype)
            elif isinstance(v, dict):
                out[k] = walk(v, l.get(k, {}))
            else:
                out[k] = v
        return out

    return walk(params, lora)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
