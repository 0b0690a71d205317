"""Llama-3.2-style transformer trunk, TPU-first.

Functionally equivalent to the torchtune ``llama3_2`` trunk the reference
builds (reference sesameai/models.py:10-39 via torchtune, SURVEY.md C-N1):
GQA attention with llama3-scaled RoPE (base 500k, scale_factor 32),
RMSNorm (eps 1e-5), SwiGLU MLP, static KV caches, embeddings-in /
hidden-out (the reference strips tok_embeddings/output to Identity,
reference models.py:48-52).

TPU-native design choices (none of these mirror the reference's torch
structure):

* **Layer-stacked parameters + ``lax.scan`` over layers** — one layer is
  traced/compiled regardless of depth; XLA pipelines the scan.
* **Contiguous-position KV caches as explicit pytrees** — caches are
  loop-carried state threaded through jitted code, never module state.
  Positions are a per-batch scalar ``pos0`` (prefill and decode are both
  windows ``[pos0, pos0+S)``), so cache writes are
  ``dynamic_update_slice``, not scatters.
* **f32 islands** — RMSNorm, RoPE and attention softmax accumulate in
  float32; weights/activations stay in the configured dtype (bf16 for
  real flavors) so matmuls hit the MXU.

Weight layout: all projection matrices are stored ``(in_features,
out_features)`` so application is ``x @ W``; the torch→JAX converter
transposes torch's ``(out, in)`` Linear layout.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sesameai_tts_tpu.core.config import TransformerConfig, RoPEConfig


# ---------------------------------------------------------------------------
# RoPE (llama3.2 scaled, interleaved/meta pairing convention as in torchtune)
# ---------------------------------------------------------------------------


def _scaled_rope_freqs(cfg: RoPEConfig, head_dim: int) -> jnp.ndarray:
    """Per-pair inverse frequencies with Meta's llama3 long-context scaling."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    freqs = 1.0 / (cfg.base**exponents)  # (head_dim/2,)

    if cfg.scale_factor and cfg.scale_factor > 1:
        low_freq_wavelen = cfg.old_context_len / cfg.low_freq_factor
        high_freq_wavelen = cfg.old_context_len / cfg.high_freq_factor
        wavelen = 2.0 * math.pi / freqs
        # three bands: long wavelengths fully rescaled, short kept, middle blended
        smooth = (cfg.old_context_len / wavelen - cfg.low_freq_factor) / (
            cfg.high_freq_factor - cfg.low_freq_factor
        )
        blended = (1.0 - smooth) * freqs / cfg.scale_factor + smooth * freqs
        freqs = jnp.where(
            wavelen > low_freq_wavelen,
            freqs / cfg.scale_factor,
            jnp.where(wavelen < high_freq_wavelen, freqs, blended),
        )
    return freqs  # (head_dim/2,) f32


def precompute_rope(cfg: TransformerConfig, max_len: Optional[int] = None) -> jnp.ndarray:
    """Returns (max_len or max_seq_len, head_dim/2, 2) [cos, sin] f32.

    ``max_len`` trims the table to the positions actually used — the CSM
    decoder only ever sees positions 0..K-1, so tracing its full 2048-row
    table into every frame program is pure constant bloat."""
    freqs = _scaled_rope_freqs(cfg.rope, cfg.head_dim)
    t = jnp.arange(max_len or cfg.max_seq_len, dtype=jnp.float32)
    angles = t[:, None] * freqs[None, :]  # (T, hd/2)
    return jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)


def apply_rope(x: jnp.ndarray, rope_cs: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs (meta/torchtune convention).

    x: (B, S, n, head_dim); rope_cs: (B, S, head_dim/2, 2) gathered at the
    token positions.  Pairs are (x[..., 2i], x[..., 2i+1]).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xe = xf[..., 0::2]
    xo = xf[..., 1::2]
    cos = rope_cs[..., 0][:, :, None, :]  # (B, S, 1, hd/2)
    sin = rope_cs[..., 1][:, :, None, :]
    re = xe * cos - xo * sin
    ro = xe * sin + xo * cos
    out = jnp.stack([re, ro], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Params / cache pytrees
# ---------------------------------------------------------------------------


def init_transformer_params(
    key: jax.Array, cfg: TransformerConfig, dtype: Optional[jnp.dtype] = None
) -> dict:
    """Random-init params; layer weights stacked along a leading L axis.

    q/k/v are fused into one ``qkv`` matmul and w1/w3 into ``w13`` —
    AR decode is dominated by many small sequential ops, so fewer, larger
    matmuls beat the torch-style separate projections (converters split/
    concat at the checkpoint boundary, core/weights.py)."""
    dtype = dtype or cfg.dtype
    L, D, F = cfg.num_layers, cfg.embed_dim, cfg.intermediate_dim
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    ks = jax.random.split(key, 4)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(dtype)

    return {
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "qkv": w(ks[0], (L, D, (H + 2 * KV) * hd), D),
            "o_proj": w(ks[1], (L, H * hd, D), H * hd),
            "mlp_norm": jnp.ones((L, D), dtype),
            "w13": w(ks[2], (L, D, 2 * F), D),
            "w2": w(ks[3], (L, F, D), F),
        },
        "final_norm": jnp.ones((D,), dtype),
    }


class KVCache(NamedTuple):
    """Static per-layer KV buffers.

    Stacked layout (training / scan path): arrays (L, B, n_kv, max_seq,
    head_dim).  Unstacked layout (the unrolled decode path): tuples of L
    per-layer (B, n_kv, max_seq, head_dim) arrays — matching unstacked
    params so no per-iteration slices of big stacked buffers appear
    inside the decode program (XLA materializes those as copies, which
    round 1 measured eating the whole int8 bandwidth win)."""

    k: jnp.ndarray
    v: jnp.ndarray


def init_kv_cache(
    cfg: TransformerConfig,
    batch_size: int,
    dtype: Optional[jnp.dtype] = None,
    max_seq_len: Optional[int] = None,
    unstacked: bool = False,
) -> KVCache:
    """Equivalent of torchtune ``setup_caches`` (reference models.py:120-130),
    but the cache is a value, not module state — callers thread it through
    jitted code and donate it for in-place reuse."""
    dtype = dtype or cfg.dtype
    T = max_seq_len or cfg.max_seq_len
    shape = (batch_size, cfg.num_kv_heads, T, cfg.head_dim)
    if unstacked:
        return KVCache(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
        )
    shape = (cfg.num_layers,) + shape
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def is_unstacked(trunk_params: dict) -> bool:
    return isinstance(trunk_params["layers"], (list, tuple))


def unstack_trunk_params(trunk_params: dict) -> dict:
    """Stacked {"layers": {name: (L, ...)}} → {"layers": (L × {name: (...)})}.

    Per-layer weights become independent buffers, so the unrolled decode
    path reads each one directly (quantized ``{"q","scale"}`` leaves both
    carry the leading L axis and slice through transparently)."""
    if is_unstacked(trunk_params):
        return trunk_params
    layers = trunk_params["layers"]
    L = jax.tree.leaves(layers)[0].shape[0]
    per_layer = tuple(
        jax.tree.map(lambda a: a[l], layers) for l in range(L)
    )
    return {"layers": per_layer, "final_norm": trunk_params["final_norm"]}


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * rms).astype(x.dtype) * scale


def _update_cache(
    cache_k: jnp.ndarray, new_k: jnp.ndarray, pos0: jnp.ndarray
) -> jnp.ndarray:
    """Write (B, KV, S, hd) into (B, KV, T, hd) at per-batch offset pos0.

    B=1 (the single-stream hot path) uses a plain dynamic_update_slice —
    a vmapped DUS can defeat XLA's in-place buffer analysis inside the
    frame-decode loop."""
    B = cache_k.shape[0]
    if B == 1:
        return jax.lax.dynamic_update_slice(
            cache_k, new_k, (jnp.int32(0), jnp.int32(0), pos0[0], jnp.int32(0))
        )
    if new_k.shape[2] == 1 and os.environ.get("KV_UPDATE_B", "loop") == "scatter":
        # one batched scatter for the decode step (S=1) — measured SLOWER
        # than the chained loop on the B=8 serving tick (10.2 vs
        # 9.2 ms/frame, same session): XLA's scatter materializes buffer
        # copies the DUS chain avoids. Kept as a toggle for future
        # platforms; equivalence-tested in test_transformer.py
        b_idx = jnp.arange(B)
        return cache_k.at[b_idx, :, pos0, :].set(new_k[:, :, 0, :])
    # chained per-slot updates keep the buffer update-in-place for small B
    # (serving slot pools); a vmapped DUS forces whole-buffer copies
    for b in range(B):
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, new_k[b : b + 1], (jnp.int32(b), jnp.int32(0), pos0[b], jnp.int32(0))
        )
    return cache_k


def _attention(
    q: jnp.ndarray,  # (B, H, S, hd)
    k: jnp.ndarray,  # (B, KV, T, hd)
    v: jnp.ndarray,  # (B, KV, T, hd)
    mask: jnp.ndarray,  # (B, S, T) bool — True = attend
) -> jnp.ndarray:
    """GQA attention with f32 softmax. XLA fuses this well for decode; a
    Pallas flash kernel covers long prefill (ops/attention.py)."""
    B, H, S, hd = q.shape
    KV = k.shape[1]
    G = H // KV
    q = q.reshape(B, KV, G, S, hd)
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum(
        "bkgsh,bkth->bkgst", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    m = mask[:, None, None, :, :]
    logits = jnp.where(m, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    # a fully-masked query row (e.g. a batched prefill row with
    # valid_len=0) softmaxes all--inf to NaN; zero it so an idle row
    # yields a finite (if meaningless) hidden state instead of NaNs that
    # poison everything downstream
    probs = jnp.where(jnp.any(m, axis=-1, keepdims=True), probs, 0.0)
    out = jnp.einsum(
        "bkgst,bkth->bkgsh", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, H, S, hd).astype(v.dtype)


def transformer_forward(
    params: dict,
    cfg: TransformerConfig,
    x: jnp.ndarray,  # (B, S, D) hidden states (embeddings already applied)
    pos0: jnp.ndarray,  # (B,) int32 — first position of this window
    cache: Optional[KVCache],  # None = cache-free full-sequence (training)
    rope_cs: jnp.ndarray,  # (max_seq, hd/2, 2) precomputed table
    valid_len: Optional[jnp.ndarray] = None,  # (B,) real rows in x (right-padded prefill)
    remat: bool = False,  # rematerialize layer activations (training memory)
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the trunk over a contiguous window of S positions.

    Serves prefill (S = prompt length, pos0 = 0), decode (S = 1) and
    training (cache=None) with the same traced program per (S, cache)
    signature.  Mirrors torchtune's per-step ``forward(h, input_pos,
    mask)`` contract (reference models.py:158, 173) without host-side
    mask gathering: masks derive from positions on device.
    """
    B, S, D = x.shape
    positions = pos0[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # (B, S)

    rope_win = rope_cs[positions]  # (B, S, hd/2, 2)

    if cache is not None:
        T = cache.k[0].shape[2] if isinstance(cache.k, (list, tuple)) else cache.k.shape[3]
        key_pos = jnp.arange(T, dtype=jnp.int32)
        # causal vs absolute cache slots; slots > current pos are never read
        mask = key_pos[None, None, :] <= positions[:, :, None]  # (B, S, T)
    else:
        T = S
        mask = jnp.tril(jnp.ones((S, S), bool))[None].repeat(B, axis=0)
    if valid_len is not None:
        # right-padded prefill: padded rows must not become attendable keys
        if cache is not None:
            abs_valid = pos0 + valid_len  # keys beyond this are garbage
            mask = mask & (key_pos[None, None, :] < abs_valid[:, None, None])
        else:
            mask = mask & (jnp.arange(S)[None, None, :] < valid_len[:, None, None])

    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    from sesameai_tts_tpu.ops.quant import qdot, qmlp

    def layer(h, wl, lk, lv):
        hn = rms_norm(h, wl["attn_norm"], cfg.norm_eps)
        qkv = qdot(hn, wl["qkv"])
        q = qkv[..., : H * hd].reshape(B, S, H, hd)
        k = qkv[..., H * hd : (H + KV) * hd].reshape(B, S, KV, hd)
        v = qkv[..., (H + KV) * hd :].reshape(B, S, KV, hd)
        q = apply_rope(q, rope_win)
        k = apply_rope(k, rope_win)
        q = q.transpose(0, 2, 1, 3)  # (B, H, S, hd)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        if lk is not None:
            lk = _update_cache(lk, k, pos0)
            lv = _update_cache(lv, v, pos0)
            attn = _attention(q, lk, lv, mask)
        else:
            attn = _attention(q, k, v, mask)
        h = h + qdot(attn.transpose(0, 2, 1, 3).reshape(B, S, H * hd), wl["o_proj"])

        hn = rms_norm(h, wl["mlp_norm"], cfg.norm_eps)
        # int8 decode fuses w13+w2 into one Pallas kernel (qmlp); the
        # dense/prefill fallback inside qmlp is this exact sequence
        h = h + qmlp(hn, wl["w13"], wl["w2"])
        return h, lk, lv

    if remat and cache is None:
        # activation rematerialization applies per layer in BOTH layouts
        layer = jax.checkpoint(layer, static_argnums=())

    if is_unstacked(params):
        # unrolled layer loop over per-layer weight buffers: every weight
        # is its own XLA buffer (no in-program slices of stacked arrays),
        # so Pallas int8 kernels stream straight from the parameter and
        # XLA can keep re-read weights VMEM-resident across decode steps
        h = x
        if cache is not None:
            nk, nv = [], []
            for wl, lk, lv in zip(params["layers"], cache.k, cache.v):
                h, lk, lv = layer(h, wl, lk, lv)
                nk.append(lk)
                nv.append(lv)
            new_cache = KVCache(k=tuple(nk), v=tuple(nv))
        else:
            for wl in params["layers"]:
                h, _, _ = layer(h, wl, None, None)
            new_cache = None
    elif cache is not None:
        # scan over layers: params (and cache) stacked on leading L axis

        def scan_body(h, xs):
            wl, lk, lv = xs
            h, lk, lv = layer(h, wl, lk, lv)
            return h, (lk, lv)

        h, (nk, nv) = jax.lax.scan(scan_body, x, (params["layers"], cache.k, cache.v))
        new_cache = KVCache(k=nk, v=nv)
    else:

        def scan_body_nc(h, wl):
            h, _, _ = layer(h, wl, None, None)
            return h, None

        # (layer is already checkpoint-wrapped above when remat=True:
        # backward recomputes each layer's activations instead of storing
        # L of them — the standard FLOPs-for-HBM trade)
        h, _ = jax.lax.scan(scan_body_nc, x, params["layers"])
        new_cache = None

    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    return h, new_cache
