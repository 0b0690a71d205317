"""Mimi's latent-domain transformer (encoder- and decoder-side).

The reference relies on moshi's ``ProjectedTransformer`` inside Mimi
(SURVEY.md C-N2): 8 pre-LayerNorm causal layers, d_model 512, 8 heads,
GELU FFN (dim 2048), LayerScale residual gains, rotary embeddings
(max_period 10 000, interleaved pairs), and a sliding attention context
of 250 latent frames (10 s at 25 Hz).

TPU-native structure: layer-stacked params under ``lax.scan``; the
sliding window is a banded mask offline and a **ring-buffer KV cache**
(slot = pos mod context) when streaming, so memory is O(context) and the
program shape is fixed for any stream length.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sesameai_tts_tpu.models.transformer import apply_rope


@dataclass(frozen=True)
class CodecTransformerConfig:
    num_layers: int = 8
    d_model: int = 512
    num_heads: int = 8
    dim_feedforward: int = 2048
    context: int = 250
    max_period: float = 10_000.0
    layer_scale: float = 0.01
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def precompute_codec_rope(cfg: CodecTransformerConfig, max_len: int) -> jnp.ndarray:
    hd = cfg.head_dim
    exponents = jnp.arange(0, hd, 2, dtype=jnp.float32) / hd
    freqs = 1.0 / (cfg.max_period**exponents)
    t = jnp.arange(max_len, dtype=jnp.float32)
    angles = t[:, None] * freqs[None, :]
    return jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)


def init_codec_transformer(key: jax.Array, cfg: CodecTransformerConfig, dtype=jnp.float32) -> dict:
    L, D, F = cfg.num_layers, cfg.d_model, cfg.dim_feedforward
    ks = jax.random.split(key, 6)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape) * fan_in**-0.5).astype(dtype)

    return {
        "layers": {
            "norm1_w": jnp.ones((L, D), dtype),
            "norm1_b": jnp.zeros((L, D), dtype),
            # packed qkv, stored (in, out) — moshi's in_proj transposed
            "qkv": w(ks[0], (L, D, 3 * D), D),
            "out": w(ks[1], (L, D, D), D),
            "norm2_w": jnp.ones((L, D), dtype),
            "norm2_b": jnp.zeros((L, D), dtype),
            "lin1": w(ks[2], (L, D, F), D),
            "lin2": w(ks[3], (L, F, D), F),
            "ls1": jnp.full((L, D), cfg.layer_scale, dtype),
            "ls2": jnp.full((L, D), cfg.layer_scale, dtype),
        }
    }


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


class CodecKVCache(NamedTuple):
    """Ring-buffer cache: (L, B, H, capacity, hd) + stored absolute positions.

    Capacity must exceed ``context + chunk - 1`` so a chunk's writes never
    clobber keys still inside earlier queries' sliding windows; the window
    itself is enforced by the position mask, not the ring size.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    key_pos: jnp.ndarray  # (L, B, capacity) int32, -1 = empty


def init_codec_cache(
    cfg: CodecTransformerConfig, batch: int, dtype=jnp.float32, max_chunk: int = 128
) -> CodecKVCache:
    cap = cfg.context + max_chunk
    shape = (cfg.num_layers, batch, cfg.num_heads, cap, cfg.head_dim)
    return CodecKVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        key_pos=jnp.full((cfg.num_layers, batch, cap), -1, jnp.int32),
    )


def codec_transformer_forward(
    params: dict,
    cfg: CodecTransformerConfig,
    x: jnp.ndarray,  # (B, S, D)
    pos0: jnp.ndarray,  # (B,) int32
    rope_cs: jnp.ndarray,  # (max_len, hd/2, 2)
    cache: Optional[CodecKVCache] = None,
) -> Tuple[jnp.ndarray, Optional[CodecKVCache]]:
    B, S, D = x.shape
    H, hd, C = cfg.num_heads, cfg.head_dim, cfg.context
    if cache is not None:
        cap = cache.k.shape[-2]
        # a chunk larger than the ring slack would clobber keys still inside
        # earlier queries' sliding windows — silently wrong audio
        assert S <= cap - C, (
            f"streaming chunk of {S} positions exceeds the ring slack "
            f"({cap - C}); enlarge init_codec_cache(max_chunk=...)"
        )
    positions = pos0[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    rope_win = rope_cs[positions]

    def one_layer(h, wl, lk, lv, lkp):
        hn = _layer_norm(h, wl["norm1_w"], wl["norm1_b"], cfg.norm_eps)
        qkv = hn @ wl["qkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rope(q.reshape(B, S, H, hd), rope_win).transpose(0, 2, 1, 3)
        k = apply_rope(k.reshape(B, S, H, hd), rope_win).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

        if lk is not None:
            # ring write: slot = pos mod capacity (capacity > context + S - 1)
            slots = positions % lk.shape[-2]  # (B, S)

            def write(buf, new, slot_b):
                return buf.at[:, slot_b, :].set(new)  # (H, C, hd) ← (H, S, hd)

            lk = jax.vmap(write)(lk, k, slots)
            lv = jax.vmap(write)(lv, v, slots)
            lkp = jax.vmap(lambda kp, s, p: kp.at[s].set(p))(lkp, slots, positions)
            # mask: key present, causal, within sliding window
            diff = positions[:, :, None] - lkp[:, None, :]  # (B, S, C)
            mask = (lkp[:, None, :] >= 0) & (diff >= 0) & (diff < C)
            logits = jnp.einsum("bhsd,bhtd->bhst", q, lk, preferred_element_type=jnp.float32)
        else:
            diff = positions[:, :, None] - positions[:, None, :]
            mask = (diff >= 0) & (diff < C)
            logits = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32)
            lv = v

        logits = logits / jnp.sqrt(jnp.float32(hd))
        logits = jnp.where(mask[:, None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhst,bhtd->bhsd", probs, lv)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, D)
        h = h + wl["ls1"] * (attn @ wl["out"])

        hn = _layer_norm(h, wl["norm2_w"], wl["norm2_b"], cfg.norm_eps)
        # exact (erf) gelu: the reference transformer uses torch F.gelu /
        # ACT2FN["gelu"], not the tanh approximation jax.nn.gelu defaults
        # to — the ~3e-3 per-activation deviation would compound across
        # layers on converted real weights
        ff = jax.nn.gelu(
            (hn @ wl["lin1"]).astype(jnp.float32), approximate=False
        ).astype(h.dtype) @ wl["lin2"]
        h = h + wl["ls2"] * ff
        return h, lk, lv if lk is not None else None, lkp

    if cache is not None:

        def body(h, xs):
            wl, lk, lv, lkp = xs
            h, nk, nv, nkp = one_layer(h, wl, lk, lv, lkp)
            return h, (nk, nv, nkp)

        h, (nk, nv, nkp) = jax.lax.scan(
            body, x, (params["layers"], cache.k, cache.v, cache.key_pos)
        )
        return h, CodecKVCache(k=nk, v=nv, key_pos=nkp)
    else:

        def body_nc(h, wl):
            h, _, _, _ = one_layer(h, wl, None, None, None)
            return h, None

        h, _ = jax.lax.scan(body_nc, x, params["layers"])
        return h, None
