"""Weight-only int8 quantization + Pallas dequant-matmul kernel.

Why: single-stream AR decode on TPU is HBM-bandwidth-bound — every
frame re-reads the decoder weights 31× and the backbone once
(≈ 9.6 GB/frame in bf16, an ~12 ms/frame floor on v5e).  Storing matmul
weights as int8 with per-output-channel scales halves the bytes; the
Pallas kernel streams int8 tiles HBM→VMEM, dequantizes in VMEM and hits
the MXU — the dequantized weights never exist in HBM (a plain
``(q.astype(bf16)*s) @ x`` would materialize them and lose the win).

Quality: per-channel weight-only int8 is the standard near-lossless
serving recipe; it is opt-in (``quantize='int8'`` in ModelSpec), bf16
remains the default.

Representation: a quantized weight is the pytree dict
``{"q": int8 (..., in, out), "scale": f32 (..., out)}`` — drop-in leaf
replacement inside the layer-stacked param trees, sliced naturally by
``lax.scan``.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: jnp.ndarray) -> dict:
    """(..., in, out) float → {"q": int8, "scale": f32 (..., out)}."""
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2) / 127.0  # per output channel
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def _dequant(w: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (w["q"].astype(jnp.float32) * w["scale"][..., None, :]).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas kernel: x (S, D) bf16 @ Wq (D, F) int8·scale → (S, F)
# ---------------------------------------------------------------------------


def _qmv_kernel(x_ref, q_ref, s_ref, o_ref):
    # dequant in VMEM to bf16 (half the convert/matmul cost of f32; the
    # scale is reapplied in f32 on the small output instead)
    w = q_ref[:].astype(jnp.bfloat16)
    acc = jax.lax.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    )
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_f",))
def quant_matmul_pallas(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                        block_f: int = 512) -> jnp.ndarray:
    """x (S, D) @ dequant(q (D, F), scale (F,)) → (S, F) in x.dtype.

    Grid over F tiles; x stays resident in VMEM across tiles; each int8
    tile is DMA'd once and dequantized on-chip.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, D = x.shape
    D2, F = q.shape
    assert D == D2
    nf = F // block_f
    assert nf * block_f == F, f"F={F} not divisible by block_f={block_f}"

    return pl.pallas_call(
        _qmv_kernel,
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((S, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, F), x.dtype),
    )(x, q, scale.reshape(1, F))


def _block_f_for(F: int) -> int:
    for b in (512, 256, 128):
        if F % b == 0:
            return b
    return 0


def qdot(x: jnp.ndarray, w: Union[jnp.ndarray, dict]) -> jnp.ndarray:
    """Matmul against a maybe-quantized weight.

    Small-S (decode) on TPU → Pallas dequant kernel; otherwise dequant +
    plain dot (compute-bound regime / CPU tests).
    x: (..., in); w: (in, out) array or quant dict.
    """
    if not is_quantized(w):
        return x @ w

    lead = x.shape[:-1]
    D = x.shape[-1]
    F = w["q"].shape[-1]
    S = int(np.prod(lead)) if lead else 1
    use_pallas = (
        S <= 64
        and D >= 128  # tiny test shapes trip Mosaic tile constraints
        and F >= 512
        and jax.default_backend() not in ("cpu",)
        and _block_f_for(F) > 0
    )
    if use_pallas:
        out = quant_matmul_pallas(
            x.reshape(S, D), w["q"], w["scale"], block_f=_block_f_for(F)
        )
        return out.reshape(*lead, F)
    return x @ _dequant(w, x.dtype)


# ---------------------------------------------------------------------------
# pytree helpers
# ---------------------------------------------------------------------------

_TRUNK_QUANT_KEYS = ("qkv", "o_proj", "w13", "w2")


def quantize_trunk(trunk_params: dict) -> dict:
    out = {"layers": dict(trunk_params["layers"]), "final_norm": trunk_params["final_norm"]}
    for k in _TRUNK_QUANT_KEYS:
        out["layers"][k] = quantize_weight(trunk_params["layers"][k])
    return out


def quantize_csm(params: dict, backbone: bool = True, decoder: bool = True) -> dict:
    """Quantize the trunks; embeddings and the small per-frame heads
    (codebook0_head, audio_head, projection) stay bf16 — their traffic
    is ~2% of the trunks'."""
    out = dict(params)
    if backbone:
        out["backbone"] = quantize_trunk(params["backbone"])
    if decoder:
        out["decoder"] = quantize_trunk(params["decoder"])
    return out
