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
from typing import Optional, Union

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


def is_quantized4(w) -> bool:
    return isinstance(w, dict) and "q4" in w


def _dequant(w: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (w["q"].astype(jnp.float32) * w["scale"][..., None, :]).astype(dtype)


# ---------------------------------------------------------------------------
# int4 (group-wise) weight-only quantization
#
# Half the bytes of int8 again — the AR decode is pure weight streaming,
# so int4 moves the roofline ~2× on the trunks.  Group-wise scales
# (default 128 input rows per group, the standard near-lossless serving
# recipe) keep quantization error far below per-channel int4.
#
# Packing: two nibbles per int8 byte, SPLIT-HALF layout — byte[d, f]
# holds row d (low nibble) and row d + D/2 (high nibble).  The kernel
# then computes x_lo @ W_lo + x_hi @ W_hi without any interleaving.
# ---------------------------------------------------------------------------


def quantize_weight_int4(w: jnp.ndarray, group: int = 128) -> dict:
    """(in, out) float → {"q4": int8 (in/2, out) packed nibbles,
    "scale": f32 (in/group, out)}."""
    wf = jnp.asarray(w, jnp.float32)
    D, F = wf.shape
    assert D % (2 * group) == 0, f"in-dim {D} not divisible by 2*group={2*group}"
    G = D // group
    gw = wf.reshape(G, group, F)
    scale = jnp.max(jnp.abs(gw), axis=1) / 7.0  # (G, F)
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(
        jnp.round(gw / scale[:, None, :]), -8, 7
    ).astype(jnp.int8).reshape(D, F)
    lo, hi = q[: D // 2], q[D // 2 :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)),
        jnp.left_shift(hi, 4).astype(jnp.int8),
    )
    return {"q4": packed, "scale": scale}


def _unpack_int4(packed: jnp.ndarray):
    """(D/2, F) packed → (lo (D/2, F), hi (D/2, F)) int8 in [-8, 7]."""
    lo = jnp.bitwise_and(packed, jnp.int8(0x0F))
    lo = jnp.bitwise_xor(lo, jnp.int8(8)) - jnp.int8(8)  # sign-extend nibble
    hi = jnp.right_shift(packed, 4)  # arithmetic shift on signed int8
    return lo, hi


def _dequant4(w: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    if w["q4"].ndim == 3:  # stacked (L, D/2, F) leaves
        return jax.vmap(lambda q4, s: _dequant4({"q4": q4, "scale": s}, dtype))(
            w["q4"], w["scale"]
        )
    lo, hi = _unpack_int4(w["q4"])
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)  # (D, F)
    G, F = w["scale"].shape
    D = q.shape[0]
    group = D // G
    return (
        (q.reshape(G, group, F) * w["scale"][:, None, :])
        .reshape(D, F)
        .astype(dtype)
    )


# ---------------------------------------------------------------------------
# (A native-s4 jnp.int4 storage variant lived here through round 3.  It
# was DELETED after measurement: this platform crashes on jnp.int4
# arrays outside a single jit (RecursionError in eager device_put and at
# every jit boundary), and the s4 pallas matvec measured 3.2× SLOWER
# than int8 — no fast s4→bf16 path in this Mosaic.  See CLAUDE.md
# "int4 in ALL forms loses to int8 here; stop retrying".)
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


def _q4mv_kernel_factory(D: int, G: int, panel: int = 256):
    """Kernel over one F tile: unpack nibbles in VMEM panel-by-panel
    (the i32 widening of a whole tile would be 4× its bytes — VMEM OOM
    for big in-dims), per-group partial dots, scale, accumulate."""
    D2 = D // 2
    group = D // G
    G2 = G // 2  # groups per packed half
    # largest panel ≤ `panel` that divides the group (any group size works)
    panel = next(p for p in range(min(panel, group), 0, -1) if group % p == 0)

    def kernel(x_ref, q_ref, s_ref, o_ref):
        x = x_ref[:]  # (S, D) bf16
        acc = jnp.zeros(o_ref.shape, jnp.float32)
        for g in range(G2):
            for p in range(group // panel):
                r0 = g * group + p * panel
                # Mosaic cannot legalize int8 vector arithmetic; widen the
                # PANEL to i32, then straight to bf16
                q = q_ref[r0 : r0 + panel].astype(jnp.int32)
                lo = (jnp.bitwise_xor(jnp.bitwise_and(q, 0x0F), 8) - 8).astype(
                    jnp.bfloat16
                )
                hi = jnp.right_shift(q, 4).astype(jnp.bfloat16)
                p_lo = jax.lax.dot(
                    x[:, r0 : r0 + panel], lo,
                    preferred_element_type=jnp.float32,
                )
                p_hi = jax.lax.dot(
                    x[:, D2 + r0 : D2 + r0 + panel], hi,
                    preferred_element_type=jnp.float32,
                )
                acc = acc + p_lo * s_ref[g] + p_hi * s_ref[G2 + g]
        o_ref[:] = acc.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_f",))
def quant4_matmul_pallas(x: jnp.ndarray, q4: jnp.ndarray, scale: jnp.ndarray,
                         block_f: int = 512) -> jnp.ndarray:
    """x (S, D) @ dequant4(q4 (D/2, F), scale (G, F)) → (S, F) in x.dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, D = x.shape
    D2, F = q4.shape
    G = scale.shape[0]
    assert D == 2 * D2 and G % 2 == 0
    nf = F // block_f
    assert nf * block_f == F

    return pl.pallas_call(
        _q4mv_kernel_factory(D, G),
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((S, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D2, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, F), x.dtype),
    )(x, q4, scale)


# ---------------------------------------------------------------------------
# Fused SwiGLU MLP kernel: silu(x@W1)·(x@W3) @ W2 in ONE pallas_call.
#
# The unfused path is two kernels (w13 then w2) with a kernel boundary
# between them: the DMA pipeline drains/refills at the boundary and the
# (S, 2F) hidden round-trips through HBM.  Fusing tiles the INTERMEDIATE
# dim instead: grid step i streams w1/w3 column-tile i and the matching
# w2 row-tile, computes the partial SwiGLU contraction entirely in VMEM,
# and accumulates into an f32 scratch.  Every weight byte is still read
# exactly once; the hidden activations never exist in HBM.
#
# Numerics: the w13 half matches the unfused kernel bit-for-bit (output
# columns are independent, so tiling F doesn't change them, and the
# f32·scale→bf16→silu sequence is replicated).  The w2 contraction sums
# per-tile f32 partials instead of one long MXU accumulation — same
# precision class, not bit-identical.
# ---------------------------------------------------------------------------


def _qmlp_kernel_factory(last_i: int):
    def kernel(x_ref, q1_ref, q3_ref, s1_ref, s3_ref, q2_ref, s2_ref,
               o_ref, acc_ref):
        from jax.experimental import pallas as pl

        i = pl.program_id(0)
        x = x_ref[:]  # (S, D) bf16, VMEM-resident across steps
        a1 = jax.lax.dot(
            x, q1_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32
        ) * s1_ref[:]
        a3 = jax.lax.dot(
            x, q3_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32
        ) * s3_ref[:]
        # replicate the unfused dtype walk: qdot emits bf16, silu runs f32
        h = (
            jax.nn.silu(a1.astype(jnp.bfloat16).astype(jnp.float32))
            .astype(jnp.bfloat16)
            * a3.astype(jnp.bfloat16)
        )
        part = jax.lax.dot(
            h, q2_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )

        @pl.when(i == 0)
        def _init():
            acc_ref[:] = part

        @pl.when(i > 0)
        def _acc():
            acc_ref[:] += part

        @pl.when(i == last_i)
        def _emit():
            o_ref[:] = (acc_ref[:] * s2_ref[:]).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_i", "interpret"))
def quant_mlp_pallas(x: jnp.ndarray, q13: jnp.ndarray, s13: jnp.ndarray,
                     q2: jnp.ndarray, s2: jnp.ndarray,
                     block_i: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """silu(x@W1)·(x@W3) @ W2 with all three weights int8, one kernel.

    x (S, D); q13 (D, 2F) int8 (w1 cols [:F], w3 cols [F:]); s13 (2F,);
    q2 (F, Dout) int8; s2 (Dout,).  Returns (S, Dout) in x.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, D = x.shape
    F = q13.shape[-1] // 2
    Dout = q2.shape[-1]
    ni = F // block_i
    assert ni * block_i == F, f"F={F} not divisible by block_i={block_i}"

    return pl.pallas_call(
        _qmlp_kernel_factory(ni - 1),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((S, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            # q13 appears twice: w1 tile i and w3 tile (ni + i)
            pl.BlockSpec((D, block_i), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, block_i), lambda i, _n=ni: (0, _n + i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_i), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_i), lambda i, _n=ni: (0, _n + i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, Dout), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, Dout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Dout), x.dtype),
        scratch_shapes=[pltpu.VMEM((S, Dout), jnp.float32)],
        interpret=interpret,
    )(x, q13, q13, s13.reshape(1, -1), s13.reshape(1, -1), q2,
      s2.reshape(1, -1))


import os

# F-tile sizing: bigger tiles → fewer grid steps and larger DMA bursts,
# bounded by VMEM (tile + its double buffer must fit alongside x).
# Overridable for kernel experiments without editing call sites.
_VMEM_TILE_BUDGET = int(os.environ.get("QUANT_TILE_BUDGET_BYTES", 6 * 2**20))


def _block_f_for(F: int, D: int = 0, itemsize: int = 1) -> int:
    cap = _VMEM_TILE_BUDGET // max(D * itemsize, 1) if D else 512
    for b in (2048, 1024, 512, 256, 128):
        if b <= cap and F % b == 0:
            return b
    return 0


def qdot(x: jnp.ndarray, w: Union[jnp.ndarray, dict]) -> jnp.ndarray:
    """Matmul against a maybe-quantized weight (int8 or packed int4).

    Small-S (decode) on TPU → Pallas dequant kernel; otherwise dequant +
    plain dot (compute-bound regime / CPU tests).
    x: (..., in); w: (in, out) array or quant dict.

    Precision contract: every quantized Pallas path computes the dot in
    bf16 activations × bf16-dequantized weights with f32 accumulation
    (the int4 kernels cast x explicitly; the int8 kernel dequantizes the
    weight to bf16, which makes the MXU compute bf16-grade even for f32
    x).  An f32 caller gets f32 back, but not f32 dot precision — same
    contract across int8/int4.
    """
    if is_quantized4(w):
        lead = x.shape[:-1]
        D = x.shape[-1]
        F = w["q4"].shape[-1]
        S = int(np.prod(lead)) if lead else 1
        use_pallas = (
            S <= 64
            and D >= 256
            and F >= 512
            and jax.default_backend() not in ("cpu",)
            and _block_f_for(F, D // 2) > 0
        )
        if use_pallas:
            out = quant4_matmul_pallas(
                x.reshape(S, D).astype(jnp.bfloat16), w["q4"], w["scale"],
                block_f=_block_f_for(F, D // 2),
            )
            return out.reshape(*lead, F).astype(x.dtype)
        return x @ _dequant4(w, x.dtype)

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
        and _block_f_for(F, D) > 0
    )
    if use_pallas:
        out = quant_matmul_pallas(
            x.reshape(S, D), w["q"], w["scale"], block_f=_block_f_for(F, D)
        )
        return out.reshape(*lead, F)
    return x @ _dequant(w, x.dtype)


def qmlp(x: jnp.ndarray, w13, w2) -> jnp.ndarray:
    """SwiGLU MLP against maybe-quantized weights: silu(x@W1)·(x@W3) @ W2.

    With ``QUANT_FUSED_MLP=1``, both trunks int8 + decode-sized S on TPU
    takes the fused single-kernel path (one DMA stream over w1/w3/w2,
    hidden never touches HBM); the default is the exact unfused sequence
    (two ``qdot``s).

    Measured on v5e (CSM-1B decode, 10 s utterance): fused 0.0978 RTF vs
    unfused 0.0965 — the 16 MB scoped-vmem stack caps the fused
    backbone tile at block_i=1024 (3 tiles/step), losing more DMA-burst
    width than the saved kernel boundary is worth, so fused stays
    opt-in for future shapes rather than the default.
    """
    fused_ok = (
        os.environ.get("QUANT_FUSED_MLP", "0") == "1"
        and is_quantized(w13)
        and is_quantized(w2)
        and w13["q"].ndim == 2
        and jax.default_backend() not in ("cpu",)
    )
    if fused_ok:
        lead = x.shape[:-1]
        D = x.shape[-1]
        F = w13["q"].shape[-1] // 2
        Dout = w2["q"].shape[-1]
        S = int(np.prod(lead)) if lead else 1
        block_i = _block_i_for(F, D, Dout)
        if S <= 64 and D >= 128 and Dout >= 128 and block_i > 0:
            out = quant_mlp_pallas(
                x.reshape(S, D), w13["q"], w13["scale"], w2["q"], w2["scale"],
                block_i=block_i,
            )
            return out.reshape(*lead, Dout)
    a = qdot(x, w13)
    F = a.shape[-1] // 2
    gate = jax.nn.silu(a[..., :F].astype(jnp.float32)).astype(x.dtype)
    return qdot(gate * a[..., F:], w2)


def _block_i_for(F: int, D: int, Dout: int) -> int:
    """Intermediate-tile width: per grid step the kernel streams a w1, a
    w3 (D×bi each) and a w2 (bi×Dout) int8 tile — all three count against
    the VMEM tile budget (the TPU scoped-vmem stack limit is 16 MB; a
    per-tile budget at bi=2048 was measured to OOM it)."""
    cap = _VMEM_TILE_BUDGET // max(2 * D + Dout, 1)
    for b in (2048, 1024, 512, 256):
        if b <= cap and F % b == 0:
            return b
    return 0


# ---------------------------------------------------------------------------
# pytree helpers
# ---------------------------------------------------------------------------

_TRUNK_QUANT_KEYS = ("qkv", "o_proj", "w13", "w2")


def dequantize_csm(params: dict, dtype=jnp.bfloat16) -> dict:
    """Materialize bf16 trunks from a quantized tree ONCE (prefill shadow).

    Long prefills are compute-bound and ran through a dense-dequant
    fallback that re-materialized every weight per call; a persistent
    bf16 shadow costs HBM once and makes prefill a plain bf16 forward.
    Non-trunk leaves are shared by reference (no copies)."""

    def deq_leaf(w):
        if is_quantized4(w):
            return _dequant4(w, dtype)
        if is_quantized(w):
            return _dequant(w, dtype)
        return w

    def deq_trunk(trunk):
        if isinstance(trunk["layers"], (list, tuple)):  # unstacked
            return {
                "layers": tuple(
                    {k: deq_leaf(wl[k]) for k in wl} for wl in trunk["layers"]
                ),
                "final_norm": trunk["final_norm"],
            }
        return {
            "layers": {k: deq_leaf(v) for k, v in trunk["layers"].items()},
            "final_norm": trunk["final_norm"],
        }

    out = dict(params)
    out["backbone"] = deq_trunk(params["backbone"])
    out["decoder"] = deq_trunk(params["decoder"])
    return out


def quantize_trunk(trunk_params: dict, bits: int = 8,
                   group: Optional[int] = None) -> dict:
    """``bits=4`` packs nibbles with half-matrix scale groups by default
    (group = in_dim/2): the measured-fastest kernel configuration — one
    dot per packed half; finer groups (e.g. 128) raise weight SNR ~1.5 dB
    but cost one dot pair per group (measured 8.6 vs 7.0 ms/frame on the
    CSM decode)."""
    out = {"layers": dict(trunk_params["layers"]), "final_norm": trunk_params["final_norm"]}
    for k in _TRUNK_QUANT_KEYS:
        w = trunk_params["layers"][k]
        if bits == 4:
            g = group or w.shape[-2] // 2
            # stacked (L, in, out) → vmap the per-matrix int4 packer
            if w.ndim == 3:
                out["layers"][k] = jax.vmap(
                    lambda m: quantize_weight_int4(m, g)
                )(w)
            else:
                out["layers"][k] = quantize_weight_int4(w, g)
        else:
            out["layers"][k] = quantize_weight(w)
    return out


def quantize_csm(
    params: dict, backbone: bool = True, decoder: bool = True, bits: int = 8
) -> dict:
    """Quantize the trunks; embeddings and the small per-frame heads
    (codebook0_head, audio_head, projection) stay bf16 — their traffic
    is ~2% of the trunks'.  ``bits=4`` packs nibbles with half-matrix
    scale groups (group = in_dim/2, see ``quantize_trunk``); group=128
    is opt-in via ``quantize_trunk(..., group=128)``."""
    out = dict(params)
    if backbone:
        out["backbone"] = quantize_trunk(params["backbone"], bits)
    if decoder:
        out["decoder"] = quantize_trunk(params["decoder"], bits)
    return out
