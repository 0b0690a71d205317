"""Causal 1-D convolutions with explicit streaming state.

The reference gets these from the ``moshi`` package's streaming conv
machinery (SURVEY.md C-N2; reference generator.py:52-57 loads Mimi).
Here they are XLA convolutions over ``(B, C, T)`` with torch-layout
``(out, in, k)`` kernels (so the moshi→JAX weight converter is a pure
rename), and streaming is a carried pytree of overlap buffers instead of
module state:

* causal conv: left-pad ``k_eff - stride`` — streamed by prepending the
  saved input tail;
* causal transposed conv: emit ``T*stride`` samples, carry the trailing
  ``k - stride`` partial sums (bias applied once on emit).

Chunk lengths must be multiples of the stride — always true here since
callers feed whole 80 ms codec frames.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def conv1d(
    x: jnp.ndarray,  # (B, C_in, T)
    w: jnp.ndarray,  # (C_out, C_in/groups, K) — torch layout
    b: Optional[jnp.ndarray],
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv_transpose1d(
    x: jnp.ndarray,  # (B, C_in, T)
    w: jnp.ndarray,  # (C_in, C_out/groups, K) — torch ConvTranspose layout
    b: Optional[jnp.ndarray],
    stride: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Full (untrimmed) transposed conv: output length T*stride + K - stride."""
    # express as lhs-dilated conv with flipped kernel
    c_in, c_out_g, K = w.shape
    # torch convtr weight (in, out/groups, K) -> conv weight (out, in/groups, K)
    if groups == 1:
        w_conv = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, K)
    else:
        w_g = w.reshape(groups, c_in // groups, c_out_g, K)
        w_conv = jnp.flip(w_g, axis=-1).transpose(0, 2, 1, 3).reshape(
            groups * c_out_g, c_in // groups, K
        )
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w_conv,
        window_strides=(1,),
        padding=[(K - 1, K - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


class ConvState(NamedTuple):
    buf: jnp.ndarray  # (B, C_in, pad) saved input tail
    primed: jnp.ndarray  # (B,) bool: False until that row saw a chunk
    # (consulted in replicate pad mode; BATCHED so slot-pool scatters can
    # treat every state leaf as batch-on-axis-0, and per-slot resets
    # re-prime independently.  No import-time jnp default — eager array
    # creation at import would initialize a backend.)


class CausalConv1d(NamedTuple):
    """Static conv spec; params live in a dict {'w': ..., 'b': ...}.

    ``pad_mode``: 'zeros' (SEANet convs) or 'replicate' (the Mimi
    downsample — kyutai pads it with the first sample, transformers
    MimiConv1d pad_mode='replicate'); streaming replicate primes the
    overlap buffer from the first chunk's first sample."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    pad_mode: str = "zeros"

    @property
    def pad(self) -> int:  # left padding for causality
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        assert k_eff >= self.stride, (
            f"effective kernel {k_eff} < stride {self.stride}: negative "
            f"causal pad (misconfigured CausalConv1d)"
        )
        return k_eff - self.stride

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        fan_in = self.in_channels // self.groups * self.kernel_size
        w = jax.random.normal(
            key, (self.out_channels, self.in_channels // self.groups, self.kernel_size)
        ) * (fan_in**-0.5)
        p = {"w": w.astype(dtype)}
        if self.bias:
            p["b"] = jnp.zeros((self.out_channels,), dtype)
        return p

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Offline causal conv over (B, C, T), T a multiple of stride."""
        mode = "edge" if self.pad_mode == "replicate" else "constant"
        x = jnp.pad(x, ((0, 0), (0, 0), (self.pad, 0)), mode=mode)
        return conv1d(
            x, params["w"], params.get("b"), self.stride, self.dilation, self.groups
        )

    def init_state(self, batch: int, dtype=jnp.float32) -> ConvState:
        return ConvState(
            buf=jnp.zeros((batch, self.in_channels, self.pad), dtype),
            primed=jnp.zeros((batch,), bool),
        )

    def apply_streaming(
        self, params: dict, x: jnp.ndarray, state: ConvState
    ) -> Tuple[jnp.ndarray, ConvState]:
        buf = state.buf.astype(x.dtype)
        if self.pad_mode == "replicate" and self.pad > 0:
            # the offline left pad replicates the FIRST sample; before any
            # chunk arrived the saved tail is a placeholder — substitute
            # this chunk's first sample, exactly the offline pad
            buf = jnp.where(
                state.primed[:, None, None], buf,
                jnp.broadcast_to(x[:, :, :1], buf.shape),
            )
        xp = jnp.concatenate([buf, x], axis=-1)
        y = conv1d(
            xp, params["w"], params.get("b"), self.stride, self.dilation, self.groups
        )
        new_buf = xp[:, :, xp.shape[-1] - self.pad :] if self.pad > 0 else xp[:, :, :0]
        return y, ConvState(buf=new_buf, primed=jnp.ones_like(state.primed))


class ConvTrState(NamedTuple):
    tail: jnp.ndarray  # (B, C_out, K - stride) pending partial sums (no bias)


class CausalConvTranspose1d(NamedTuple):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    bias: bool = True

    @property
    def trim(self) -> int:  # right trim for causality
        return self.kernel_size - self.stride

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        fan_in = self.in_channels // self.groups * self.kernel_size
        w = jax.random.normal(
            key, (self.in_channels, self.out_channels // self.groups, self.kernel_size)
        ) * (fan_in**-0.5)
        p = {"w": w.astype(dtype)}
        if self.bias:
            p["b"] = jnp.zeros((self.out_channels,), dtype)
        return p

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        y = conv_transpose1d(x, params["w"], params.get("b"), self.stride, self.groups)
        T_out = x.shape[-1] * self.stride
        return y[:, :, :T_out]

    def init_state(self, batch: int, dtype=jnp.float32) -> ConvTrState:
        return ConvTrState(
            tail=jnp.zeros((batch, self.out_channels, self.trim), dtype)
        )

    def apply_streaming(
        self, params: dict, x: jnp.ndarray, state: ConvTrState
    ) -> Tuple[jnp.ndarray, ConvTrState]:
        y = conv_transpose1d(x, params["w"], None, self.stride, self.groups)
        T_out = x.shape[-1] * self.stride
        if self.trim > 0:
            y = y.at[:, :, : self.trim].add(state.tail.astype(y.dtype))
            new_tail = y[:, :, T_out:]
        else:
            new_tail = y[:, :, :0]
        out = y[:, :, :T_out]
        if "b" in params:
            out = out + params["b"][None, :, None]
        return out, ConvTrState(tail=new_tail)
