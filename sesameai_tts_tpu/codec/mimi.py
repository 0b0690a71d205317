"""Mimi neural audio codec, TPU-native.

Capability-parity rebuild of kyutai's Mimi codec that the reference
loads from the ``moshi`` package (SURVEY.md C-N2; reference
generator.py:52-57: ``get_mimi`` + ``set_num_codebooks(32)``;
encode at generator.py:86, decode at generator.py:116, 299):

  24 kHz mono ⇄ 12.5 Hz frames of K RVQ codes (hop 1920 samples)

Pipeline: SEANet encoder (24 kHz → 25 Hz, dim 512) → 8-layer latent
transformer → ×2 causal downsample → split RVQ (1 semantic + K−1
acoustic, 2048 bins); decode mirrors with ×2 transposed upsample.

All stages are jittable pure functions.  Streaming decode threads a
``MimiDecodeState`` pytree (conv overlap buffers + ring KV cache), which
is what lets the Generator emit audio frame-by-frame instead of the
reference's fixed 10-frame buffering (reference generator.py:61, 189).

Weight conversion from real kyutai checkpoints maps moshi state_dict
names onto this pytree (core/weights.py); random-init is used for tests
and benchmarks (identical FLOP/byte profile).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sesameai_tts_tpu.codec.conv import (
    CausalConv1d,
    CausalConvTranspose1d,
)
from sesameai_tts_tpu.codec.rvq import (
    RVQConfig,
    init_split_rvq,
    split_rvq_decode,
    split_rvq_encode,
)
from sesameai_tts_tpu.codec.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
from sesameai_tts_tpu.codec.transformer import (
    CodecKVCache,
    CodecTransformerConfig,
    codec_transformer_forward,
    init_codec_cache,
    init_codec_transformer,
    precompute_codec_rope,
)


@dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24_000
    frame_rate: float = 12.5
    num_codebooks: int = 32  # reference: mimi.set_num_codebooks(32), generator.py:54
    seanet: SEANetConfig = SEANetConfig()
    transformer: CodecTransformerConfig = CodecTransformerConfig()
    rvq: RVQConfig = RVQConfig()
    downsample_stride: int = 2  # 25 Hz encoder latent → 12.5 Hz quantizer rate

    @property
    def hop_length(self) -> int:
        """Samples per codec frame at the quantizer rate (1920 @ 24 kHz)."""
        return self.seanet.hop_length * self.downsample_stride

    @property
    def max_latent_positions(self) -> int:
        return 8192


def mimi_test_tiny() -> MimiConfig:
    """CPU-testable flavor: same topology, tiny widths."""
    return MimiConfig(
        num_codebooks=8,
        seanet=SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2)),
        transformer=CodecTransformerConfig(
            num_layers=2, d_model=32, num_heads=4, dim_feedforward=64, context=16
        ),
        rvq=RVQConfig(dimension=16, input_dim=32, output_dim=32, bins=32, n_q_acoustic=7),
    )


class Mimi:
    def __init__(self, cfg: MimiConfig):
        self.cfg = cfg
        self.encoder = SEANetEncoder(cfg.seanet)
        self.decoder = SEANetDecoder(cfg.seanet)
        d = cfg.seanet.dimension
        s = cfg.downsample_stride
        # replicate-padded like the real model (transformers MimiConv1d
        # builds the downsample with pad_mode='replicate'; zeros here
        # flipped frame-0 acoustic codes vs the torch oracle)
        self.downsample = CausalConv1d(
            d, d, 2 * s, stride=s, bias=False, pad_mode="replicate"
        )
        # the upsample is CHANNEL-WISE (groups=dimension) in the real
        # model — kyutai's historical "upsample bug", kept by every
        # published checkpoint (transformers MimiConfig.upsample_groups
        # defaults to hidden_size=512; moshi upsample_channel_wise_bug).
        # Weight shape (d, 1, 2s) so converted checkpoints load directly.
        self.upsample = CausalConvTranspose1d(
            d, d, 2 * s, stride=s, groups=d, bias=False
        )
        self._rope_cs = precompute_codec_rope(
            cfg.transformer, cfg.max_latent_positions
        )

    # -- params ------------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        ks = jax.random.split(key, 7)
        return {
            "encoder": self.encoder.init(ks[0], dtype),
            "decoder": self.decoder.init(ks[1], dtype),
            "encoder_transformer": init_codec_transformer(ks[2], self.cfg.transformer, dtype),
            "decoder_transformer": init_codec_transformer(ks[3], self.cfg.transformer, dtype),
            "downsample": self.downsample.init(ks[4], dtype),
            "upsample": self.upsample.init(ks[5], dtype),
            "quantizer": init_split_rvq(ks[6], self.cfg.rvq, dtype),
        }

    def _rope(self):
        # cached in __init__: rebuilding per call re-embedded the table
        # as a fresh constant in every trace and recomputed it eagerly
        return self._rope_cs

    def _check_latent_len(self, t25: int) -> None:
        """RoPE positions past ``max_latent_positions`` would silently
        CLAMP in the table gather (collapsing rotary angles); lengths are
        static under jit, so fail loudly at trace time instead.  The
        streaming paths reset state per session (sessions are bounded by
        max_seq_len frames ≪ this limit)."""
        if t25 > self.cfg.max_latent_positions:
            raise ValueError(
                f"{t25} latent positions exceed max_latent_positions="
                f"{self.cfg.max_latent_positions} (~"
                f"{self.cfg.max_latent_positions // 25} s of audio); "
                f"split the clip into chunks"
            )

    # -- offline -----------------------------------------------------------

    def encode(self, params: dict, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, 1, T) float in [-1, 1] → (B, K, F) int32 codes.

        T must be a multiple of hop_length (pad right with zeros to a
        whole number of 80 ms frames, as the host runtime does).
        """
        self._check_latent_len(wav.shape[-1] // self.cfg.seanet.hop_length)
        latent = self.encoder.apply(params["encoder"], wav)  # (B, D, T25)
        B = latent.shape[0]
        h, _ = codec_transformer_forward(
            params["encoder_transformer"],
            self.cfg.transformer,
            latent.transpose(0, 2, 1),
            jnp.zeros((B,), jnp.int32),
            self._rope(),
        )
        latent = h.transpose(0, 2, 1)
        latent = self.downsample.apply(params["downsample"], latent)  # (B, D, F)
        return split_rvq_encode(
            params["quantizer"], self.cfg.rvq, latent, self.cfg.num_codebooks
        )

    def decode(self, params: dict, codes: jnp.ndarray) -> jnp.ndarray:
        """(B, K, F) int32 → (B, 1, F*hop) float wav."""
        self._check_latent_len(codes.shape[-1] * self.cfg.downsample_stride)
        latent = split_rvq_decode(params["quantizer"], self.cfg.rvq, codes)  # (B, D, F)
        # dtype from the DECODER-side weights: a decode-only param tree
        # has no encoder keys, and mixed-precision trees would otherwise
        # run the decoder at the encoder's dtype
        latent = latent.astype(params["upsample"]["w"].dtype)
        latent = self.upsample.apply(params["upsample"], latent)  # (B, D, T25)
        B = latent.shape[0]
        h, _ = codec_transformer_forward(
            params["decoder_transformer"],
            self.cfg.transformer,
            latent.transpose(0, 2, 1),
            jnp.zeros((B,), jnp.int32),
            self._rope(),
        )
        return self.decoder.apply(params["decoder"], h.transpose(0, 2, 1))

    # -- streaming decode --------------------------------------------------

    class DecodeState(NamedTuple):
        upsample: tuple
        tf_cache: CodecKVCache
        tf_pos: jnp.ndarray  # (B,)
        seanet: list

    # transformer-ring headroom for one streamed chunk, in positions at
    # the post-upsample rate (init_codec_cache max_chunk)
    MAX_RING_CHUNK = 128

    @property
    def max_stream_chunk_frames(self) -> int:
        """Largest per-chunk frame count ``decode_streaming`` supports.

        The decoder transformer runs at ``upsample.stride``× the 12.5 Hz
        code rate, and its ring cache only has ``MAX_RING_CHUNK``
        positions of slack beyond the sliding-window context — a larger
        chunk would clobber keys still inside earlier queries' windows
        (asserted in codec/transformer.py). Callers dispatching frames
        in chunks must clamp to this."""
        return self.MAX_RING_CHUNK // self.upsample.stride

    def init_decode_state(self, batch: int, dtype=jnp.float32) -> "Mimi.DecodeState":
        return Mimi.DecodeState(
            upsample=self.upsample.init_state(batch, dtype),
            tf_cache=init_codec_cache(
                self.cfg.transformer, batch, dtype,
                max_chunk=self.MAX_RING_CHUNK,
            ),
            tf_pos=jnp.zeros((batch,), jnp.int32),
            seanet=self.decoder.init_state(batch, dtype),
        )

    def decode_streaming(
        self, params: dict, codes: jnp.ndarray, state: "Mimi.DecodeState"
    ) -> Tuple[jnp.ndarray, "Mimi.DecodeState"]:
        """Chunked decode with carried state: chaining chunks ==
        offline decode of the concatenation (tested property)."""
        latent = split_rvq_decode(params["quantizer"], self.cfg.rvq, codes)
        latent = latent.astype(params["upsample"]["w"].dtype)
        latent, up_st = self.upsample.apply_streaming(
            params["upsample"], latent, state.upsample
        )
        h, tf_cache = codec_transformer_forward(
            params["decoder_transformer"],
            self.cfg.transformer,
            latent.transpose(0, 2, 1),
            state.tf_pos,
            self._rope(),
            cache=state.tf_cache,
        )
        wav, seanet_st = self.decoder.apply_streaming(
            params["decoder"], h.transpose(0, 2, 1), state.seanet
        )
        new_state = Mimi.DecodeState(
            upsample=up_st,
            tf_cache=tf_cache,
            tf_pos=state.tf_pos + latent.shape[-1],
            seanet=seanet_st,
        )
        return wav, new_state

    # -- streaming encode --------------------------------------------------

    class EncodeState(NamedTuple):
        seanet: list
        tf_cache: CodecKVCache
        tf_pos: jnp.ndarray
        downsample: tuple

    def init_encode_state(self, batch: int, dtype=jnp.float32) -> "Mimi.EncodeState":
        return Mimi.EncodeState(
            seanet=self.encoder.init_state(batch, dtype),
            tf_cache=init_codec_cache(self.cfg.transformer, batch, dtype),
            tf_pos=jnp.zeros((batch,), jnp.int32),
            downsample=self.downsample.init_state(batch, dtype),
        )

    def encode_streaming(
        self, params: dict, wav: jnp.ndarray, state: "Mimi.EncodeState"
    ) -> Tuple[jnp.ndarray, "Mimi.EncodeState"]:
        latent, seanet_st = self.encoder.apply_streaming(
            params["encoder"], wav, state.seanet
        )
        h, tf_cache = codec_transformer_forward(
            params["encoder_transformer"],
            self.cfg.transformer,
            latent.transpose(0, 2, 1),
            state.tf_pos,
            self._rope(),
            cache=state.tf_cache,
        )
        latent2, down_st = self.downsample.apply_streaming(
            params["downsample"], h.transpose(0, 2, 1), state.downsample
        )
        codes = split_rvq_encode(
            params["quantizer"], self.cfg.rvq, latent2, self.cfg.num_codebooks
        )
        new_state = Mimi.EncodeState(
            seanet=seanet_st,
            tf_cache=tf_cache,
            tf_pos=state.tf_pos + latent.shape[-1],
            downsample=down_st,
        )
        return codes, new_state
