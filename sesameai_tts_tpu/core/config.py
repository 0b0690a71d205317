"""Typed configuration tree for the whole framework.

The reference scatters its knobs across argparse defaults and inline magic
constants (reference tts_service.py:528-543, generator.py:61, 126-127,
151, 169).  Here every subsystem reads one frozen dataclass tree; CLI
layers override fields, nothing else mutates them.

Flavor registry mirrors the reference's ``FLAVORS`` pattern
(reference sesameai/models.py:42-45) and adds tiny test flavors — the
"fake backend" of the test pyramid (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax.numpy as jnp


@dataclass(frozen=True)
class RoPEConfig:
    """Llama-3.2 scaled rotary embeddings (reference models.py:21-22, 37-38).

    ``scale_factor`` applies Meta's long-context frequency rescaling with
    the standard llama3 constants.
    """

    base: float = 500_000.0
    scale_factor: int = 32
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    old_context_len: int = 8192


@dataclass(frozen=True)
class TransformerConfig:
    """One Llama-3.2-style transformer trunk (embeddings-in / hidden-out).

    The reference strips ``tok_embeddings``/``output`` to ``nn.Identity``
    (reference models.py:48-52); we simply never create them — the trunk
    maps hidden states to hidden states.
    """

    num_layers: int
    num_heads: int
    num_kv_heads: int
    embed_dim: int
    max_seq_len: int
    intermediate_dim: int
    norm_eps: float = 1e-5
    rope: RoPEConfig = RoPEConfig()
    dtype: jnp.dtype = jnp.bfloat16  # params + activations; norms/logits in f32

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


# ---------------------------------------------------------------------------
# Flavor registry
# ---------------------------------------------------------------------------

FLAVORS: Dict[str, Callable[[], TransformerConfig]] = {}


def register_flavor(name: str, fn: Callable[[], TransformerConfig]) -> None:
    FLAVORS[name] = fn


def get_flavor(name: str) -> TransformerConfig:
    return FLAVORS[name]()


def llama3_2_1B() -> TransformerConfig:
    """Backbone flavor (reference models.py:10-23)."""
    return TransformerConfig(
        num_layers=16,
        num_heads=32,
        num_kv_heads=8,
        embed_dim=2048,
        max_seq_len=2048,
        intermediate_dim=8192,
    )


def llama3_2_100M() -> TransformerConfig:
    """Codebook-decoder flavor (reference models.py:26-39)."""
    return TransformerConfig(
        num_layers=4,
        num_heads=8,
        num_kv_heads=2,
        embed_dim=1024,
        max_seq_len=2048,
        intermediate_dim=8192,
    )


def test_tiny() -> TransformerConfig:
    """CPU-testable backbone stand-in (not in reference; SURVEY.md §4)."""
    return TransformerConfig(
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        embed_dim=64,
        max_seq_len=256,
        intermediate_dim=128,
        dtype=jnp.float32,
    )


def test_tiny_decoder() -> TransformerConfig:
    return TransformerConfig(
        num_layers=2,
        num_heads=2,
        num_kv_heads=1,
        embed_dim=32,
        max_seq_len=64,
        intermediate_dim=64,
        dtype=jnp.float32,
    )


register_flavor("llama-1B", llama3_2_1B)
register_flavor("llama-100M", llama3_2_100M)
register_flavor("test-tiny", test_tiny)
register_flavor("test-tiny-decoder", test_tiny_decoder)


# ---------------------------------------------------------------------------
# CSM model config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CSMConfig:
    """Equivalent of the reference ``ModelArgs`` (reference models.py:90-96).

    Published sesame/csm-1b hub values: text_vocab 128_256,
    audio_vocab 2051, 32 codebooks (SURVEY.md §2 C4).
    """

    backbone_flavor: str = "llama-1B"
    decoder_flavor: str = "llama-100M"
    text_vocab_size: int = 128_256
    audio_vocab_size: int = 2051
    audio_num_codebooks: int = 32
    # Optional backbone KV/position capacity override (rows). Weights are
    # independent of it; the flavor's value (2048 for the published
    # model) is the ceiling the checkpoint was trained for. SERVING
    # pools benefit from less: the decode step streams the whole static
    # KV buffer every frame — measured at B=16 on v5e, 2048→1024 cuts
    # the model step 11.7→9.8 ms (→9.1 ms at 512). Sessions are bounded
    # by context+text+frames ≤ this, enforced by the existing guards.
    max_seq_len: Optional[int] = None

    @property
    def backbone(self) -> TransformerConfig:
        cfg = get_flavor(self.backbone_flavor)
        if self.max_seq_len is not None and self.max_seq_len != cfg.max_seq_len:
            cfg = dataclasses.replace(cfg, max_seq_len=self.max_seq_len)
        return cfg

    @property
    def decoder(self) -> TransformerConfig:
        return get_flavor(self.decoder_flavor)

    @property
    def frame_width(self) -> int:
        """Columns per token frame: audio codebooks + 1 text column."""
        return self.audio_num_codebooks + 1

    def replace(self, **kw) -> "CSMConfig":
        return dataclasses.replace(self, **kw)


def csm_1b() -> CSMConfig:
    return CSMConfig()


def csm_test_tiny() -> CSMConfig:
    return CSMConfig(
        backbone_flavor="test-tiny",
        decoder_flavor="test-tiny-decoder",
        text_vocab_size=128,
        audio_vocab_size=67,
        audio_num_codebooks=8,
    )


# ---------------------------------------------------------------------------
# Sampling / generation config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SamplingConfig:
    """Top-k + temperature sampling knobs.

    Reference defaults are inconsistent (0.7/30 generator.py:126-127,
    0.8/40 tts_service.py:538-541, 0.9/50 tts_service.py:175-176); the
    canonical CLI surface is temp 0.8 / topk 40.
    """

    temperature: float = 0.8
    topk: int = 40


@dataclass(frozen=True)
class GenerationConfig:
    sampling: SamplingConfig = SamplingConfig()
    max_audio_length_ms: float = 90_000.0
    frame_ms: float = 80.0  # 12.5 Hz Mimi frame rate (reference generator.py:151)
    stream_chunk_frames: int = 1  # frame-granular streaming (reference fixes 10, generator.py:61)

    @property
    def max_frames(self) -> int:
        return int(self.max_audio_length_ms / self.frame_ms)
