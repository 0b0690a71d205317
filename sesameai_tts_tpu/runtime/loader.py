"""Model assembly — the equivalent of the reference's ``load_csm_1b``
(reference generator.py:330-346): build the CSM model + Mimi + tokenizer
and wrap them in a Generator.

Where the reference downloads from the HF hub and calls
``torch.compile``, this loader reads **local** checkpoints (or random
init for tests/benchmarks — identical compute profile) and relies on
``jax.jit``: every hot program is compiled by XLA, backbone included
(the reference only compiles the decoder, generator.py:339-340).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from sesameai_tts_tpu.codec.mimi import Mimi, MimiConfig, mimi_test_tiny
from sesameai_tts_tpu.core.config import CSMConfig, csm_1b, csm_test_tiny
from sesameai_tts_tpu.core.weights import load_csm_checkpoint
from sesameai_tts_tpu.models.csm import init_csm_params
from sesameai_tts_tpu.runtime.generator import Generator
from sesameai_tts_tpu.tokenizer import load_text_tokenizer


@dataclass
class ModelSpec:
    """One typed config for model assembly (replaces the reference's
    scattered argparse defaults; SURVEY.md §5 config audit)."""

    csm: CSMConfig
    mimi: MimiConfig
    tokenizer: str  # 'byte' | 'tiny' | local tokenizer.json path
    csm_checkpoint: Optional[str] = None  # None → random init
    mimi_checkpoint: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16
    mimi_dtype: jnp.dtype = jnp.float32  # codec params/activations
    seed: int = 0
    quantize: Optional[str] = None  # None | 'int8' | 'int4' (weight-only trunks)


def resolve_tokenizer(tokenizer: Optional[str],
                      csm_checkpoint: Optional[str]) -> str:
    """``None`` = auto-infer: a checkpoint directory shipping
    ``tokenizer.json`` (the HF layout sesame/csm-1b distributes,
    reference generator.py:29-36) supplies the tokenizer with zero
    flags; weightless runs fall back to the byte tokenizer.  An
    explicit value always wins."""
    if tokenizer is not None:
        return tokenizer
    if csm_checkpoint:
        import os

        d = (csm_checkpoint if os.path.isdir(csm_checkpoint)
             else os.path.dirname(csm_checkpoint))
        tj = os.path.join(d, "tokenizer.json")
        if os.path.isfile(tj):
            import logging

            logging.getLogger(__name__).info(
                "tokenizer auto-inferred from checkpoint layout: %s", tj
            )
            return tj
    return "byte"


def csm_1b_spec(
    csm_checkpoint: Optional[str] = None,
    mimi_checkpoint: Optional[str] = None,
    tokenizer: Optional[str] = None,
    quantize: Optional[str] = "int8",
) -> ModelSpec:
    """Flagship spec. Weight-only int8 trunks are the default serving
    dtype — measured ~2× faster per-parameter streaming with near-lossless
    per-channel quantization; pass ``quantize=None`` for pure bf16.
    The Mimi codec runs bf16 (convs hit the MXU at full rate; PCM is
    produced in f32).  ``tokenizer=None`` auto-infers from the
    checkpoint layout (resolve_tokenizer)."""
    return ModelSpec(
        csm=csm_1b(), mimi=MimiConfig(),
        tokenizer=resolve_tokenizer(tokenizer, csm_checkpoint),
        csm_checkpoint=csm_checkpoint, mimi_checkpoint=mimi_checkpoint,
        quantize=quantize, mimi_dtype=jnp.bfloat16,
    )


def test_tiny_spec() -> ModelSpec:
    return ModelSpec(
        csm=csm_test_tiny(), mimi=mimi_test_tiny(), tokenizer="tiny",
        dtype=jnp.float32,
    )


def build_generator(spec: ModelSpec, **gen_kwargs) -> Generator:
    if (
        spec.csm_checkpoint
        and spec.tokenizer in ("byte", "tiny")
        and spec.csm.text_vocab_size > 10_000
    ):
        # real weights expect Llama-3 128k-vocab ids (reference
        # generator.py:24-38); the 258-id byte tokenizer would silently
        # produce garbage audio. Small-vocab configs (test flavors,
        # finetuned-from-scratch exports) legitimately pair a checkpoint
        # with the test tokenizers they were trained on.
        raise ValueError(
            "csm_checkpoint is set but tokenizer is the test "
            f"'{spec.tokenizer}' tokenizer. Pass tokenizer=<path to the "
            "Llama-3 tokenizer.json> when loading real CSM-1B weights."
        )

    key = jax.random.PRNGKey(spec.seed)
    k_csm, k_mimi = jax.random.split(key)

    if spec.csm_checkpoint:
        csm_params = load_csm_checkpoint(spec.csm_checkpoint, spec.csm, spec.dtype)
    else:
        csm_params = init_csm_params(k_csm, spec.csm, spec.dtype)

    if spec.quantize in ("int8", "int4"):
        from sesameai_tts_tpu.ops.quant import quantize_csm

        bits = 4 if spec.quantize == "int4" else 8
        csm_params = jax.jit(
            lambda p: quantize_csm(p, bits=bits)
        )(csm_params)

    # num_codebooks must agree between model and codec
    assert spec.mimi.num_codebooks == spec.csm.audio_num_codebooks

    mimi = Mimi(spec.mimi)
    if spec.mimi_checkpoint:
        from sesameai_tts_tpu.core.weights import load_pytree

        mimi_params = load_pytree(
            spec.mimi_checkpoint, like=mimi.init(k_mimi, spec.mimi_dtype)
        )
    else:
        mimi_params = mimi.init(k_mimi, spec.mimi_dtype)

    tokenizer = load_text_tokenizer(spec.tokenizer)
    return Generator(csm_params, spec.csm, mimi, mimi_params, tokenizer, **gen_kwargs)


def load_csm_1b(
    csm_checkpoint: Optional[str] = None,
    mimi_checkpoint: Optional[str] = None,
    tokenizer: Optional[str] = None,
    **gen_kwargs,
) -> Generator:
    """Name-compatible entry point (reference generator.py:330)."""
    return build_generator(
        csm_1b_spec(csm_checkpoint, mimi_checkpoint, tokenizer), **gen_kwargs
    )
