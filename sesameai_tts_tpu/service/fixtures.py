"""Synthetic, layout-exact upstream artifacts — the real-weights dress
rehearsal (VERDICT r3 #2).

This environment has no published checkpoints, so the first real-weights
day would otherwise be the first time the convert → quantize → serve
pipeline meets real artifact layouts.  This module generates
fake-but-layout-exact versions of everything the real deployment
consumes:

* ``csm-1b/`` — an HF-style model directory: ``model.safetensors`` in
  the torchtune state-dict layout sesame/csm-1b publishes
  (``backbone.layers.N.attn.q_proj.weight`` …, reference
  models.py:99-105) plus a real-format ``tokenizer.json`` (trained
  byte-level BPE with the Llama-3 BOS/EOS specials, reference
  generator.py:24-38) so tokenizer auto-inference engages;
* ``mimi.safetensors`` — the transformers ``MimiModel`` state-dict
  layout (the published kyutai Mimi port, reference generator.py:52);
* ``silentcipher.pth`` — the silentcipher torch ckpt layout
  (enc_c/dec_c/dec_m/enc_m state dicts + hparams, reference
  watermarking.py:21-25);
* ``SYNTHETIC_WEIGHTS.json`` — a marker telling the smoke harness the
  weights are random, so quality-gated checks (codec SNR) downgrade to
  informational while every layout/pipeline check stays gated.

``sesame-tts-smoke --weights-dir <dir>`` then runs the documented
docs/REAL_WEIGHTS.md procedure end-to-end on them as one command.

Weights are random — these artifacts validate LAYOUTS and PIPELINES,
never audio quality.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np


def fixture_csm_config(flavor: str = "csm-1b"):
    """The CSM config the fixture checkpoint is shaped for.  The tiny
    flavor widens text_vocab to 512 so a real-format trained BPE
    tokenizer (vocab ~400) fits its embedding table."""
    from sesameai_tts_tpu.core.config import csm_1b, csm_test_tiny

    if flavor == "csm-1b":
        return csm_1b()
    return dataclasses.replace(csm_test_tiny(), text_vocab_size=512)


def fixture_mimi_config(flavor: str = "csm-1b"):
    from sesameai_tts_tpu.codec.mimi import MimiConfig, mimi_test_tiny

    return MimiConfig() if flavor == "csm-1b" else mimi_test_tiny()


def write_tokenizer_json(path: str, vocab_size: int = 400) -> str:
    """Train a small byte-level BPE with the Rust ``tokenizers`` library
    and save a REAL-format tokenizer.json (same file format and specials
    as the Llama-3 tokenizer the reference downloads)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(
        add_prefix_space=False, use_regex=True
    )
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<|begin_of_text|>", "<|end_of_text|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "The quick brown fox jumps over the lazy dog.",
        "Sesame street speech synthesis on tensor processing units!",
        "Numbers like 12345 and symbols #@% get split differently.",
        "[0]hello world [1]how are you today?",
    ] * 20
    tok.train_from_iterator(corpus, trainer)
    tok.save(path)
    return path


def write_csm_dir(outdir: str, flavor: str = "csm-1b", seed: int = 0) -> str:
    """Random-init CSM params → ``<outdir>/model.safetensors`` in the
    reference's torchtune key layout (save_csm_checkpoint is the tested
    inverse of the loader) + ``tokenizer.json`` beside it (HF layout)."""
    import jax
    import jax.numpy as jnp

    from sesameai_tts_tpu.core.weights import save_csm_checkpoint
    from sesameai_tts_tpu.models.csm import init_csm_params

    os.makedirs(outdir, exist_ok=True)
    cfg = fixture_csm_config(flavor)
    # f32 init: flagship is ~6 GB on disk — layout-exactness matters,
    # byte count doesn't
    params = init_csm_params(jax.random.PRNGKey(seed), cfg, jnp.float32)
    save_csm_checkpoint(os.path.join(outdir, "model.safetensors"), params)
    write_tokenizer_json(os.path.join(outdir, "tokenizer.json"))
    return outdir


def write_mimi_checkpoint(path: str, flavor: str = "csm-1b",
                          seed: int = 0) -> str:
    """Random-init transformers ``MimiModel`` state dict → safetensors.

    The layout comes from transformers itself, so it is exact by
    construction (the same construction the oracle parity tests use —
    tests/test_mimi_oracle.py proved encode codes bit-exact through
    the converter at both tiny and published-default dims)."""
    import torch
    from safetensors.numpy import save_file
    from transformers.models.mimi import MimiConfig, MimiModel

    if flavor == "csm-1b":
        cfg = MimiConfig(use_cache=False)  # published kyutai defaults
    else:
        cfg = MimiConfig(
            audio_channels=1, num_filters=4, upsampling_ratios=[4, 3, 2],
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, intermediate_size=64,
            codebook_size=32, codebook_dim=16, num_quantizers=8,
            num_semantic_quantizers=1, sliding_window=16,
            vector_quantization_hidden_dimension=16, upsample_groups=32,
            frame_rate=500, sampling_rate=24_000, use_cache=False,
        )
    torch.manual_seed(seed)
    m = MimiModel(cfg).eval()
    with torch.no_grad():
        # spread the codebooks: random-init embed_sum leaves near-duplicate
        # entries (real codebooks are trained and well-separated)
        for q in (m.quantizer.semantic_residual_vector_quantizer,
                  m.quantizer.acoustic_residual_vector_quantizer):
            for layer in q.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.fill_(1.0)
                layer.codebook.initialized.fill_(True)
    save_file({k: v.detach().numpy() for k, v in m.state_dict().items()}, path)
    return path


def write_silentcipher_checkpoint(path: str, flavor: str = "csm-1b",
                                  seed: int = 0, hidden: int = 32) -> str:
    """silentcipher-layout torch ckpt: enc_c/dec_c/dec_m/enc_m state
    dicts (Conv2d+BN+ReLU stacks / message embedding) + hparams — the
    structure ``watermark/net.py::load_silentcipher_checkpoint``
    consumes.  ``hidden`` controls stack width (layout-identical at any
    width; the converter infers dims from shapes)."""
    import torch

    from sesameai_tts_tpu.watermark.net import (
        SilentCipherConfig,
        silentcipher_test_tiny,
    )

    cfg = SilentCipherConfig() if flavor == "csm-1b" else silentcipher_test_tiny()

    class ReluBlock(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = torch.nn.Conv2d(cin, cout, 3, 1, 1)
            self.bn = torch.nn.BatchNorm2d(cout)

        def forward(self, x):  # pragma: no cover - layout fixture
            return torch.relu(self.bn(self.conv(x)))

    class Stack(torch.nn.Module):
        def __init__(self, cin, cout, n_blocks, last_relu=False):
            super().__init__()
            layers = [ReluBlock(cin, hidden)]
            layers += [ReluBlock(hidden, hidden) for _ in range(n_blocks - 2)]
            layers += [
                ReluBlock(hidden, cout) if last_relu
                else torch.nn.Conv2d(hidden, cout, 3, 1, 1)
            ]
            self.main = torch.nn.Sequential(*layers)

    torch.manual_seed(seed)
    g = np.random.default_rng(seed)
    enc_c = Stack(1, hidden, 3, last_relu=True)
    dec_c = Stack(1 + hidden + cfg.message_len, 1, 4)
    dec_m = Stack(1, cfg.message_len * cfg.vocab, 3)
    enc_m = torch.nn.Embedding(cfg.vocab, cfg.n_bins)
    for m in (enc_c, dec_c, dec_m):
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                with torch.no_grad():
                    mod.running_mean.copy_(torch.from_numpy(
                        g.normal(size=mod.running_mean.shape).astype(np.float32)))
                    mod.running_var.copy_(torch.from_numpy(
                        g.uniform(0.5, 2.0, mod.running_var.shape).astype(np.float32)))
                    mod.weight.copy_(torch.from_numpy(
                        g.normal(1.0, 0.2, mod.weight.shape).astype(np.float32)))
                    mod.bias.copy_(torch.from_numpy(
                        g.normal(size=mod.bias.shape).astype(np.float32)))
        m.eval()
    torch.save(
        {
            "enc_c": enc_c.state_dict(),
            "dec_c": dec_c.state_dict(),
            "dec_m": dec_m.state_dict(),
            "enc_m": enc_m.state_dict(),
            "hparams": {
                "sample_rate": cfg.sample_rate, "n_fft": cfg.n_fft,
                "hop_length": cfg.hop, "message_len": cfg.message_len,
            },
        },
        path,
    )
    return path


def write_synthetic_weights(outdir: str, flavor: str = "csm-1b",
                            seed: int = 0) -> dict:
    """All upstream-layout artifacts + the SYNTHETIC marker; returns
    their paths.  Flagship is full-size (~6.5 GB): layout-exactness is
    the point — the rehearsal must exercise real shapes, real sharding
    of safetensors, real conversion times."""
    os.makedirs(outdir, exist_ok=True)
    paths = {
        "csm_dir": write_csm_dir(
            os.path.join(outdir, "csm-1b"), flavor, seed
        ),
        "mimi": write_mimi_checkpoint(
            os.path.join(outdir, "mimi.safetensors"), flavor, seed
        ),
        "silentcipher": write_silentcipher_checkpoint(
            os.path.join(outdir, "silentcipher.pth"), flavor, seed
        ),
    }
    paths["tokenizer"] = os.path.join(paths["csm_dir"], "tokenizer.json")
    marker = os.path.join(outdir, "SYNTHETIC_WEIGHTS.json")
    with open(marker, "w") as f:
        json.dump({"flavor": flavor, "seed": seed,
                   "note": "random weights — layout rehearsal only"}, f)
    paths["marker"] = marker
    return paths


def main(argv: Optional[list] = None) -> int:
    import argparse

    # fixture generation is pure host work; on a remote-attached TPU the
    # per-leaf fetches in save_csm_checkpoint would each pay a ~40 ms
    # round trip. Force CPU before any backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(
        description="generate synthetic layout-exact upstream checkpoints "
                    "(real-weights dress rehearsal)"
    )
    p.add_argument("outdir")
    p.add_argument("--flavor", default="csm-1b",
                   choices=["csm-1b", "test-tiny"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    paths = write_synthetic_weights(args.outdir, args.flavor, args.seed)
    for k, v in paths.items():
        print(f"{k}: {v}")
    print(f"next: sesame-tts-smoke --weights-dir {args.outdir}"
          + (" --flavor test-tiny" if args.flavor == "test-tiny" else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
