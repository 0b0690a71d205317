"""Checkpoint conversion CLI: published torch checkpoints → framework trees.

The reference loads weights implicitly through hub downloads at process
start (reference models.py:99-105, generator.py:52, watermarking.py:21);
production TPU deployments want conversion to be an explicit, offline,
once-per-artifact step.  One command per artifact family:

    sesame-tts-convert csm  model.safetensors  /ckpt/csm_jax
    sesame-tts-convert mimi model.safetensors  /ckpt/mimi_jax
    sesame-tts-convert silentcipher ckpt.pt    /ckpt/wm_jax

Each family writes the format its consumer actually loads:

* ``csm`` → a directory with ``model.safetensors`` in this framework's
  layout (``ModelSpec.csm_checkpoint`` reads safetensors/torch files or
  a directory containing them);
* ``mimi`` → an orbax tree (``ModelSpec.mimi_checkpoint`` detects and
  loads converted pytrees via ``load_pytree``);
* ``silentcipher`` → an orbax tree + ``<dst>.config.json`` sibling
  (``SILENTCIPHER_CKPT`` / ``load_watermarker(ckpt_path=...)`` accept
  the directory).

``--verify`` round-trips each converted tree back through the inverse
converter (where one exists) and prints leaf counts/bytes, so a bad
layout fails HERE and not minutes into a TPU compile.  See
docs/REAL_WEIGHTS.md for the end-to-end smoke procedure.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _tree_stats(tree) -> str:
    leaves = jax.tree.leaves(tree)
    n_bytes = sum(x.size * x.dtype.itemsize for x in leaves)
    return f"{len(leaves)} leaves, {n_bytes/2**20:.1f} MiB"


def _convert_csm(src: str, dst: str, dtype, verify: bool,
                 flavor: str = "csm-1b") -> None:
    from sesameai_tts_tpu.core.config import csm_1b, csm_test_tiny
    from sesameai_tts_tpu.core.weights import (
        load_csm_checkpoint,
        save_csm_checkpoint,
    )

    cfg = csm_test_tiny() if flavor == "test-tiny" else csm_1b()
    params = load_csm_checkpoint(src, cfg, dtype)
    print(f"converted CSM tree: {_tree_stats(params)}")
    import os

    os.makedirs(dst, exist_ok=True)
    out = os.path.join(dst, "model.safetensors")
    save_csm_checkpoint(out, params)
    if verify:
        again = load_csm_checkpoint(out, cfg, dtype)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(again)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print("verify: save→load round trip identical")
    print(f"wrote safetensors checkpoint: {out} "
          f"(load via ModelSpec.csm_checkpoint={dst!r})")


def _convert_mimi(src: str, dst: str, dtype, verify: bool,
                  flavor: str = "csm-1b") -> None:
    from sesameai_tts_tpu.codec.mimi import Mimi, MimiConfig, mimi_test_tiny
    from sesameai_tts_tpu.core.weights import load_mimi_checkpoint, save_pytree

    mimi = Mimi(mimi_test_tiny() if flavor == "test-tiny" else MimiConfig())
    params = load_mimi_checkpoint(src, mimi, dtype)
    print(f"converted Mimi tree: {_tree_stats(params)}")
    if verify:
        # run one encode→decode step so a shape/layout error fails here
        wav = jnp.zeros((1, 1, mimi.cfg.hop_length * 4), dtype)
        codes = mimi.encode(params, wav)
        out = mimi.decode(params, codes)
        print(f"verify: encode→decode ok (codes {codes.shape}, wav {out.shape})")
    save_pytree(dst, params)
    print(f"wrote orbax checkpoint: {dst}")


def _convert_silentcipher(src: str, dst: str, dtype, verify: bool,
                          flavor: str = "csm-1b") -> None:
    from sesameai_tts_tpu.core.weights import save_pytree
    from sesameai_tts_tpu.watermark.net import load_silentcipher_checkpoint

    model = load_silentcipher_checkpoint(src)
    if dtype != jnp.float32:
        # the watermark net's STFT/conv path runs float32 (bf16 weights
        # would dtype-mismatch lax.conv against the f32 magnitudes), and
        # at ~a few MB there is nothing to save — keep f32 and say so
        print("note: the silentcipher net runs float32; --dtype ignored "
              "for this family")
    print(f"converted silentcipher tree (float32): "
          f"{_tree_stats(model.params)}")
    if verify:
        rate = model.cfg.sample_rate  # converted hparams may not be 44.1k
        x = np.zeros(rate, np.float32)
        y, _ = model.encode_wav(x, rate, [212, 211, 146, 56, 201])
        print(f"verify: encode_wav ok ({len(y)} samples @ {rate} Hz)")
    save_pytree(dst, model.params)
    import dataclasses, json, os

    cfg_path = os.path.abspath(dst).rstrip("/") + ".config.json"
    with open(cfg_path, "w") as f:
        json.dump(dataclasses.asdict(model.cfg), f, indent=2, default=str)
    print(f"wrote orbax checkpoint: {dst} (+ {cfg_path})")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Convert published torch checkpoints to framework orbax trees"
    )
    p.add_argument("family", choices=["csm", "mimi", "silentcipher"])
    p.add_argument("src", help="torch checkpoint (.pt / .safetensors / dir)")
    p.add_argument("dst", help="output orbax checkpoint directory")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no-verify", action="store_true",
                   help="skip the post-conversion round-trip/forward check")
    p.add_argument("--flavor", default="csm-1b",
                   choices=["csm-1b", "test-tiny"],
                   help="model shapes the checkpoint must match")
    args = p.parse_args(argv)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    fn = {"csm": _convert_csm, "mimi": _convert_mimi,
          "silentcipher": _convert_silentcipher}[args.family]
    try:
        fn(args.src, args.dst, dtype, not args.no_verify, args.flavor)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
