"""Mimi checkpoint converter: synthetic moshi-layout state_dict → pytree.

Builds a state dict with moshi's naming scheme and the tiny Mimi's
shapes, saves it as .safetensors, loads through
``core.weights.load_mimi_checkpoint`` and verifies every parameter lands
in the right slot with the right shape — then runs a decode pass."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesameai_tts_tpu.codec.mimi import Mimi, mimi_test_tiny
from sesameai_tts_tpu.core.weights import load_mimi_checkpoint


def _synthetic_moshi_sd(mimi: Mimi, rng) -> dict:
    sd = {}

    def seanet(prefix, module, transposed):
        idx = 0
        for spec in module.specs:
            kind = spec[0]
            if kind == "conv":
                c = spec[1]
                sd[f"{prefix}.model.{idx}.conv.conv.weight"] = rng.normal(
                    size=(c.out_channels, c.in_channels, c.kernel_size)
                ).astype(np.float32)
                sd[f"{prefix}.model.{idx}.conv.conv.bias"] = rng.normal(
                    size=(c.out_channels,)
                ).astype(np.float32)
                idx += 1
            elif kind == "convtr":
                c = spec[1]
                sd[f"{prefix}.model.{idx}.convtr.convtr.weight"] = rng.normal(
                    size=(c.in_channels, c.out_channels, c.kernel_size)
                ).astype(np.float32)
                sd[f"{prefix}.model.{idx}.convtr.convtr.bias"] = rng.normal(
                    size=(c.out_channels,)
                ).astype(np.float32)
                idx += 1
            elif kind == "res":
                for j, c in enumerate(spec[1]):
                    sd[f"{prefix}.model.{idx}.block.{2*j+1}.conv.conv.weight"] = (
                        rng.normal(size=(c.out_channels, c.in_channels, c.kernel_size))
                        .astype(np.float32)
                    )
                    sd[f"{prefix}.model.{idx}.block.{2*j+1}.conv.conv.bias"] = (
                        rng.normal(size=(c.out_channels,)).astype(np.float32)
                    )
                idx += 1
            # "elu" entries occupy no checkpoint slot in our collector
            # (moshi numbers them but they have no params)

    seanet("encoder", mimi.encoder, False)
    seanet("decoder", mimi.decoder, True)

    t = mimi.cfg.transformer
    for name in ("encoder_transformer", "decoder_transformer"):
        for i in range(t.num_layers):
            p = f"{name}.transformer.layers.{i}"
            sd[f"{p}.norm1.weight"] = np.ones(t.d_model, np.float32)
            sd[f"{p}.norm1.bias"] = np.zeros(t.d_model, np.float32)
            sd[f"{p}.self_attn.in_proj_weight"] = rng.normal(
                size=(3 * t.d_model, t.d_model)).astype(np.float32)
            sd[f"{p}.self_attn.out_proj.weight"] = rng.normal(
                size=(t.d_model, t.d_model)).astype(np.float32)
            sd[f"{p}.norm2.weight"] = np.ones(t.d_model, np.float32)
            sd[f"{p}.norm2.bias"] = np.zeros(t.d_model, np.float32)
            sd[f"{p}.linear1.weight"] = rng.normal(
                size=(t.dim_feedforward, t.d_model)).astype(np.float32)
            sd[f"{p}.linear2.weight"] = rng.normal(
                size=(t.d_model, t.dim_feedforward)).astype(np.float32)
            sd[f"{p}.layer_scale_1.scale"] = np.full(t.d_model, 0.01, np.float32)
            sd[f"{p}.layer_scale_2.scale"] = np.full(t.d_model, 0.01, np.float32)

    r = mimi.cfg.rvq
    d = mimi.cfg.seanet.dimension
    s = mimi.cfg.downsample_stride
    sd["downsample.conv.conv.weight"] = rng.normal(size=(d, d, 2 * s)).astype(np.float32)
    # channel-wise upsample (kyutai "upsample bug"): torch ConvTranspose1d
    # with groups=d stores (in, out/groups, K) = (d, 1, K) — the REAL
    # checkpoint layout (transformers MimiConfig.upsample_groups=512)
    sd["upsample.convtr.convtr.weight"] = rng.normal(size=(d, 1, 2 * s)).astype(np.float32)
    for prefix, n_q in (("quantizer.rvq_first", r.n_q_semantic),
                        ("quantizer.rvq_rest", r.n_q_acoustic)):
        sd[f"{prefix}.input_proj.weight"] = rng.normal(
            size=(r.dimension, r.input_dim, 1)).astype(np.float32)
        sd[f"{prefix}.output_proj.weight"] = rng.normal(
            size=(r.output_dim, r.dimension, 1)).astype(np.float32)
        for i in range(n_q):
            sd[f"{prefix}.vq.layers.{i}._codebook.embedding"] = rng.normal(
                size=(r.bins, r.dimension)).astype(np.float32)
    return sd


def test_mimi_converter_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    cfg = mimi_test_tiny()
    mimi = Mimi(cfg)
    rng = np.random.default_rng(0)
    sd = _synthetic_moshi_sd(mimi, rng)
    path = str(tmp_path / "mimi.safetensors")
    save_file(sd, path)

    params = load_mimi_checkpoint(path, mimi)

    # reference-init params define the expected pytree structure/shapes
    expected = mimi.init(jax.random.PRNGKey(0))
    got_leaves = jax.tree.leaves(params)
    exp_leaves = jax.tree.leaves(expected)
    assert len(got_leaves) == len(exp_leaves)
    for g, e in zip(got_leaves, exp_leaves):
        assert g.shape == e.shape, f"{g.shape} != {e.shape}"

    # spot-check placement: encoder stem conv weight must be the first
    # encoder.model entry
    np.testing.assert_allclose(
        np.asarray(params["encoder"][0]["w"]),
        sd["encoder.model.0.conv.conv.weight"], rtol=1e-6,
    )
    # residual-block 1x1 conv (regression for the block.{2j+1} mapping):
    # find the first res entry and compare its SECOND conv (block.3)
    enc_specs = mimi.encoder.specs
    res_pos = next(i for i, s in enumerate(enc_specs) if s[0] == "res")
    # checkpoint sequential index of that res entry:
    ckpt_idx = sum(1 for s in enc_specs[:res_pos] if s[0] in ("conv", "convtr", "res"))
    np.testing.assert_allclose(
        np.asarray(params["encoder"][res_pos][1]["w"]),
        sd[f"encoder.model.{ckpt_idx}.block.3.conv.conv.weight"], rtol=1e-6,
    )

    # loaded params must run end-to-end
    wav = jnp.zeros((1, 1, 4 * cfg.hop_length))
    codes = mimi.encode(params, wav)
    out = mimi.decode(params, codes)
    assert out.shape == (1, 1, 4 * cfg.hop_length)
    assert np.isfinite(np.asarray(out)).all()


def test_mimi_converter_embedding_sum_variant(tmp_path):
    """moshi version matrix: newer checkpoints store the EMA pair
    ``_codebook.embedding_sum`` / ``_codebook.cluster_usage`` instead of
    ``embedding`` (core/weights.py normalizes sum/usage)."""
    from safetensors.numpy import save_file

    cfg = mimi_test_tiny()
    mimi = Mimi(cfg)
    rng = np.random.default_rng(1)
    sd = _synthetic_moshi_sd(mimi, rng)

    expected_cbs = {}
    for key in [k for k in sd if k.endswith("._codebook.embedding")]:
        emb = sd.pop(key)
        usage = rng.uniform(0.5, 4.0, size=emb.shape[0]).astype(np.float32)
        sd[key + "_sum"] = emb * usage[:, None]
        sd[key.replace(".embedding", ".cluster_usage")] = usage
        # distractor buffers real checkpoints carry
        sd[key.replace(".embedding", ".initialized")] = np.ones(1, np.float32)
        expected_cbs[key] = emb

    path = str(tmp_path / "mimi_sum.safetensors")
    save_file(sd, path)
    params = load_mimi_checkpoint(path, mimi)

    r = cfg.rvq
    for stage, prefix, n_q in (
        ("semantic", "quantizer.rvq_first", r.n_q_semantic),
        ("acoustic", "quantizer.rvq_rest", r.n_q_acoustic),
    ):
        got = np.asarray(params["quantizer"][stage]["codebooks"])
        for i in range(n_q):
            np.testing.assert_allclose(
                got[i],
                expected_cbs[f"{prefix}.vq.layers.{i}._codebook.embedding"],
                rtol=1e-5,
            )
