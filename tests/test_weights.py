"""Checkpoint conversion: CSM torchtune-layout save/load round trip +
orbax pytree round trip (SURVEY.md §5 checkpoint/resume plan)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesameai_tts_tpu.core.config import csm_test_tiny
from sesameai_tts_tpu.core.weights import (
    load_csm_checkpoint,
    load_pytree,
    save_csm_checkpoint,
    save_pytree,
)
from sesameai_tts_tpu.models.csm import init_csm_params


def test_csm_checkpoint_roundtrip(tmp_path):
    cfg = csm_test_tiny()
    params = init_csm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    path = str(tmp_path / "csm.safetensors")
    save_csm_checkpoint(path, params)
    loaded = load_csm_checkpoint(path, cfg, jnp.float32)

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_csm_checkpoint_from_torch_pt(tmp_path):
    """torch .pt checkpoints load through the same mapping."""
    import torch

    cfg = csm_test_tiny()
    params = init_csm_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    st_path = str(tmp_path / "csm.safetensors")
    save_csm_checkpoint(st_path, params)
    from safetensors.numpy import load_file

    sd = {k: torch.from_numpy(v) for k, v in load_file(st_path).items()}
    pt_path = str(tmp_path / "csm.pt")
    torch.save(sd, pt_path)

    loaded = load_csm_checkpoint(pt_path, cfg, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(loaded["projection"]), np.asarray(params["projection"]), rtol=1e-6
    )


def test_csm_checkpoint_bf16_safetensors_and_dir(tmp_path):
    """Published-layout hardening: a bf16 safetensors file (no numpy
    dtype — loads via the torch backend), inside a model DIRECTORY, with
    torch.compile's ``_orig_mod.`` key prefix."""
    import torch
    from safetensors.numpy import load_file
    from safetensors.torch import save_file as save_torch

    cfg = csm_test_tiny()
    params = init_csm_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    st_path = str(tmp_path / "plain.safetensors")
    save_csm_checkpoint(st_path, params)

    model_dir = tmp_path / "csm-1b"
    model_dir.mkdir()
    sd_bf16 = {
        f"_orig_mod.{k}": torch.from_numpy(v).bfloat16()
        for k, v in load_file(st_path).items()
    }
    save_torch(sd_bf16, str(model_dir / "model.safetensors"))

    loaded = load_csm_checkpoint(str(model_dir), cfg, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(loaded["projection"]),
        np.asarray(params["projection"]).astype(jnp.bfloat16).astype(np.float32),
        rtol=1e-6,
    )


def test_orbax_pytree_roundtrip(tmp_path):
    params = {"a": jnp.arange(12.0).reshape(3, 4), "b": {"c": jnp.ones((2,))}}
    path = str(tmp_path / "ckpt")
    save_pytree(path, params)
    loaded = load_pytree(path, like=params)
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(
        np.asarray(loaded["b"]["c"]), np.asarray(params["b"]["c"])
    )