"""sesame-tts-convert CLI: synthetic checkpoints → orbax trees.

Uses the same synthetic-layout fixtures as the converter unit tests
(tiny CSM safetensors, moshi-layout Mimi state dict, silentcipher-layout
torch checkpoint) and drives the actual CLI entry point, including the
--verify round-trip and the orbax write."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesameai_tts_tpu.service.convert import main as convert_main


def test_convert_csm_cli(tmp_path, capsys):
    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.core.weights import load_pytree, save_csm_checkpoint
    from sesameai_tts_tpu.models.csm import init_csm_params

    cfg = csm_test_tiny()
    params = init_csm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    src = str(tmp_path / "csm.safetensors")
    save_csm_checkpoint(src, params)
    dst = str(tmp_path / "csm_jax")

    rc = convert_main([
        "csm", src, dst, "--flavor", "test-tiny", "--dtype", "float32",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "round trip identical" in out and "wrote orbax" in out

    loaded = load_pytree(dst)
    a, b = jax.tree.leaves(params), jax.tree.leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_convert_mimi_cli(tmp_path, capsys):
    from safetensors.numpy import save_file

    from sesameai_tts_tpu.codec.mimi import Mimi, mimi_test_tiny
    from test_mimi_loader import _synthetic_moshi_sd

    mimi = Mimi(mimi_test_tiny())
    sd = _synthetic_moshi_sd(mimi, np.random.default_rng(0))
    src = str(tmp_path / "mimi.safetensors")
    save_file(sd, src)
    dst = str(tmp_path / "mimi_jax")

    rc = convert_main([
        "mimi", src, dst, "--flavor", "test-tiny", "--dtype", "float32",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "encode→decode ok" in out and "wrote orbax" in out


def test_convert_silentcipher_cli(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from test_silentcipher import _build_torch_modules, _ckpt_dict, _hparams
    from sesameai_tts_tpu.watermark.net import silentcipher_test_tiny

    cfg = silentcipher_test_tiny()
    enc_c, dec_c, dec_m, enc_m = _build_torch_modules(cfg)
    src = str(tmp_path / "sc.pt")
    torch.save(_ckpt_dict(enc_c, dec_c, dec_m, enc_m, _hparams(cfg)), src)
    dst = str(tmp_path / "sc_jax")

    rc = convert_main(["silentcipher", src, dst])
    assert rc == 0
    out = capsys.readouterr().out
    assert "encode_wav ok" in out and "wrote orbax" in out
    import os

    assert os.path.exists(dst.rstrip("/") + ".config.json")


def test_convert_missing_file(tmp_path):
    rc = convert_main(["csm", str(tmp_path / "nope.safetensors"),
                       str(tmp_path / "out")])
    assert rc == 2
