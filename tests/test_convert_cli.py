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
    from sesameai_tts_tpu.core.weights import (
        load_csm_checkpoint,
        save_csm_checkpoint,
    )
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
    assert "round trip identical" in out and "wrote safetensors" in out

    loaded = load_csm_checkpoint(dst, cfg, jnp.float32)
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

    rc = convert_main(["silentcipher", src, dst, "--dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "encode_wav ok" in out and "wrote orbax" in out
    import os

    assert os.path.exists(dst.rstrip("/") + ".config.json")

    # the documented consumer accepts the converted directory
    from sesameai_tts_tpu.watermark.api import load_watermarker

    model = load_watermarker(ckpt_path=dst)
    assert model.cfg.n_fft == cfg.n_fft and model.cfg.hop == cfg.hop
    y, _ = model.encode_wav(np.zeros(44_100, np.float32), 44_100,
                            [1, 2, 3, 4, 5])
    assert y.shape == (44_100,)


def test_convert_csm_output_loads_via_modelspec_path(tmp_path):
    """The csm output directory is loadable by the ModelSpec consumer."""
    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.core.weights import (
        load_csm_checkpoint,
        save_csm_checkpoint,
    )
    from sesameai_tts_tpu.models.csm import init_csm_params

    cfg = csm_test_tiny()
    params = init_csm_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    src = str(tmp_path / "csm.safetensors")
    save_csm_checkpoint(src, params)
    dst = str(tmp_path / "csm_dir")
    assert convert_main(["csm", src, dst, "--flavor", "test-tiny",
                         "--dtype", "float32"]) == 0
    loaded = load_csm_checkpoint(dst, cfg, jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_convert_missing_file(tmp_path):
    rc = convert_main(["csm", str(tmp_path / "nope.safetensors"),
                       str(tmp_path / "out")])
    assert rc == 2
