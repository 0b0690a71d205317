"""Mimi numerical ORACLE parity: the JAX codec vs transformers' torch
``MimiModel`` (the official port of kyutai's Mimi — reference
generator.py:11, 52-57 pulls the same architecture via ``moshi``) on
identical seeded random weights flowing through the checkpoint
converter.

This is the codec analog of the HF-Llama trunk oracle
(tests/test_transformer.py): topology + converter are verified
NUMERICALLY, so a real checkpoint's fidelity reduces to the weights
themselves.  Caught real bugs when introduced: dense-vs-channel-wise
upsample, tanh-vs-erf gelu, zero-vs-replicate downsample padding.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from sesameai_tts_tpu.codec.mimi import Mimi, mimi_test_tiny
from sesameai_tts_tpu.core.weights import load_mimi_checkpoint


def _tiny_hf_mimi(seed=0):
    """transformers MimiModel topologically identical to mimi_test_tiny()."""
    from transformers.models.mimi import MimiConfig, MimiModel

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
    # spread the codebooks: random-init embed_sum/cluster_usage leaves
    # near-duplicate entries whose argmin ties are tolerance-fragile
    with torch.no_grad():
        for q in (m.quantizer.semantic_residual_vector_quantizer,
                  m.quantizer.acoustic_residual_vector_quantizer):
            for layer in q.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.fill_(1.0)
                layer.codebook.initialized.fill_(True)
    return m


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    hf = _tiny_hf_mimi()
    from safetensors.numpy import save_file

    path = str(tmp_path_factory.mktemp("mimi_hf") / "hf_tiny.safetensors")
    save_file({k: v.detach().numpy() for k, v in hf.state_dict().items()}, path)
    mine = Mimi(mimi_test_tiny())
    params = load_mimi_checkpoint(path, mine)  # auto-detects HF layout
    return hf, mine, params


def test_encode_codes_bit_exact_vs_torch(oracle):
    hf, mine, params = oracle
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=16 * 48) * 0.1).astype(np.float32)
    with torch.no_grad():
        codes_t = hf.encode(torch.from_numpy(wav)[None, None]).audio_codes
    codes_j = np.asarray(mine.encode(params, jnp.asarray(wav)[None, None]))
    np.testing.assert_array_equal(codes_j[0], codes_t.numpy()[0])


def test_decode_pcm_matches_torch(oracle):
    hf, mine, params = oracle
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, size=(1, 8, 16)).astype(np.int64)
    with torch.no_grad():
        wav_t = hf.decode(torch.from_numpy(codes)).audio_values.numpy()[0, 0]
    wav_j = np.asarray(mine.decode(params, jnp.asarray(codes, jnp.int32)))[0, 0]
    n = min(len(wav_j), len(wav_t))
    assert n > 0
    scale = np.abs(wav_t).max() + 1e-9
    np.testing.assert_allclose(wav_j[:n] / scale, wav_t[:n] / scale, atol=1e-4)


def test_flagship_dims_encode_codes_bit_exact(tmp_path):
    """One oracle pass at the REAL config (512-dim, 8-layer transformer,
    2048-bin RVQ, hop 1920): a parity failure that only appears at
    flagship dimensions cannot ship.  Kept small: 4 codec frames."""
    from transformers.models.mimi import MimiConfig, MimiModel
    from safetensors.numpy import save_file
    from sesameai_tts_tpu.codec.mimi import MimiConfig as MyMimiConfig

    torch.manual_seed(0)
    hf = MimiModel(MimiConfig(use_cache=False)).eval()  # published defaults
    with torch.no_grad():
        for q in (hf.quantizer.semantic_residual_vector_quantizer,
                  hf.quantizer.acoustic_residual_vector_quantizer):
            for layer in q.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.fill_(1.0)
                layer.codebook.initialized.fill_(True)
    path = str(tmp_path / "hf_full.safetensors")
    save_file({k: v.detach().numpy() for k, v in hf.state_dict().items()}, path)

    mine = Mimi(MyMimiConfig())  # our flagship defaults — must coincide
    params = load_mimi_checkpoint(path, mine)

    rng = np.random.default_rng(0)
    wav = (rng.normal(size=4 * 1920) * 0.1).astype(np.float32)
    with torch.no_grad():
        codes_t = hf.encode(torch.from_numpy(wav)[None, None]).audio_codes
    codes_j = np.asarray(mine.encode(params, jnp.asarray(wav)[None, None]))
    assert codes_j.shape == (1, 32, 4)
    np.testing.assert_array_equal(codes_j[0], codes_t.numpy()[0])

    codes = rng.integers(0, 2048, size=(1, 32, 4)).astype(np.int64)
    with torch.no_grad():
        wav_t = hf.decode(torch.from_numpy(codes)).audio_values.numpy()[0, 0]
    wav_j = np.asarray(mine.decode(params, jnp.asarray(codes, jnp.int32)))[0, 0]
    n = min(len(wav_j), len(wav_t))
    scale = np.abs(wav_t).max() + 1e-9
    np.testing.assert_allclose(wav_j[:n] / scale, wav_t[:n] / scale, atol=2e-4)


def test_streaming_decode_matches_torch_offline(oracle):
    """Chunked JAX decode (carried conv/transformer state) lands on the
    torch OFFLINE result — the property serving actually relies on."""
    hf, mine, params = oracle
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 32, size=(1, 8, 12)).astype(np.int64)
    with torch.no_grad():
        wav_t = hf.decode(torch.from_numpy(codes)).audio_values.numpy()[0, 0]
    st = mine.init_decode_state(1)
    outs = []
    for i in range(0, 12, 4):
        y, st = mine.decode_streaming(
            params, jnp.asarray(codes[:, :, i : i + 4], jnp.int32), st
        )
        outs.append(np.asarray(y)[0, 0])
    wav_j = np.concatenate(outs)
    n = min(len(wav_j), len(wav_t))
    scale = np.abs(wav_t).max() + 1e-9
    np.testing.assert_allclose(wav_j[:n] / scale, wav_t[:n] / scale, atol=1e-4)
