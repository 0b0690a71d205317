"""silentcipher network port: converter layout fixture + torch parity.

Mirrors tests/test_mimi_loader.py's role for the moshi codec: builds a
synthetic checkpoint in the silentcipher layout (Conv2d+BN+ReLU stacks
under enc_c/dec_c/dec_m, message embedding under enc_m), saves it with
torch.save, loads it through the converter and checks numerics against
a torch forward of the same blocks.  With real published weights the
same path runs the reference's actual provenance watermark
(reference sesameai/watermarking.py:20-59)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from sesameai_tts_tpu.watermark.net import (
    NetWatermarker,
    SilentCipherConfig,
    _stack_apply,
    convert_silentcipher_state,
    load_silentcipher_checkpoint,
    silentcipher_test_tiny,
)

HID = 8


class ReluBlock(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, 3, 1, 1)
        self.bn = torch.nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


def _randomize_bn(m, g):
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


class Stack(torch.nn.Module):
    """silentcipher-style module: ReluBlocks + a final plain conv."""

    def __init__(self, cin, cout, n_blocks):
        super().__init__()
        layers = [ReluBlock(cin, HID)]
        layers += [ReluBlock(HID, HID) for _ in range(n_blocks - 2)]
        layers += [torch.nn.Conv2d(HID, cout, 3, 1, 1)]
        self.main = torch.nn.Sequential(*layers)

    def forward(self, x):
        return self.main(x)


def _build_torch_modules(cfg, seed=0, per_slot=False):
    torch.manual_seed(seed)
    g = np.random.default_rng(seed)
    enc_c = Stack(1, HID, 3)
    # enc_c output feeds dec_c together with mag + message channels, but
    # enc_c's own last layer in silentcipher is a ReluBlock too — model
    # that by using only ReluBlocks for enc_c
    enc_c.main[-1] = ReluBlock(HID, HID)
    dec_c = Stack(1 + HID + cfg.message_len, 1, 4)
    if per_slot:
        dec_m = torch.nn.ModuleList(
            [Stack(1, cfg.vocab, 3) for _ in range(cfg.message_len)]
        )
    else:
        dec_m = Stack(1, cfg.message_len * cfg.vocab, 3)
    enc_m = torch.nn.Embedding(cfg.vocab, cfg.n_bins)
    for m in (enc_c, dec_c, dec_m):
        _randomize_bn(m, g)
        m.eval()
    return enc_c, dec_c, dec_m, enc_m


def _ckpt_dict(enc_c, dec_c, dec_m, enc_m, hparams=None):
    ckpt = {
        "enc_c": enc_c.state_dict(),
        "dec_c": dec_c.state_dict(),
        "dec_m": dec_m.state_dict(),
        "enc_m": enc_m.state_dict(),
    }
    if hparams:
        ckpt["hparams"] = hparams
    return ckpt


def _hparams(cfg):
    return {"sample_rate": cfg.sample_rate, "n_fft": cfg.n_fft,
            "hop_length": cfg.hop, "message_len": cfg.message_len}


def test_converter_checkpoint_roundtrip(tmp_path):
    cfg = silentcipher_test_tiny()
    enc_c, dec_c, dec_m, enc_m = _build_torch_modules(cfg)
    path = str(tmp_path / "silentcipher.pth")
    torch.save(_ckpt_dict(enc_c, dec_c, dec_m, enc_m, _hparams(cfg)), path)

    wm = load_silentcipher_checkpoint(path)
    assert isinstance(wm, NetWatermarker)
    assert wm.cfg.n_fft == cfg.n_fft and wm.cfg.hop == cfg.hop
    assert wm.cfg.message_len == cfg.message_len
    assert wm.params["enc_m"].shape == (cfg.vocab, cfg.n_bins)
    assert len(wm.params["enc_c"]) == 3
    assert len(wm.params["dec_c"]) == 4
    # BN folded: every block reduces to a bare (w, b) conv
    for blk in wm.params["enc_c"] + wm.params["dec_c"]:
        assert set(blk) == {"w", "b"} and blk["w"].ndim == 4

    # embed at the reference's 36 dB: SDR constraint is exact by
    # construction (iSTFT linear in the residual)
    g = np.random.default_rng(1)
    x = g.normal(scale=0.1, size=int(0.1 * cfg.sample_rate)).astype(np.float32)
    y, sdr = wm.encode_wav(x, cfg.sample_rate, [212, 211, 146, 56, 201],
                           calc_sdr=True, message_sdr=36.0)
    assert y.shape == x.shape
    assert abs(sdr - 36.0) < 0.2
    res = wm.decode_wav(y, cfg.sample_rate, phase_shift_decoding=True)
    assert set(res) >= {"status", "messages", "confidence"}
    assert isinstance(res["status"], bool)


def test_torch_parity_conv_bn_stack():
    """The JAX folded-stack forward must match torch eval-mode forward —
    this is the converter's numerics contract (BN folding + SAME conv)."""
    cfg = silentcipher_test_tiny()
    enc_c, dec_c, dec_m, enc_m = _build_torch_modules(cfg, seed=3)
    params, ccfg = convert_silentcipher_state(
        {k: {kk: vv.numpy() for kk, vv in v.items()}
         for k, v in _ckpt_dict(enc_c, dec_c, dec_m, enc_m).items()},
        _hparams(cfg),
    )
    g = np.random.default_rng(4)
    x = g.normal(size=(1, 1, cfg.n_bins, 17)).astype(np.float32)

    with torch.no_grad():
        # enc_c is all ReluBlocks (trailing ReLU) — apply it manually to
        # compare against our convention (no activation after the stack's
        # last block): compare pre-activation of the final block
        t = torch.from_numpy(x)
        for blk in list(enc_c.main)[:-1]:
            t = blk(t)
        t = enc_c.main[-1].bn(enc_c.main[-1].conv(t))
    ours = _stack_apply(params["enc_c"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), t.numpy(), rtol=2e-4, atol=2e-4)

    with torch.no_grad():
        xm = torch.from_numpy(
            g.normal(size=(1, 1 + HID + cfg.message_len, cfg.n_bins, 17))
            .astype(np.float32))
        td = dec_c(xm)  # Stack ends in a plain conv — directly comparable
    ours_d = _stack_apply(params["dec_c"], jnp.asarray(xm.numpy()))
    np.testing.assert_allclose(np.asarray(ours_d), td.numpy(), rtol=2e-4, atol=2e-4)


def test_per_slot_message_decoder_layout():
    cfg = silentcipher_test_tiny()
    enc_c, dec_c, dec_m, enc_m = _build_torch_modules(cfg, seed=5, per_slot=True)
    params, ccfg = convert_silentcipher_state(
        {k: {kk: vv.numpy() for kk, vv in v.items()}
         for k, v in _ckpt_dict(enc_c, dec_c, dec_m, enc_m).items()},
        _hparams(cfg),
    )
    assert len(params["dec_m"]) == cfg.message_len
    wm = NetWatermarker(params, ccfg)
    g = np.random.default_rng(6)
    x = g.normal(scale=0.1, size=4410).astype(np.float32)
    res = wm.decode_wav(x, cfg.sample_rate)
    assert len(res["messages"]) in (0, 1)
    # per-slot and fused heads expose identical result structure
    assert isinstance(res["confidence"], float)


def test_converter_rejects_non_silentcipher():
    with pytest.raises(ValueError, match="missing"):
        convert_silentcipher_state({"foo": {"0.weight": np.zeros((1, 1, 3, 3))}})


def test_hparams_inferred_from_embedding_band():
    """A checkpoint with no hparams pins n_fft through the embedding's
    band size (the decode/encode STFT grids must agree with training)."""
    cfg = silentcipher_test_tiny()
    enc_c, dec_c, dec_m, enc_m = _build_torch_modules(cfg, seed=7)
    params, ccfg = convert_silentcipher_state(
        {k: {kk: vv.numpy() for kk, vv in v.items()}
         for k, v in _ckpt_dict(enc_c, dec_c, dec_m, enc_m).items()}
    )
    assert ccfg.n_fft == cfg.n_fft  # 2*(n_bins-1)


def test_api_backend_selection(tmp_path, monkeypatch):
    from sesameai_tts_tpu.watermark.api import load_watermarker, watermark
    from sesameai_tts_tpu.watermark.dsp import Watermarker as DSPWatermarker

    monkeypatch.delenv("SILENTCIPHER_CKPT", raising=False)
    assert isinstance(load_watermarker(), DSPWatermarker)

    cfg = silentcipher_test_tiny()
    enc_c, dec_c, dec_m, enc_m = _build_torch_modules(cfg, seed=8)
    path = str(tmp_path / "sc.pth")
    torch.save(_ckpt_dict(enc_c, dec_c, dec_m, enc_m, _hparams(cfg)), path)

    wm = load_watermarker(ckpt_path=path)
    assert isinstance(wm, NetWatermarker)
    # watermark() picks the net backend's 36 dB reference strength and
    # rides the same resample semantics (watermarking.py:28-40)
    g = np.random.default_rng(9)
    audio = g.normal(scale=0.1, size=2400).astype(np.float32)
    out, rate = watermark(wm, audio, 24_000, [212, 211, 146, 56, 201])
    assert rate == 24_000
    # compare against the clean 24k→44.1k→24k round trip so the SDR
    # check isolates the watermark residual from resampler error
    from sesameai_tts_tpu.audio.resample import resample

    base = resample(resample(audio, 24_000, 44_100), 44_100, 24_000)
    m = min(len(out), len(base))
    noise = out[:m] - base[:m]
    sdr = 10 * np.log10(np.sum(base[:m] ** 2) / max(np.sum(noise**2), 1e-20))
    assert sdr > 30.0  # 36 dB embed minus resample interaction

    monkeypatch.setenv("SILENTCIPHER_CKPT", path)
    assert isinstance(load_watermarker(), NetWatermarker)


def test_streaming_net_embed_matches_offline():
    """StreamingNetEmbedder == the offline _embed_jit residual (fixed α):
    overlap-save with ±L conv context is exact, not an approximation."""
    import jax
    import jax.numpy as jnp

    from sesameai_tts_tpu.watermark.net import (
        NetWatermarker,
        _bucket_frames,
        _embed_jit,
        _frames_for,
        init_params,
        silentcipher_test_tiny,
    )
    from sesameai_tts_tpu.watermark.stream import StreamingNetEmbedder

    cfg = silentcipher_test_tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = NetWatermarker(params, cfg)
    msg = [212, 211, 146, 56, 201]

    rng = np.random.default_rng(7)
    n = 5 * cfg.hop * 37 + 13  # awkward length
    x = (rng.normal(size=n) * 0.2).astype(np.float32)

    frames = _bucket_frames(_frames_for(n, cfg))
    xp = np.pad(x, (0, frames * cfg.hop - n))
    resid_off, _, _ = _embed_jit(
        params, cfg, jnp.asarray(xp), jnp.asarray(msg, jnp.int32),
        frames, jnp.int32(n),
    )
    resid_off = np.asarray(resid_off)[:n]

    se = StreamingNetEmbedder(model, msg, alpha=1.0)
    outs, i = [], 0
    while i < n:
        c = int(rng.integers(50, 900))
        outs.append(se.feed(x[i : i + c]))
        i += c
    outs.append(se.close())
    y = np.concatenate(outs)
    assert len(y) == n
    resid_stream = y - x
    np.testing.assert_allclose(
        resid_stream, resid_off, atol=5e-5 + 1e-3 * np.abs(resid_off).max()
    )


def test_streaming_net_embed_matches_offline_at_bucket_boundary():
    """Lengths where 1 + n//hop lands EXACTLY on the frame bucket are the
    hard case: the offline program's end reflect-pad mirrors real samples
    and its conv time axis ends right at the last real frames. The
    streaming embedder reproduces both (end-reflection materialized at
    close, traced valid_t mask replicating the conv boundary)."""
    import jax
    import jax.numpy as jnp

    from sesameai_tts_tpu.watermark.net import (
        NetWatermarker,
        _bucket_frames,
        _embed_jit,
        _frames_for,
        init_params,
        silentcipher_test_tiny,
    )
    from sesameai_tts_tpu.watermark.stream import StreamingNetEmbedder

    cfg = silentcipher_test_tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = NetWatermarker(params, cfg)
    msg = [212, 211, 146, 56, 201]
    rng = np.random.default_rng(11)

    for n in (32 * cfg.hop - 1, 32 * cfg.hop - 20, 64 * cfg.hop - cfg.hop // 2):
        assert _bucket_frames(_frames_for(n, cfg)) == _frames_for(n, cfg)
        x = (rng.normal(size=n) * 0.2).astype(np.float32)
        frames = _bucket_frames(_frames_for(n, cfg))
        xp = np.pad(x, (0, frames * cfg.hop - n))
        resid_off, _, _ = _embed_jit(
            params, cfg, jnp.asarray(xp), jnp.asarray(msg, jnp.int32),
            frames, jnp.int32(n),
        )
        resid_off = np.asarray(resid_off)[:n]

        se = StreamingNetEmbedder(model, msg, alpha=1.0)
        outs, i = [], 0
        while i < n:
            c = int(rng.integers(50, 900))
            outs.append(se.feed(x[i : i + c]))
            i += c
        outs.append(se.close())
        y = np.concatenate(outs)
        assert len(y) == n
        np.testing.assert_allclose(
            y - x, resid_off, atol=5e-5 + 1e-3 * np.abs(resid_off).max()
        )


def test_streaming_net_pipeline_shape_and_latency():
    """The net streaming pipe (resample→embed→resample) preserves length
    and emits well before the 4 s group fallback would."""
    import jax

    from sesameai_tts_tpu.watermark.net import (
        NetWatermarker,
        init_params,
        silentcipher_test_tiny,
    )
    from sesameai_tts_tpu.watermark.stream import make_streaming_net_watermarker

    cfg = silentcipher_test_tiny()
    model = NetWatermarker(init_params(cfg, jax.random.PRNGKey(1)), cfg)
    pipe = make_streaming_net_watermarker(model, [1, 2, 3, 4, 5], 24_000)
    assert pipe is not None

    rng = np.random.default_rng(3)
    audio = (rng.normal(size=24_000 * 2) * 0.1).astype(np.float32)
    outs, first_at, fed = [], None, 0
    for i in range(0, len(audio), 1920):
        out = pipe.feed(audio[i : i + 1920])
        fed += 1920
        if len(out) and first_at is None:
            first_at = fed
        outs.append(out)
    outs.append(pipe.close())
    y = np.concatenate(outs)
    assert abs(len(y) - len(audio)) <= 2
    assert np.isfinite(y).all()
    assert first_at is not None and first_at <= 24_000  # « 4 s groups


@pytest.mark.slow
def test_streaming_net_real_dims_embed_and_prefix_verify():
    """VERDICT r3 #9: the streaming net path at the REAL silentcipher
    grid — 44.1 kHz, n_fft 2048 (1025 bins), hop 512 (reference
    watermarking.py:21-25 loads the 44.1k model) — every other
    streaming-net test runs the tiny 128/32 grid.  Two halves:

    1. exactness: StreamingNetEmbedder(alpha=1) == the offline
       ``_embed_jit`` residual at real shapes (bucketing, receptive
       field and reflect-pad handling don't rot when bins jump 17×);
    2. prefix-verify: a deployment-shaped stream (24 kHz io through
       ``make_streaming_net_watermarker``, default 36 dB strength)
       meets the full phase-shift decode machinery on a ≥4 s PREFIX —
       mirroring the DSP prefix tests — with a well-formed,
       deterministic result.  Random-init weights cannot make message
       recovery TRUE (that needs trained weights; the smoke harness
       gates it the same way) — what this pins is everything else the
       real-weight day relies on."""
    import jax
    import jax.numpy as jnp

    from sesameai_tts_tpu.audio.resample import resample
    from sesameai_tts_tpu.watermark.api import CSM_1B_WATERMARK
    from sesameai_tts_tpu.watermark.net import (
        NetWatermarker,
        SilentCipherConfig,
        _bucket_frames,
        _embed_jit,
        _frames_for,
        init_params,
    )
    from sesameai_tts_tpu.watermark.stream import (
        StreamingNetEmbedder,
        make_streaming_net_watermarker,
    )

    cfg = SilentCipherConfig()  # the real 44.1 kHz / 2048 / 512 grid
    assert (cfg.n_bins, cfg.hop) == (1025, 512)
    model = NetWatermarker(init_params(cfg, jax.random.PRNGKey(0)), cfg)
    rng = np.random.default_rng(42)

    # -- 1. stream == offline at real shapes (short clip, fixed gain) ----
    n = 37 * cfg.hop + 201  # awkward length, ~0.44 s at 44.1 kHz
    x = (rng.normal(size=n) * 0.2).astype(np.float32)
    frames = _bucket_frames(_frames_for(n, cfg))
    xp = np.pad(x, (0, frames * cfg.hop - n))
    resid_off, _, _ = _embed_jit(
        model.params, cfg, jnp.asarray(xp),
        jnp.asarray(CSM_1B_WATERMARK, jnp.int32), frames, jnp.int32(n),
    )
    resid_off = np.asarray(resid_off)[:n]
    se = StreamingNetEmbedder(model, CSM_1B_WATERMARK, alpha=1.0)
    outs, i = [], 0
    while i < n:
        c = int(rng.integers(800, 6000))
        outs.append(se.feed(x[i : i + c]))
        i += c
    outs.append(se.close())
    y = np.concatenate(outs)
    assert len(y) == n
    np.testing.assert_allclose(
        y - x, resid_off, atol=5e-5 + 1e-3 * np.abs(resid_off).max()
    )

    # -- 2. deployment stream meets the verifier on a ≥4 s prefix --------
    io_rate, dur_s = 24_000, 4.4
    carrier = (rng.normal(size=int(io_rate * dur_s)) * 0.1).astype(np.float32)
    pipe = make_streaming_net_watermarker(model, CSM_1B_WATERMARK, io_rate)
    outs = [pipe.feed(carrier[i : i + 1920])
            for i in range(0, len(carrier), 1920)]
    outs.append(pipe.close())
    marked = np.concatenate(outs)
    assert abs(len(marked) - len(carrier)) <= 2

    # strength lands at the configured 36 dB (vs the clean 24k→44.1k→24k
    # round trip, isolating the residual from resampler error)
    base = resample(resample(carrier, io_rate, cfg.sample_rate),
                    cfg.sample_rate, io_rate)
    m = min(len(marked), len(base))
    noise = marked[:m] - base[:m]
    sdr = 10 * np.log10(np.sum(base[:m] ** 2) / max(np.sum(noise**2), 1e-20))
    assert 30.0 < sdr < 42.0, sdr

    for prefix_s in (4.0, dur_s):
        seg = resample(marked[: int(prefix_s * io_rate)], io_rate,
                       cfg.sample_rate)
        r = model.decode_wav(seg, cfg.sample_rate,
                             phase_shift_decoding=True,
                             expected_message=CSM_1B_WATERMARK)
        assert isinstance(r["status"], bool)
        assert 0.0 <= r["confidence"] <= 1.0
        assert 0.0 <= r["expected_confidence"] <= 1.0
        for msg in r["messages"]:
            assert len(msg) == cfg.message_len
            assert all(0 <= v < cfg.vocab for v in msg)
        r2 = model.decode_wav(seg, cfg.sample_rate,
                              phase_shift_decoding=True,
                              expected_message=CSM_1B_WATERMARK)
        assert r2 == r  # the verifier is deterministic
