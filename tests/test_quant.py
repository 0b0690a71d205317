"""Weight-only int8 quantization: accuracy + pipeline integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesameai_tts_tpu.ops.quant import (
    is_quantized,
    qdot,
    quantize_csm,
    quantize_weight,
)


def test_quantize_weight_accuracy():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8
    deq = qw["q"].astype(jnp.float32) * qw["scale"][None, :]
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # int8 per-channel: <1% of max


def test_qdot_matches_dense():
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 64)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    ref = x @ w
    out = qdot(x, quantize_weight(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.05, atol=0.02)
    # plain arrays pass through untouched
    np.testing.assert_allclose(np.asarray(qdot(x, w)), np.asarray(ref), rtol=1e-6)


def test_quantized_csm_generates():
    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.models.csm import generate_frame, init_csm_params, init_state

    cfg = csm_test_tiny()
    K = cfg.audio_num_codebooks
    params = init_csm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = quantize_csm(params)
    assert is_quantized(qparams["backbone"]["layers"]["qkv"])
    assert not is_quantized(qparams["audio_head"])

    rng = np.random.default_rng(0)
    tokens = np.zeros((1, 6, K + 1), np.int32)
    mask = np.zeros((1, 6, K + 1), bool)
    tokens[0, :, K] = rng.integers(0, cfg.text_vocab_size, 6)
    mask[0, :, K] = True

    f_q, _ = generate_frame(
        qparams, cfg, init_state(cfg, 1, jnp.float32),
        jnp.asarray(tokens), jnp.asarray(mask), jax.random.PRNGKey(1), 1.0, 1,
    )
    f = np.asarray(f_q)
    assert f.shape == (1, K)
    assert (f >= 0).all() and (f < cfg.audio_vocab_size).all()

    # int8 logits stay close to dense logits → greedy tokens mostly agree
    f_d, _ = generate_frame(
        params, cfg, init_state(cfg, 1, jnp.float32),
        jnp.asarray(tokens), jnp.asarray(mask), jax.random.PRNGKey(1), 1.0, 1,
    )
    agree = (f == np.asarray(f_d)).mean()
    assert agree >= 0.5, f"quantized greedy diverged too much: {agree}"


def test_int4_pack_roundtrip_and_accuracy():
    from sesameai_tts_tpu.ops.quant import _dequant4, quantize_weight_int4

    w = jax.random.normal(jax.random.PRNGKey(4), (256, 128)) * 0.05
    q4 = quantize_weight_int4(w, group=64)
    assert q4["q4"].shape == (128, 128) and q4["q4"].dtype == jnp.int8
    assert q4["scale"].shape == (4, 128)
    deq = _dequant4(q4, jnp.float32)
    # int4 group-wise: error bounded by scale/2 = max|group|/14
    err = np.asarray(jnp.abs(deq - w))
    bound = np.asarray(q4["scale"] / 2.0)[:, None, :].repeat(64, axis=1).reshape(256, 128)
    assert (err <= bound + 1e-6).all()
    rel = float(err.max() / jnp.abs(w).max())
    assert rel < 0.12  # ~7x coarser than int8, still small vs weight scale


def test_int4_qdot_matches_dense():
    from sesameai_tts_tpu.ops.quant import quantize_weight_int4

    w = jax.random.normal(jax.random.PRNGKey(5), (512, 256)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 512))
    ref = np.asarray(x @ w)
    out = np.asarray(qdot(x, quantize_weight_int4(w, group=128)))
    # int4 error accumulates ~sqrt(D)·(scale/sqrt(12)) per output; on these
    # random weights that is ~12% of the output std at the max, ~3% rms
    # per-element noise sigma = scale/sqrt(12) ~ 0.12*w_sigma for gaussian
    # weights with max-based group scales (~19 dB weight SNR); output rms
    # error is that same ratio of the output std, max ~3.5 sigma above it
    denom = ref.std()
    assert np.abs(out - ref).max() / denom < 0.5
    assert np.sqrt(((out - ref) ** 2).mean()) / denom < 0.15


def test_int4_csm_generates_and_matches_int8_mostly():
    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.models.csm import generate_frame, init_csm_params, init_state
    from sesameai_tts_tpu.ops.quant import is_quantized4

    cfg = csm_test_tiny()
    K = cfg.audio_num_codebooks
    params = init_csm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    # tiny dims (64) need a smaller group: quantize by hand with group=16
    from sesameai_tts_tpu.ops.quant import quantize_weight_int4

    q4params = dict(params)
    for trunk in ("backbone", "decoder"):
        layers = dict(params[trunk]["layers"])
        for k in ("qkv", "o_proj", "w13", "w2"):
            layers[k] = jax.vmap(lambda m: quantize_weight_int4(m, 16))(layers[k])
        q4params[trunk] = {"layers": layers, "final_norm": params[trunk]["final_norm"]}
    assert is_quantized4(q4params["backbone"]["layers"]["qkv"])

    rng = np.random.default_rng(0)
    tokens = np.zeros((1, 6, K + 1), np.int32)
    mask = np.zeros((1, 6, K + 1), bool)
    tokens[0, :, K] = rng.integers(0, cfg.text_vocab_size, 6)
    mask[0, :, K] = True

    f4, _ = generate_frame(
        q4params, cfg, init_state(cfg, 1, jnp.float32),
        jnp.asarray(tokens), jnp.asarray(mask), jax.random.PRNGKey(1), 1.0, 1,
    )
    f4 = np.asarray(f4)
    assert f4.shape == (1, K)
    assert (f4 >= 0).all() and (f4 < cfg.audio_vocab_size).all()

    # Greedy codes on a RANDOM tiny model are a meaningless quality proxy
    # (near-uniform logits + AR feedback amplify any flip); the meaningful
    # check is that the quantized trunk's hidden states stay highly
    # correlated with the dense trunk's.
    from sesameai_tts_tpu.models.csm import embed_frames
    from sesameai_tts_tpu.models.transformer import precompute_rope, transformer_forward

    bb = cfg.backbone
    x = embed_frames(params, cfg, jnp.asarray(tokens), jnp.asarray(mask))
    rope = precompute_rope(bb)
    pos = jnp.zeros((1,), jnp.int32)
    h_dense, _ = transformer_forward(params["backbone"], bb, x, pos, None, rope)
    h_q4, _ = transformer_forward(q4params["backbone"], bb, x, pos, None, rope)
    a = np.asarray(h_dense, np.float32).ravel()
    b = np.asarray(h_q4, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.9, f"int4 trunk cosine {cos}"  # ~0.97 on random weights


def test_fused_mlp_kernel_matches_unfused():
    """quant_mlp_pallas (interpret mode) vs the exact unfused sequence.

    The w13 half must match bit-for-bit (columns are tiling-independent);
    the w2 contraction differs only in f32 partial-sum order."""
    from sesameai_tts_tpu.ops.quant import quant_mlp_pallas

    D, F, Dout, S = 128, 512, 128, 2
    k = jax.random.split(jax.random.PRNGKey(7), 3)
    w13 = quantize_weight(jax.random.normal(k[0], (D, 2 * F)) * 0.05)
    w2 = quantize_weight(jax.random.normal(k[1], (F, Dout)) * 0.05)
    x = (jax.random.normal(k[2], (S, D)) * 0.3).astype(jnp.bfloat16)

    a = qdot(x, w13)
    gate = jax.nn.silu(a[..., :F].astype(jnp.float32)).astype(x.dtype)
    ref = qdot(gate * a[..., F:], w2)

    out = quant_mlp_pallas(
        x, w13["q"], w13["scale"], w2["q"], w2["scale"],
        block_i=256, interpret=True,
    )
    assert out.dtype == x.dtype
    ref_f = np.asarray(ref, np.float32)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref_f,
        atol=2e-2 * float(np.abs(ref_f).max()) + 1e-6,
    )


def test_qmlp_dense_fallback_is_exact():
    """qmlp on unquantized weights == the inline transformer sequence."""
    from sesameai_tts_tpu.ops.quant import qmlp

    D, F = 32, 64
    k = jax.random.split(jax.random.PRNGKey(8), 3)
    w13 = jax.random.normal(k[0], (D, 2 * F)) * 0.1
    w2 = jax.random.normal(k[1], (F, D)) * 0.1
    x = jax.random.normal(k[2], (3, D))
    a = x @ w13
    ref = (jax.nn.silu(a[..., :F].astype(jnp.float32)).astype(x.dtype)
           * a[..., F:]) @ w2
    np.testing.assert_allclose(np.asarray(qmlp(x, w13, w2)), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dequantize_csm_all_layouts():
    """Prefill-shadow dequantization covers stacked/unstacked x int8/int4
    (regression: stacked int4 leaves crashed _dequant4)."""
    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.models.csm import init_csm_params, unstack_csm_params
    from sesameai_tts_tpu.ops.quant import dequantize_csm

    cfg = csm_test_tiny()
    params = init_csm_params(jax.random.PRNGKey(9), cfg, jnp.float32)
    for bits in (8, 4):
        q_stacked = quantize_csm(params, bits=bits)
        for tree, ref in (
            (q_stacked, params),
            (unstack_csm_params(q_stacked), unstack_csm_params(params)),
        ):
            deq = dequantize_csm(tree, jnp.float32)
            ref_leaves = jax.tree.leaves(ref)
            deq_leaves = jax.tree.leaves(deq)
            assert len(ref_leaves) == len(deq_leaves)
            for a, b in zip(ref_leaves, deq_leaves):
                assert a.shape == b.shape
                tol = 0.02 if bits == 8 else 0.2
                scale = float(jnp.abs(a).max()) + 1e-6
                assert float(jnp.abs(a - b).max()) / scale < tol


def test_int8_default_weight_snr_flagship_shapes():
    """VERDICT r3 #4: the int8 DEFAULT gets the same rigor int4 already
    has.  Weight-SNR of the per-channel int8 quantizer on bf16 gaussian
    matrices at every flagship trunk shape (backbone 2048/8192,
    decoder 1024/8192; llama3_2_1B/llama3_2_100M in core/config.py).

    Threshold that would flip the serving default back to bf16
    (documented in PARITY.md): weight-SNR < 35 dB on any trunk shape,
    or the flagship greedy streams (bench.py int8-quality section)
    diverging before frame 25 (2 s).  Measured: per-channel symmetric
    int8 on gaussian weights sits at ~40 dB — 16 dB above the gate and
    ~21 dB above int4's measured 19 dB (which is opt-in for that
    reason)."""
    key = jax.random.PRNGKey(0)
    # (in, out) for each distinct trunk matmul at flagship dims:
    # attn qkv/o (E,E) + (E, kv), SwiGLU w13 (E, 2I) and w2 (I, E)
    shapes = [
        (2048, 2048), (2048, 512), (2048, 2 * 8192), (8192, 2048),  # 1B
        (1024, 1024), (1024, 256), (1024, 2 * 8192), (8192, 1024),  # 100M
    ]
    for shape in shapes:
        key, k = jax.random.split(key)
        w = (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(
            jnp.bfloat16
        )
        qw = quantize_weight(w)
        deq = qw["q"].astype(jnp.float32) * qw["scale"][None, :]
        wf = w.astype(jnp.float32)
        err = deq - wf
        snr = 10.0 * float(
            jnp.log10(jnp.sum(wf * wf) / jnp.maximum(jnp.sum(err * err), 1e-20))
        )
        assert snr > 35.0, (shape, snr)


def test_int8_greedy_matches_dense_tiny():
    """Greedy (topk=1) generation through int8-quantized trunks matches
    the dense model under TEACHER FORCING at tiny dims — the
    deterministic end-to-end companion to the flagship-dims bench
    section (greedy is PRNG-key-invariant, so any mismatch is
    quantization error crossing an argmax boundary, not sampling noise).

    Teacher-forced, not free-running: both models are fed the DENSE
    model's frame each step.  Free-running AR compounds a single flip
    into total downstream divergence (measured: one flip at frame 2 →
    whole-frame match 0.15), which measures chaos, not quantization
    quality.  Tiny gaussian weights are the worst case for argmax
    stability (near-tied logits), and the codebook decoder is itself AR
    over codebooks, so one near-tie flip cascades within its frame.
    Measured on this seed: 12 of 13 steps bit-exact, per-token 0.94."""
    from sesameai_tts_tpu.core.config import csm_test_tiny
    from sesameai_tts_tpu.models.csm import (
        generate_frame,
        init_csm_params,
        init_state,
    )

    cfg = csm_test_tiny()
    K = cfg.audio_num_codebooks
    params = init_csm_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    qparams = quantize_csm(params)

    tokens = jnp.zeros((1, 6, K + 1), jnp.int32).at[0, :, K].set(
        jnp.arange(2, 8)
    )
    mask = jnp.zeros((1, 6, K + 1), bool).at[:, :, K].set(True)

    std = init_state(cfg, 1, jnp.float32)
    stq = init_state(cfg, 1, jnp.float32)
    fd, std = generate_frame(params, cfg, std, tokens, mask,
                             jax.random.PRNGKey(0), 1.0, 1)
    fq, stq = generate_frame(qparams, cfg, stq, tokens, mask,
                             jax.random.PRNGKey(0), 1.0, 1)
    per_step = [float((np.asarray(fd) == np.asarray(fq)).mean())]
    mrow = jnp.concatenate(
        [jnp.ones((1, 1, K), bool), jnp.zeros((1, 1, 1), bool)], axis=-1
    )
    for i in range(12):
        row = jnp.concatenate(
            [fd, jnp.zeros((1, 1), fd.dtype)], axis=-1
        )[:, None, :]
        kk = jax.random.PRNGKey(100 + i)
        fd, std = generate_frame(params, cfg, std, row, mrow, kk, 1.0, 1)
        fq, stq = generate_frame(qparams, cfg, stq, row, mrow, kk, 1.0, 1)
        per_step.append(float((np.asarray(fd) == np.asarray(fq)).mean()))

    exact_steps = sum(1 for m in per_step if m == 1.0)
    assert per_step[0] == 1.0, per_step  # prefill frame must be bit-exact
    assert exact_steps >= 10, per_step
    assert float(np.mean(per_step)) >= 0.8, per_step


def test_quant_acceptance_gate_passes_and_trips():
    """The executable int8 gate (runtime/qa.py, VERDICT r4 #3): on a
    healthy quantization the acceptance report passes its thresholds;
    corrupting the deployed int8 tables (a conversion/kernel-bug
    stand-in the weight-SNR half cannot see — it only measures the
    quantizer's own error on the dense weights) must trip the
    teacher-forced logit-SNR half. This pins that the smoke harness's
    exit code actually reflects quantization quality."""
    import dataclasses

    from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec
    from sesameai_tts_tpu.runtime.qa import quant_acceptance

    spec_q = dataclasses.replace(test_tiny_spec(), quantize="int8")
    gen_q = build_generator(spec_q, decode_chunk_frames=4)
    gen_ref = build_generator(test_tiny_spec(), decode_chunk_frames=4)
    text = "the quant acceptance gate runs teacher forced"
    # tiny random weights: argmax margins ~0, so the per-code match is
    # chaos — but the logit SNR is well-defined; use a relaxed floor the
    # corrupt case still cannot reach
    rep = quant_acceptance(gen_q, gen_ref, text=text, steps=12,
                           min_logit_snr_db=5.0)
    assert rep["passed"], rep
    assert rep["weight_snr_min_db"] >= 35.0, rep  # quantizer healthy
    assert rep["self_consistency"] >= 0.9, rep    # tf == production decode
    assert rep["steps"] > 0

    # corrupt the DEPLOYED tables (scales 16x): weight-SNR (dense-side)
    # is blind to this; the teacher-forced comparison is not
    def _corrupt(tree):
        def fix(x):
            if isinstance(x, dict) and "q" in x:
                return {**x, "scale": x["scale"] * 16.0}
            return x

        return jax.tree.map(
            fix, tree, is_leaf=lambda x: isinstance(x, dict) and "q" in x
        )

    gen_q._params = _corrupt(gen_q._params)
    rep2 = quant_acceptance(gen_q, gen_ref, text=text, steps=12,
                            min_logit_snr_db=5.0)
    assert not rep2["passed"], rep2
    assert rep2["logit_snr_db"] < rep["logit_snr_db"], (rep, rep2)
