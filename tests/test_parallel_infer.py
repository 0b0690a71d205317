"""Multi-chip inference: sharded decode == unsharded decode.

Runs on the 8-virtual-CPU-device mesh from conftest (SURVEY.md §4d).
Covers the VERDICT round-1 gap: TP-sharded generate_frame / dp-sharded
batched decode, plus the sharded Generator and BatchedTTSServer paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sesameai_tts_tpu.core.config import csm_test_tiny
from sesameai_tts_tpu.models import csm as csm_model
from sesameai_tts_tpu.parallel.infer import (
    infer_param_specs,
    shard_csm_params,
    shard_state,
)
from sesameai_tts_tpu.parallel.mesh import make_mesh


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mk_prompt(cfg, B=1, S=12, seed=0):
    rng = np.random.default_rng(seed)
    K = cfg.audio_num_codebooks
    tokens = np.zeros((B, S, K + 1), np.int32)
    mask = np.zeros((B, S, K + 1), bool)
    tokens[:, :, K] = rng.integers(1, cfg.text_vocab_size, (B, S))
    mask[:, :, K] = True
    return jnp.asarray(tokens), jnp.asarray(mask)


def _run(params, cfg, B, tokens, mask, mesh=None, frames=5):
    state = csm_model.init_state(cfg, B, jnp.float32,
                                 unstacked=csm_model.is_unstacked(params["backbone"]))
    if mesh is not None:
        params = shard_csm_params(params, mesh)
        state = shard_state(state, mesh)
    key = jax.random.PRNGKey(7)
    frame0, state = csm_model.generate_frame(
        params, cfg, state, tokens, mask, key, temperature=1.0, topk=1
    )
    done = jnp.zeros((B,), bool)
    out, valid, done, state = csm_model.decode_frames(
        params, cfg, state, frame0, done, jax.random.PRNGKey(8), frames,
        temperature=1.0, topk=1,
    )
    return np.asarray(frame0), np.asarray(out), np.asarray(valid)


def test_tp_generate_frame_matches_unsharded():
    """TP-only mesh (dp=1, tp=2): single-stream decode, greedy parity."""
    cfg = csm_test_tiny()
    params = csm_model.init_csm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tokens, mask = _mk_prompt(cfg)

    f_ref, out_ref, valid_ref = _run(params, cfg, 1, tokens, mask)
    mesh = make_mesh(dp=1, tp=2)
    f_tp, out_tp, valid_tp = _run(params, cfg, 1, tokens, mask, mesh=mesh)

    np.testing.assert_array_equal(f_ref, f_tp)
    np.testing.assert_array_equal(out_ref, out_tp)
    np.testing.assert_array_equal(valid_ref, valid_tp)


def test_dp_tp_batched_decode_matches():
    """(dp=4, tp=2) mesh: 4-slot batched decode, greedy parity."""
    cfg = csm_test_tiny()
    params = csm_model.init_csm_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    tokens, mask = _mk_prompt(cfg, B=4, seed=3)

    f_ref, out_ref, valid_ref = _run(params, cfg, 4, tokens, mask)
    mesh = make_mesh(dp=4, tp=2)
    f_sh, out_sh, valid_sh = _run(params, cfg, 4, tokens, mask, mesh=mesh)

    np.testing.assert_array_equal(f_ref, f_sh)
    np.testing.assert_array_equal(out_ref, out_sh)
    np.testing.assert_array_equal(valid_ref, valid_sh)


def test_unstacked_quantized_specs_and_parity():
    """The decode path's actual layout (unstacked + int8) shards too."""
    from sesameai_tts_tpu.ops.quant import quantize_csm

    cfg = csm_test_tiny()
    params = csm_model.init_csm_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    params = csm_model.unstack_csm_params(quantize_csm(params))

    specs = infer_param_specs(params)
    p_leaves = jax.tree.flatten(params)[0]
    s_leaves = jax.tree.flatten(
        specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )[0]
    assert len(p_leaves) == len(s_leaves)

    tokens, mask = _mk_prompt(cfg, seed=5)
    f_ref, out_ref, _ = _run(params, cfg, 1, tokens, mask)
    mesh = make_mesh(dp=1, tp=2)
    f_sh, out_sh, _ = _run(params, cfg, 1, tokens, mask, mesh=mesh)
    np.testing.assert_array_equal(f_ref, f_sh)
    np.testing.assert_array_equal(out_ref, out_sh)


def test_generator_on_mesh_matches_single_device():
    """End-to-end: build_generator(mesh=...) produces identical frames."""
    from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec

    text = "hello mesh world"
    gen0 = build_generator(test_tiny_spec(), decode_chunk_frames=4)
    frames0 = gen0.generate_frames(text, 1, [], max_audio_length_ms=800,
                                   temperature=1.0, topk=1)

    mesh = make_mesh(dp=1, tp=2)
    gen1 = build_generator(test_tiny_spec(), decode_chunk_frames=4, mesh=mesh)
    frames1 = gen1.generate_frames(text, 1, [], max_audio_length_ms=800,
                                   temperature=1.0, topk=1)
    np.testing.assert_array_equal(frames0, frames1)

    # streamed audio survives the mesh path too (Mimi replicated)
    audio = gen1.generate(text, 1, [], max_audio_length_ms=800, stream=True,
                          temperature=1.0, topk=1)
    assert audio.ndim == 1 and np.isfinite(audio).all()


def test_batched_server_on_mesh():
    """BatchedTTSServer over a (dp=2, tp=2) mesh: slots spread across
    chips; sessions complete and PCM arrives."""
    from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec
    from sesameai_tts_tpu.runtime.serving import BatchedTTSServer

    mesh = make_mesh(dp=2, tp=2)
    gen = build_generator(test_tiny_spec(), decode_chunk_frames=4, mesh=mesh)
    server = BatchedTTSServer(gen, slots=2, chunk_frames=4)
    server.start()
    try:
        sessions = [
            server.submit(f"session {i} text", max_audio_length_ms=640)
            for i in range(3)
        ]
        for s in sessions:
            audio = s.audio(timeout=120)
            assert audio.ndim == 1
    finally:
        server.stop()


def test_codec_device_stage_pipeline_matches_single_device():
    """Two-chip stage pipeline (SURVEY §2.3 PP row): AR decode on device
    0, Mimi pinned to device 1, chunk-overlapped.  Output must equal the
    single-device fused path exactly (same seed → same frames; causal
    codec → identical PCM)."""
    from sesameai_tts_tpu.runtime.loader import build_generator, test_tiny_spec

    text = "pipeline split across two chips"
    kw = dict(max_audio_length_ms=1600, temperature=0.9, topk=5)

    g0 = build_generator(test_tiny_spec(), decode_chunk_frames=4)
    ref_stream = list(g0.generate_stream(text, 1, [], chunk_frames=2, **kw))

    g1 = build_generator(test_tiny_spec(), decode_chunk_frames=4,
                         codec_device=jax.devices()[1])
    split_stream = list(g1.generate_stream(text, 1, [], chunk_frames=2, **kw))

    ref = np.concatenate(ref_stream)
    out = np.concatenate(split_stream)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # offline generate() and voice-context encode ride the codec chip too
    g2 = build_generator(test_tiny_spec(), decode_chunk_frames=4,
                         codec_device=jax.devices()[1])
    audio = g2.generate(text, 1, [], **kw)
    assert np.isfinite(audio).all() and len(audio) % g2._hop == 0


def test_global_serving_mesh_and_bootstrap_contract():
    """Multi-host helpers: mesh layout keeps tp groups process-local and
    the bootstrap validates its argument pairing (real multi-host needs
    hardware; the contract is what CI can pin)."""
    from sesameai_tts_tpu.parallel.distributed import (
        global_serving_mesh,
        initialize_multihost,
    )

    mesh = global_serving_mesh(tp=2)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.shape["dp"] * mesh.shape["tp"] == len(jax.devices())

    with pytest.raises(ValueError):
        global_serving_mesh(tp=3)  # does not divide 8
    with pytest.raises(ValueError):
        initialize_multihost(coordinator_address="h:1234")  # missing pid
    initialize_multihost(num_processes=1)  # explicit single-process no-op

    # the multi-host mesh drives the same sharded decode as make_mesh
    cfg = csm_test_tiny()
    params = csm_model.init_csm_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    tokens, mask = _mk_prompt(cfg, B=4, seed=9)
    f_ref, out_ref, _ = _run(params, cfg, 4, tokens, mask)
    f_sh, out_sh, _ = _run(params, cfg, 4, tokens, mask, mesh=mesh)
    np.testing.assert_array_equal(f_ref, f_sh)
    np.testing.assert_array_equal(out_ref, out_sh)
