"""CSM dual-transformer model: 1B backbone + 100M codebook decoder.

Capability parity with the reference ``Model`` (reference
sesameai/models.py:99-203): 33-column frame embedding with masked sum,
backbone step, codebook0 head, 31-step decoder loop over codebooks 1..31
with a per-frame-reset decoder KV cache, and an ``audio_head`` weight
stack for codebooks 1..31.

TPU-native structure (deliberately NOT the reference's):

* The model is a pure-function namespace over parameter pytrees; KV
  caches and positions are explicit ``CSMState`` values threaded through
  jitted programs, never module state.
* ``generate_frame``'s inner 31-step decoder loop is a ``lax.scan`` —
  one traced micro-step regardless of codebook count — with the
  codebook-conditioned embedding offset and ``audio_head`` slice both
  scanned-over, so the whole frame (backbone step + 32 samples + decoder
  AR) is a single XLA program with zero host round-trips.
* Multi-frame decoding (``decode_frames``) is an outer ``lax.scan`` with
  an on-device ``done`` carry implementing the all-zero-frame EOS rule
  (reference generator.py:182-184) as masking, not host branching.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sesameai_tts_tpu.core.config import CSMConfig
from sesameai_tts_tpu.models.transformer import (
    KVCache,
    init_kv_cache,
    init_transformer_params,
    is_unstacked,
    precompute_rope,
    transformer_forward,
    unstack_trunk_params,
)
from sesameai_tts_tpu.ops.sampling import sample_topk


def init_csm_params(key: jax.Array, cfg: CSMConfig, dtype=None) -> dict:
    bb, dec = cfg.backbone, cfg.decoder
    dtype = dtype or bb.dtype
    ks = jax.random.split(key, 6)
    scale_b = bb.embed_dim**-0.5
    scale_d = dec.embed_dim**-0.5
    return {
        "backbone": init_transformer_params(ks[0], bb, dtype),
        "decoder": init_transformer_params(ks[1], dec, dtype),
        "text_embeddings": (
            jax.random.normal(ks[2], (cfg.text_vocab_size, bb.embed_dim)) * scale_b
        ).astype(dtype),
        "audio_embeddings": (
            jax.random.normal(
                ks[3], (cfg.audio_vocab_size * cfg.audio_num_codebooks, bb.embed_dim)
            )
            * scale_b
        ).astype(dtype),
        # stored (in, out); torch converter transposes Linear's (out, in)
        "projection": (
            jax.random.normal(ks[4], (bb.embed_dim, dec.embed_dim)) * scale_b
        ).astype(dtype),
        "codebook0_head": (
            jax.random.normal(ks[5], (bb.embed_dim, cfg.audio_vocab_size)) * scale_b
        ).astype(dtype),
        "audio_head": (
            jax.random.normal(
                jax.random.fold_in(key, 7),
                (cfg.audio_num_codebooks - 1, dec.embed_dim, cfg.audio_vocab_size),
            )
            * scale_d
        ).astype(dtype),
    }


class CSMState(NamedTuple):
    """Backbone decoding state — the explicit analog of the reference's
    module-held caches (reference models.py:120-130, 186-188)."""

    cache: KVCache
    pos: jnp.ndarray  # (B,) int32 — next position to write


def init_state(
    cfg: CSMConfig, batch_size: int, dtype=None, unstacked: bool = False
) -> CSMState:
    bb = cfg.backbone
    return CSMState(
        cache=init_kv_cache(bb, batch_size, dtype or bb.dtype, unstacked=unstacked),
        pos=jnp.zeros((batch_size,), jnp.int32),
    )


def unstack_csm_params(params: dict) -> dict:
    """Per-layer (unstacked) trunk weights for the unrolled decode path.

    The canonical checkpoint/training layout stacks layer weights on a
    leading L axis for ``lax.scan``; the decode path unrolls layers and
    codebook steps instead, and per-layer buffers let XLA (a) skip the
    per-iteration stacked-array slices that show up as full-weight copies
    and (b) keep the decoder trunk (re-read 31×/frame) VMEM-resident."""
    out = dict(params)
    out["backbone"] = unstack_trunk_params(params["backbone"])
    out["decoder"] = unstack_trunk_params(params["decoder"])
    return out


def embed_frames(params: dict, cfg: CSMConfig, tokens: jnp.ndarray, tokens_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, S, K+1) int tokens + bool mask → (B, S, D) masked-sum embedding.

    Column layout matches the reference frame format: cols 0..K-1 are the
    K audio codebooks (flat table indexed ``token + codebook*vocab``,
    reference models.py:190-203), col K is the text token.
    """
    K = cfg.audio_num_codebooks
    audio_tok = tokens[..., :K] + (
        jnp.arange(K, dtype=tokens.dtype) * cfg.audio_vocab_size
    )
    audio_emb = params["audio_embeddings"][audio_tok]  # (B, S, K, D)
    text_emb = params["text_embeddings"][tokens[..., K]][..., None, :]  # (B, S, 1, D)
    embeds = jnp.concatenate([audio_emb, text_emb], axis=-2)  # (B, S, K+1, D)
    return jnp.sum(embeds * tokens_mask[..., None], axis=-2)


def _decode_codebooks(
    params: dict,
    cfg: CSMConfig,
    last_h: jnp.ndarray,  # (B, D_backbone) final backbone hidden
    c0: jnp.ndarray,  # (B,) sampled codebook-0 token
    key: jax.Array,
    temperature,
    topk: int,
) -> jnp.ndarray:
    """Run the 100M decoder AR over codebooks 1..K-1 → (B, K-1) samples.

    Reference semantics (models.py:165-182): decoder consumes
    [last_h, c0_embed] then each sampled embed; sample c_i from the output
    at position i via audio_head[i-1]. The decoder cache is fresh every
    frame, length K (reference models.py:127, 170). Here the loop is a
    ``lax.scan`` whose xs carry the per-step audio_head slice, embedding
    row offset, and PRNG key.
    """
    dec = cfg.decoder
    K = cfg.audio_num_codebooks
    B = last_h.shape[0]
    dtype = params["projection"].dtype
    unrolled = is_unstacked(params["decoder"])

    dec_cache = init_kv_cache(dec, B, dtype, max_seq_len=K, unstacked=unrolled)
    rope_cs = precompute_rope(dec, max_len=K)  # decoder positions are 0..K-1

    def dec_step(cache, x, pos):
        h, cache = transformer_forward(
            params["decoder"], dec, x, jnp.full((B,), pos, jnp.int32), cache, rope_cs
        )
        return h[:, 0, :], cache

    # position 0: projected backbone hidden; output unused
    x0 = (last_h[:, None, :] @ params["projection"]).astype(dtype)
    _, dec_cache = dec_step(dec_cache, x0, 0)

    ah = params["audio_head"]  # (K-1, D_dec, V)
    offsets = jnp.arange(K - 1, dtype=jnp.int32) * cfg.audio_vocab_size
    # one batched RNG draw for all codebooks (32 tiny per-step RNG ops
    # inside the scan cost ~1 ms/frame of pure dispatch overhead)
    gumbels = jax.random.gumbel(key, (K - 1, B, cfg.audio_vocab_size), jnp.float32)

    # logits = h @ audio_head[i] with f32 ACCUMULATION but native-dtype
    # operands: an explicit astype(f32) on the bf16 head materializes an
    # 8.4 MB f32 copy per codebook step (~260 MB/frame of pure HBM waste)
    # and turns the MXU pass into slow f32; mixed bf16→f32 dots are native
    def head_logits(h, head):
        return jax.lax.dot_general(
            h, head, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if unrolled:
        # fully unrolled micro-loop: the decoder trunk weights (per-layer
        # buffers) are re-read by all K-1 steps inside one program, which
        # lets XLA keep them on-chip between steps — the decode-path win
        # that scan's per-iteration weight re-fetch cannot express
        cache, prev_c = dec_cache, c0
        cs_list = []
        for i in range(K - 1):
            emb = params["audio_embeddings"][prev_c + offsets[i]]
            x = (emb[:, None, :] @ params["projection"]).astype(dtype)
            h, cache = dec_step(cache, x, i + 1)
            logits = head_logits(h, ah[i])
            ci = sample_topk(None, logits, topk, temperature, gumbel=gumbels[i])
            cs_list.append(ci)
            prev_c = ci
        return jnp.stack(cs_list, axis=1)  # (B, K-1)

    def scan_body(carry, xs):
        cache, prev_c, pos = carry
        head, off, g = xs
        emb = params["audio_embeddings"][prev_c + off]  # (B, D_backbone)
        x = (emb[:, None, :] @ params["projection"]).astype(dtype)
        h, cache = transformer_forward(
            params["decoder"], dec, x, jnp.full((B,), pos, jnp.int32), cache, rope_cs
        )
        logits = head_logits(h[:, 0, :], head)
        ci = sample_topk(None, logits, topk, temperature, gumbel=g)
        return (cache, ci, pos + 1), ci

    (_, _, _), cs = jax.lax.scan(
        scan_body,
        (dec_cache, c0, jnp.int32(1)),
        (ah, offsets, gumbels),
    )
    return cs.T  # (B, K-1)


def extend_state(
    params: dict,
    cfg: CSMConfig,
    state: CSMState,
    tokens: jnp.ndarray,  # (B, S, K+1)
    tokens_mask: jnp.ndarray,
    valid_len: Optional[jnp.ndarray] = None,
    rope_cs: Optional[jnp.ndarray] = None,
) -> CSMState:
    """Run the backbone over rows WITHOUT sampling a frame — used to
    precompute a voice-context KV prefix once per voice (the TPU analog
    of the reference's cached context tokens, tts_service.py:133-138,
    but caching compute, not just tokens)."""
    bb = cfg.backbone
    B, S, _ = tokens.shape
    if rope_cs is None:
        rope_cs = precompute_rope(bb)
    x = embed_frames(params, cfg, tokens, tokens_mask).astype(params["projection"].dtype)
    _, cache = transformer_forward(
        params["backbone"], bb, x, state.pos, cache=state.cache, rope_cs=rope_cs,
        valid_len=valid_len,
    )
    new_pos = state.pos + (valid_len if valid_len is not None else S)
    return CSMState(cache=cache, pos=new_pos)


def generate_frame(
    params: dict,
    cfg: CSMConfig,
    state: CSMState,
    tokens: jnp.ndarray,  # (B, S, K+1)
    tokens_mask: jnp.ndarray,  # (B, S, K+1)
    key: jax.Array,
    temperature=0.8,
    topk: int = 40,
    valid_len: Optional[jnp.ndarray] = None,  # (B,) for right-padded prefill
    rope_cs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, CSMState]:
    """One frame of 32 codes from a window of input rows.

    Used for both prefill (S = prompt rows, the reference's first
    ``generate_frame`` call over the whole prompt, generator.py:181) and
    decode (S = 1 feedback row). Returns ((B, K) int32 frame, new state).
    """
    bb = cfg.backbone
    B, S, _ = tokens.shape
    if rope_cs is None:
        rope_cs = precompute_rope(bb)

    x = embed_frames(params, cfg, tokens, tokens_mask).astype(params["projection"].dtype)
    h, cache = transformer_forward(
        params["backbone"], bb, x, state.pos, cache=state.cache, rope_cs=rope_cs,
        valid_len=valid_len,
    )
    if valid_len is None:
        last_h = h[:, -1, :]
        new_pos = state.pos + S
    else:
        # clamp: a valid_len=0 row (idle slot in a batched prefill) would
        # gather at -1; its output is meaningless either way, but must be
        # a defined row, not a wrapped one
        idx = jnp.maximum(valid_len - 1, 0)
        last_h = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        new_pos = state.pos + valid_len

    k0, k_rest = jax.random.split(key)
    # mixed-precision dot (operands stay bf16, f32 accumulation) — see
    # head_logits in _decode_codebooks for why astype(f32) is wrong here
    c0_logits = jax.lax.dot_general(
        last_h, params["codebook0_head"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    c0 = sample_topk(k0, c0_logits, topk, temperature)  # (B,)

    cs = _decode_codebooks(params, cfg, last_h, c0, k_rest, temperature, topk)
    frame = jnp.concatenate([c0[:, None], cs], axis=1)  # (B, K)
    return frame, CSMState(cache=cache, pos=new_pos)


def decode_frames(
    params: dict,
    cfg: CSMConfig,
    state: CSMState,
    prev_frame: jnp.ndarray,  # (B, K) last sampled frame (from prefill/prev chunk)
    prev_done: jnp.ndarray,  # (B,) bool — EOS already hit
    key: jax.Array,
    num_frames: int,
    temperature=0.8,
    topk: int = 40,
    rope_cs: Optional[jnp.ndarray] = None,
    start_index=0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, CSMState]:
    """Generate ``num_frames`` more frames entirely on device.

    The reference's decode loop feeds each frame back with a zero text
    column and checks EOS on the host every step (generator.py:180-203) —
    a sync per 80 ms of audio. Here the feedback embedding, sampling and
    the all-zero-frame EOS rule ride a single ``lax.scan``; the host only
    sees (frames, valid mask, done) once per chunk.

    Per-frame PRNG keys are ``fold_in(key, start_index + i)`` — sampling
    depends only on (utterance key, absolute frame index), NOT on how
    the generator batches frames into dispatch chunks, so every chunk
    schedule (streaming, offline ramp, serving ticks) produces identical
    frames from the same seed.

    Returns (frames (T, B, K), valid (T, B) bool, done (B,), new state).
    """
    bb = cfg.backbone
    K = cfg.audio_num_codebooks
    B = prev_frame.shape[0]
    if rope_cs is None:
        rope_cs = precompute_rope(bb)

    # feedback row: K audio cols (mask True) + zero text col (mask False),
    # exactly the reference's curr_tokens construction (generator.py:199-203)
    mask_row = jnp.concatenate(
        [jnp.ones((B, 1, K), bool), jnp.zeros((B, 1, 1), bool)], axis=-1
    )

    def step(carry, k):
        st, frame, done = carry
        tokens = jnp.concatenate(
            [frame[:, None, :], jnp.zeros((B, 1, 1), frame.dtype)], axis=-1
        )
        new_frame, new_st = generate_frame(
            params, cfg, st, tokens, mask_row, k, temperature, topk, rope_cs=rope_cs
        )
        is_eos = jnp.all(new_frame == 0, axis=-1)  # (B,)
        valid = ~(done | is_eos)
        new_done = done | is_eos
        # post-EOS steps still compute (fixed trip count) but their outputs
        # are masked; the host stops dispatching chunks once done is all-True
        out_frame = jnp.where(valid[:, None], new_frame, 0)
        return (new_st, out_frame, new_done), (out_frame, valid)

    idx = jnp.asarray(start_index, jnp.int32) + jnp.arange(num_frames, dtype=jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
    (state, last_frame, done), (frames, valid) = jax.lax.scan(
        step, (state, prev_frame, prev_done), keys
    )
    return frames, valid, done, state


def teacher_forced_eval(
    params: dict,
    cfg: CSMConfig,
    state: CSMState,
    teacher: jnp.ndarray,  # (T, B, K) fixed feedback trajectory
    rope_cs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode with the feedback FORCED to a fixed trajectory.

    Quantization / checkpoint-conversion QA: free-running greedy streams
    are chaotic (one borderline argmax flip early re-routes the whole
    trajectory — a frame-0 flip on random weights measured a 0.0 match
    rate in round 4), so comparing two weight layouts means asking, at
    every step, "given the IDENTICAL history, what would each emit?".
    Feed both models the same ``teacher`` frames and compare the
    returned per-step predictions (and codebook0 logits, whose SNR
    measures forward-pass fidelity independent of argmax margins).

    The reference has no analog — its quantization QA is listening to
    the audio; this is the programmatic equivalent for environments
    without real weights (and the real-weights acceptance check,
    docs/REAL_WEIGHTS.md).

    Returns ((T, B, K) int32 greedy frames, (T, B, V) f32 codebook0
    logits). Codebooks 1..31 free-run *within* a step (conditioned on
    the greedy c0), exactly like production decode.
    """
    bb = cfg.backbone
    K = cfg.audio_num_codebooks
    B = teacher.shape[1]
    if rope_cs is None:
        rope_cs = precompute_rope(bb)
    mask_row = jnp.concatenate(
        [jnp.ones((B, 1, K), bool), jnp.zeros((B, 1, 1), bool)], axis=-1
    )
    k0 = jax.random.PRNGKey(0)  # greedy (topk=1) is key-invariant

    def step(st, fin):
        tokens = jnp.concatenate(
            [fin[:, None, :], jnp.zeros((B, 1, 1), fin.dtype)], axis=-1
        )
        x = embed_frames(params, cfg, tokens, mask_row).astype(
            params["projection"].dtype
        )
        h, cache = transformer_forward(
            params["backbone"], bb, x, st.pos, cache=st.cache, rope_cs=rope_cs
        )
        last_h = h[:, -1, :]
        c0_logits = jax.lax.dot_general(
            last_h, params["codebook0_head"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        c0 = sample_topk(k0, c0_logits, 1, jnp.float32(1.0))
        cs = _decode_codebooks(params, cfg, last_h, c0, k0, jnp.float32(1.0), 1)
        frame = jnp.concatenate([c0[:, None], cs], axis=1)
        return CSMState(cache=cache, pos=st.pos + 1), (frame, c0_logits)

    _, (frames, logits) = jax.lax.scan(step, state, teacher)
    return frames, logits
