"""CSM training objective (inference-only in the reference — SURVEY.md §5
"checkpoint/resume: no training"; this is a framework capability the
rebuild adds).

Next-frame prediction over interleaved text/audio rows:

* **codebook-0 loss**: backbone hidden at row t → ``codebook0_head`` →
  CE against row t+1's codebook-0 token, masked to rows whose successor
  is an audio frame;
* **decoder loss**: for a compute-amortized subset of audio rows (the
  published CSM recipe trains the decoder on 1/16 of frames), the 100M
  decoder runs teacher-forced over [h_t, embed(c0..c_{K-2})] and each
  position i ≥ 1 predicts codebook i via ``audio_head[i-1]``.

Everything is fixed-shape: the amortized subset is ``decoder_frames``
audio rows per example (selected by masked argsort — randomized per
step by the train step via ``subset_r``, first-N for eval), with zero
weights when an example has fewer audio rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sesameai_tts_tpu.core.config import CSMConfig
from sesameai_tts_tpu.models.csm import embed_frames
from sesameai_tts_tpu.models.transformer import precompute_rope, transformer_forward


class Batch(NamedTuple):
    tokens: jnp.ndarray  # (B, S, K+1) int32
    mask: jnp.ndarray  # (B, S, K+1) bool
    loss_mask: jnp.ndarray  # (B, S) bool — rows that are real (not padding)


def _softmax_xent(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return logz - gold


def csm_loss(
    params: dict,
    cfg: CSMConfig,
    batch: Batch,
    decoder_frames: int = 4,
    remat: bool = False,
    subset_r: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """→ (scalar loss, metrics dict).

    ``subset_r`` — optional (B, S-1) uniform scores ranking which audio
    rows the amortized decoder loss trains this step (smallest scores
    win). ``None`` selects the FIRST ``decoder_frames`` audio rows
    deterministically — fine for eval comparability, but training long
    clips that way would only ever teach the decoder utterance-onset
    acoustics; the train step passes per-step randomness so every frame
    eventually receives codebook-1..K-1 loss (the published CSM recipe
    trains the decoder on a random 1/16 of frames)."""
    bb, dec = cfg.backbone, cfg.decoder
    K = cfg.audio_num_codebooks
    B, S, _ = batch.tokens.shape

    x = embed_frames(params, cfg, batch.tokens, batch.mask)
    x = x.astype(params["projection"].dtype)
    h, _ = transformer_forward(
        params["backbone"], bb, x, jnp.zeros((B,), jnp.int32), None,
        precompute_rope(bb), valid_len=None, remat=remat,
    )

    is_audio = batch.mask[..., 0] & batch.loss_mask  # rows carrying audio codes

    # ---- codebook-0 loss: h[t] predicts row t+1's c0 where t+1 is audio
    c0_logits = h[:, :-1].astype(jnp.float32) @ params["codebook0_head"].astype(
        jnp.float32
    )
    c0_tgt = batch.tokens[:, 1:, 0]
    c0_w = is_audio[:, 1:].astype(jnp.float32)
    c0_xent = _softmax_xent(c0_logits, c0_tgt) * c0_w
    c0_loss = c0_xent.sum() / jnp.maximum(c0_w.sum(), 1.0)

    # ---- decoder loss on an amortized subset of audio rows: audio rows
    # rank first (by position, or by subset_r's random scores), then
    # take `decoder_frames` of them — fixed shapes either way
    n = decoder_frames
    pos = jnp.arange(S - 1)[None, :]
    if subset_r is None:
        rank_key = jnp.where(is_audio[:, 1:], pos, S + pos)
    else:
        # scores in [0,1); non-audio rows rank strictly after (≥ 2)
        rank_key = jnp.where(is_audio[:, 1:], subset_r, 2.0 + pos)
    sel = jnp.argsort(rank_key, axis=1)[:, :n]  # (B, n) indices into [0, S-1)
    sel_w = jnp.take_along_axis(is_audio[:, 1:], sel, axis=1).astype(jnp.float32)

    h_sel = jnp.take_along_axis(h[:, :-1], sel[..., None], axis=1)  # (B, n, D)
    tgt_codes = jnp.take_along_axis(
        batch.tokens[:, 1:, :K], sel[..., None], axis=1
    )  # (B, n, K)

    # teacher-forced decoder inputs: [proj(h), proj(embed(c0..c_{K-2}))]
    offs = jnp.arange(K - 1, dtype=jnp.int32) * cfg.audio_vocab_size
    emb = params["audio_embeddings"][tgt_codes[..., : K - 1] + offs]  # (B, n, K-1, D)
    dec_in = jnp.concatenate([h_sel[:, :, None, :], emb], axis=2)  # (B, n, K, D)
    dec_in = (dec_in @ params["projection"]).astype(params["projection"].dtype)
    dec_in = dec_in.reshape(B * n, K, dec.embed_dim)

    dh, _ = transformer_forward(
        params["decoder"], dec, dec_in, jnp.zeros((B * n,), jnp.int32), None,
        precompute_rope(dec, max_len=K),  # decoder positions are 0..K-1
    )
    dh = dh.reshape(B, n, K, dec.embed_dim)[:, :, 1:, :]  # positions 1..K-1

    ah = params["audio_head"].astype(jnp.float32)  # (K-1, Dd, V)
    dec_logits = jnp.einsum("bnkd,kdv->bnkv", dh.astype(jnp.float32), ah)
    dec_tgt = tgt_codes[..., 1:]  # codebooks 1..K-1
    dec_xent = _softmax_xent(dec_logits, dec_tgt)  # (B, n, K-1)
    dec_loss = (dec_xent * sel_w[..., None]).sum() / jnp.maximum(
        sel_w.sum() * (K - 1), 1.0
    )

    loss = c0_loss + dec_loss
    return loss, {"loss": loss, "c0_loss": c0_loss, "decoder_loss": dec_loss}
