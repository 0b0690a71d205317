"""Quantization acceptance QA — the int8 quality gate, in code.

The flagship serving default is weight-only int8 trunks (runtime/
loader.py::csm_1b_spec).  The quality contract ("flip back to bf16 if
quantization visibly changes what the model says") previously lived as
a stderr string in bench.py; this module makes it executable (VERDICT
r4 #3): ``sesame-tts-smoke`` runs :func:`quant_acceptance` on real
weights and FAILS below the documented thresholds, and bench.py reports
the same numbers every round.

Two complementary measurements:

* **weight SNR** (:func:`trunk_weight_snr`) — the quantizer's own
  dequantization error over every trunk matrix, computed from the dense
  weights alone.  Catches weight distributions int8 per-channel can't
  represent (gate: min ≥ 35 dB; random and trained LLM weights both
  measure ~40 dB).
* **teacher-forced agreement** (:func:`teacher_forced_agreement`) —
  both param trees replay the SAME fixed trajectory and their per-step
  predictions + codebook0 logits are compared (models/csm.py::
  teacher_forced_eval).  Catches everything downstream of the weights:
  kernel bugs, scale mix-ups, corrupted tables.  Free-running streams
  are chaotic on random weights (a frame-0 argmax flip cascades — a
  measured 0.0 match rate in round 4), so the transferable number is
  the logit SNR (gate: ≥ 20 dB), with the per-code match rate
  informative only on trained weights whose argmax margins are
  decisive.

The reference has no analog — its quantization QA is listening to the
audio (it ships none; bitsandbytes/torchao appear unused in the ref).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# documented gates (docs/REAL_WEIGHTS.md): below either, serve bf16
MIN_WEIGHT_SNR_DB = 35.0
MIN_LOGIT_SNR_DB = 20.0


def trunk_weight_snr(dense_params: dict) -> Tuple[float, float]:
    """(min_db, median_db) of the quantizer's dequantization error over
    every trunk matrix of a DENSE (unquantized) CSM param tree.

    Measures exactly the error the deployed quantizer introduces (the
    same ``quantize_weight`` the loader applies), so it needs only the
    bf16 weights — no quantized twin.
    """
    import jax
    import jax.numpy as jnp

    from sesameai_tts_tpu.ops.quant import _TRUNK_QUANT_KEYS, quantize_weight

    def _leaf_snr(w):
        qw = quantize_weight(w)
        deq = qw["q"].astype(jnp.float32) * qw["scale"][..., None, :]
        wf = w.astype(jnp.float32)
        err = deq - wf
        return 10.0 * jnp.log10(
            jnp.sum(wf * wf) / jnp.maximum(jnp.sum(err * err), 1e-20)
        )

    snr_jit = jax.jit(_leaf_snr)
    snrs = []
    for trunk in ("backbone", "decoder"):
        layers = dense_params[trunk]["layers"]
        per_layer = layers if isinstance(layers, (list, tuple)) else [layers]
        for wl in per_layer:
            for k in _TRUNK_QUANT_KEYS:
                if k in wl and not isinstance(wl[k], dict):
                    snrs.append(float(snr_jit(wl[k])))
    if not snrs:
        raise ValueError("no dense trunk matrices found (already quantized?)")
    return float(min(snrs)), float(np.median(snrs))


def teacher_forced_agreement(
    gen_q,
    gen_ref,
    text: str,
    steps: int = 100,
    speaker: int = 1,
) -> dict:
    """Replay one fixed trajectory through both generators' param trees
    and compare their per-step predictions under IDENTICAL history.

    The teacher trajectory is ``gen_q``'s own greedy stream (its decode
    programs already exist; which twin supplies the trajectory doesn't
    matter — both are forced onto it).  ``steps`` is a fixed scan trip
    count so ONE cached program serves every run; trajectories shorter
    than ``steps`` (early EOS) evaluate over the real prefix.

    Returns ``code_match`` / ``frame_match`` (per-code / whole-frame
    greedy agreement), ``logit_snr_db`` (median per-step codebook0-logit
    SNR, the number that transfers to trained weights),
    ``self_consistency`` (gen_q's forced predictions must reproduce its
    own free-run trajectory — a canary that the teacher-forced program
    numerically matches production decode), and ``steps`` evaluated.
    """
    import jax
    import jax.numpy as jnp

    from sesameai_tts_tpu.models import csm as csm_model

    cfg = gen_q._cfg
    K = cfg.audio_num_codebooks
    traj = gen_q.generate_frames(
        text, speaker, [], max_audio_length_ms=(steps + 2) * 80.0,
        temperature=1.0, topk=1, seed=0,
    )
    if len(traj) < 2:
        raise ValueError(
            f"teacher trajectory too short ({len(traj)} frames) — "
            "use a longer text or raise max length"
        )
    n_real = min(steps, len(traj) - 1)
    teacher = np.zeros((steps, 1, K), np.int32)
    teacher[: min(steps, len(traj)), 0] = traj[:steps]
    teacher_dev = jnp.asarray(teacher)

    def _tf(gen):
        fn = jax.jit(
            lambda params, state, t: csm_model.teacher_forced_eval(
                params, cfg, state, t, rope_cs=gen._rope
            )
        )
        _, st, _, _ = gen._prefill_utterance(
            text, speaker, [], None, steps + 2, 1.0, 1,
            key=jax.random.PRNGKey(0),
        )
        fr_d, lg_d = fn(gen._params, st, teacher_dev)
        return (
            np.asarray(fr_d)[:n_real, 0],
            np.asarray(lg_d, dtype=np.float32)[:n_real, 0],
        )

    fr_q, lg_q = _tf(gen_q)
    fr_r, lg_r = _tf(gen_ref)
    err = lg_q - lg_r
    snr_steps = 10.0 * np.log10(
        np.sum(lg_r * lg_r, axis=1)
        / np.maximum(np.sum(err * err, axis=1), 1e-20)
    )
    return {
        "code_match": float((fr_q == fr_r).mean()),
        "frame_match": float((fr_q == fr_r).all(axis=1).mean()),
        "logit_snr_db": float(np.median(snr_steps)),
        "self_consistency": float((fr_q == traj[1 : n_real + 1]).mean()),
        "steps": int(n_real),
    }


def quant_acceptance(
    gen_q,
    gen_ref,
    text: str,
    steps: int = 100,
    min_weight_snr_db: float = MIN_WEIGHT_SNR_DB,
    min_logit_snr_db: float = MIN_LOGIT_SNR_DB,
    speaker: int = 1,
) -> dict:
    """The executable int8 gate: weight SNR from the dense twin's params
    + teacher-forced agreement between the twins.  ``passed`` is the
    smoke harness's exit-code input on real weights.
    """
    w_min, w_med = trunk_weight_snr(gen_ref._params)
    tf = teacher_forced_agreement(gen_q, gen_ref, text, steps, speaker)
    rep = {
        "weight_snr_min_db": round(w_min, 1),
        "weight_snr_median_db": round(w_med, 1),
        **{k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in tf.items()},
        "gate_weight_snr_db": min_weight_snr_db,
        "gate_logit_snr_db": min_logit_snr_db,
    }
    rep["passed"] = bool(
        w_min >= min_weight_snr_db and tf["logit_snr_db"] >= min_logit_snr_db
    )
    return rep
