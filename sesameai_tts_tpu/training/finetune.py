"""Finetuning driver: dataset directory → trained CSM checkpoint.

Greenfield (the reference is inference-only; SURVEY.md §5). One CLI
closes the loop the inference stack already supports: record voice
clips, finetune the dual transformer on them, convert/serve the result.

    sesame-tts-finetune --data clips/ --flavor test-tiny --steps 50 \
        --ckpt-dir /ckpt/run1 --save-every 25

* dataset: ``metadata.json`` or ``.txt`` sidecars next to 24 kHz WAVs
  (``training/data.py::load_directory``);
* training dtype is f32 by default (``--dtype bf16`` opts into bf16
  params); the quantized serving forms are produced AFTER training by
  ``sesame-tts-convert`` / the loader's quantize step;
* ``--mesh dp,tp`` shards params/optimizer over the device mesh
  (megatron TP + data parallelism, ``parallel/mesh.py``); batches are
  dp-sharded; XLA inserts all collectives;
* checkpoints are full TrainStates (``training/checkpoint.py``):
  ``--resume`` continues bit-for-bit, optimizer momentum included. The
  final params also land in ``<ckpt-dir>/params`` — loadable directly
  via ``ModelSpec.csm_checkpoint``;
* ``--lora-rank N`` trains rank-N adapters over the trunk linears
  instead of the full model (training/lora.py — frozen base, ~1%
  optimizer state); the export is the MERGED dense weights, so serving
  is identical either way.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sesameai_tts_tpu.training import checkpoint as ckpt_lib
from sesameai_tts_tpu.training.data import (
    BatchLoader,
    LoaderConfig,
    load_directory,
    prefetch,
)
from sesameai_tts_tpu.training.loss import Batch
from sesameai_tts_tpu.training.train_step import (
    init_train_state,
    make_eval_step,
    make_lora_eval_step,
    make_lora_train_step,
    make_optimizer,
    make_sharded_train_state,
    make_train_step,
    shard_batch,
)


def build_frame_tokenizer(spec):
    """FrameTokenizer (text BPE + bucketed jitted Mimi encode) WITHOUT a
    Generator — training needs tokenization, not the decode programs."""
    from sesameai_tts_tpu.codec.mimi import Mimi
    from sesameai_tts_tpu.runtime.frames import (
        FrameTokenizer,
        pad_audio_to_frame_bucket,
    )
    from sesameai_tts_tpu.tokenizer import load_text_tokenizer

    mimi = Mimi(spec.mimi)
    # same PRNG stream as runtime/loader.py::build_generator — a
    # random-init (checkpoint-less) run must train against the SAME
    # codec the exported model will later be served with
    _, k_mimi = jax.random.split(jax.random.PRNGKey(spec.seed))
    if spec.mimi_checkpoint:
        from sesameai_tts_tpu.core.weights import load_pytree

        mimi_params = load_pytree(
            spec.mimi_checkpoint, like=mimi.init(k_mimi, spec.mimi_dtype)
        )
    else:
        mimi_params = mimi.init(k_mimi, spec.mimi_dtype)
    hop = mimi.cfg.hop_length
    encode = jax.jit(lambda p, wav: mimi.encode(p, wav)[0])

    def encode_audio(audio: np.ndarray) -> np.ndarray:
        wav, frames = pad_audio_to_frame_bucket(audio, hop)
        return np.asarray(encode(mimi_params, jnp.asarray(wav))[:, :frames])

    text_tok = load_text_tokenizer(spec.tokenizer)
    return FrameTokenizer(text_tok, encode_audio, spec.csm.audio_num_codebooks)


def _init_params(spec, dtype):
    from sesameai_tts_tpu.core.weights import load_csm_checkpoint
    from sesameai_tts_tpu.models.csm import init_csm_params

    if spec.csm_checkpoint:
        return load_csm_checkpoint(spec.csm_checkpoint, spec.csm, dtype)
    return init_csm_params(jax.random.PRNGKey(spec.seed), spec.csm, dtype)


def finetune(args) -> dict:
    """Run the loop; returns the last metrics dict (CLI + tests entry)."""
    from sesameai_tts_tpu.runtime.loader import csm_1b_spec, test_tiny_spec

    if args.resume and not args.ckpt_dir:
        raise SystemExit("--resume requires --ckpt-dir")

    if args.flavor == "test-tiny":
        spec = test_tiny_spec()
    else:
        spec = csm_1b_spec(
            csm_checkpoint=args.csm_checkpoint,
            mimi_checkpoint=args.mimi_checkpoint,
            tokenizer=args.tokenizer,
            quantize=None,  # training runs dense; quantize at serve time
        )

    # 'mixed' = f32 master params + Adam moments, bf16 forward/backward
    # (the cast happens inside the differentiated step)
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
             "mixed": jnp.float32}[args.dtype]
    compute_dtype = jnp.bfloat16 if args.dtype == "mixed" else None
    ftok = build_frame_tokenizer(spec)
    segments = load_directory(args.data, sample_rate=spec.mimi.sample_rate)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    # the in-jit rope gather CLAMPS positions past the table — rows
    # beyond max_seq_len would silently train on position-(max-1)
    # rotations (corrupted attention geometry, no error).  Buckets past
    # the model's capacity are definitionally useless: drop them (their
    # examples then fall to the loader's over-length handling) and only
    # die if nothing fits.
    max_pos = spec.csm.backbone.max_seq_len
    if max(buckets) > max_pos:
        kept = tuple(b for b in buckets if b <= max_pos)
        if not kept:
            raise SystemExit(
                f"every --buckets value exceeds the backbone's "
                f"max_seq_len {max_pos}"
            )
        print(
            f"buckets > max_seq_len {max_pos} dropped: "
            f"{[b for b in buckets if b > max_pos]} (over-length clips "
            f"are skipped with a count)",
            file=sys.stderr,
        )
        buckets = kept
    eval_segments: list = []
    if args.eval_frac > 0 and len(segments) > 1:
        # seeded split so --resume sees the same held-out set
        order = np.random.default_rng(args.seed).permutation(len(segments))
        n_eval = min(max(1, round(len(segments) * args.eval_frac)),
                     len(segments) - 1)
        eval_segments = [segments[i] for i in order[:n_eval]]
        segments = [segments[i] for i in order[n_eval:]]
    loader = BatchLoader(
        segments, ftok,
        LoaderConfig(batch_size=args.batch_size, buckets=buckets, seed=args.seed),
    )
    if loader.dropped:
        print(f"dropped {loader.dropped} over-length examples", file=sys.stderr)
    eval_loader = None
    if eval_segments:
        try:
            eval_loader = BatchLoader(
                eval_segments, ftok,
                LoaderConfig(batch_size=args.batch_size, buckets=buckets,
                             seed=args.seed, shuffle=False),
            )
        except ValueError:
            # every held-out clip exceeded the largest bucket — train on,
            # just without eval, rather than dying after tokenization
            print("eval split has no usable examples (all over-length); "
                  "eval disabled", file=sys.stderr)

    warmup = args.warmup
    if warmup >= args.steps:
        # the default --warmup 100 equals the default --steps 100: a run
        # that never leaves warmup trains at ~lr/2 and peaks on its last
        # update. Clamp (explicitly flagged values included) with a note.
        warmup = max(1, args.steps // 10)
        print(f"warmup {args.warmup} >= steps {args.steps}; clamped to "
              f"{warmup}", file=sys.stderr)
    tx = make_optimizer(args.lr, args.weight_decay, warmup,
                        total_steps=args.steps)
    mesh = None
    base_params = None  # frozen base in LoRA mode
    if args.mesh:
        from sesameai_tts_tpu.parallel.mesh import make_mesh

        dp, tp = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(dp=dp, tp=tp)
        if args.lora_rank:
            from sesameai_tts_tpu.parallel.mesh import csm_param_specs, shard_params

            base_params = shard_params(
                _init_params(spec, dtype), mesh, csm_param_specs()
            )
        else:
            if spec.csm_checkpoint:
                # reject BEFORE the (minutes-long on this platform)
                # sharded init/compile
                raise SystemExit(
                    "--mesh with --csm-checkpoint: convert the checkpoint to "
                    "orbax and restore into the sharded state via --resume "
                    "(or use --lora-rank, which loads the base directly)"
                )
            state = make_sharded_train_state(
                jax.random.PRNGKey(spec.seed), spec.csm, mesh, tx, dtype
            )
    elif args.lora_rank:
        base_params = _init_params(spec, dtype)
    else:
        state = init_train_state(_init_params(spec, dtype), tx)

    if args.lora_rank:
        from sesameai_tts_tpu.training.lora import init_lora_params

        # adapters replicate over the mesh (tiny); base shardings flow
        # through the in-step merge
        lora = init_lora_params(
            jax.random.PRNGKey(args.seed + 1), base_params, args.lora_rank,
            tuple(args.lora_targets.split(",")), dtype,
        )
        state = init_train_state(lora, tx)

    if args.resume:
        path = ckpt_lib.latest_checkpoint(args.ckpt_dir)
        if path:
            state = ckpt_lib.restore_checkpoint(path, state)
            print(f"resumed from {path} (step {int(state.step)})", file=sys.stderr)
        else:
            # the user EXPLICITLY asked to resume: silently retraining
            # from scratch for hours (then overwriting the dir they
            # thought held their run) is the worst possible outcome
            raise SystemExit(
                f"--resume: no checkpoint found in {args.ckpt_dir!r}; "
                f"drop --resume to start fresh, or fix --ckpt-dir"
            )

    if args.lora_rank:
        lora_step = make_lora_train_step(
            spec.csm, tx, alpha=args.lora_alpha,
            decoder_frames=args.decoder_frames,
            remat=args.remat, accum_steps=args.accum_steps,
            compute_dtype=compute_dtype, subset_seed=args.seed,
        )
        step_fn = lambda s, b: lora_step(s, base_params, b)  # noqa: E731
    else:
        step_fn = make_train_step(
            spec.csm, tx, decoder_frames=args.decoder_frames,
            remat=args.remat, accum_steps=args.accum_steps,
            compute_dtype=compute_dtype, subset_seed=args.seed,
        )

    def epochs():
        while True:
            yield from loader

    def _to_device(b: Batch) -> Batch:
        return shard_batch(b, mesh) if mesh is not None else Batch(
            *(jnp.asarray(x) for x in b)
        )

    eval_fn = None
    if eval_loader is not None:
        if args.lora_rank:
            lora_eval = make_lora_eval_step(
                spec.csm, alpha=args.lora_alpha,
                decoder_frames=args.decoder_frames,
                compute_dtype=compute_dtype,
            )
            eval_fn = lambda s, b: lora_eval(s.params, base_params, b)  # noqa: E731
        else:
            dense_eval = make_eval_step(spec.csm, args.decoder_frames,
                                        compute_dtype=compute_dtype)
            eval_fn = lambda s, b: dense_eval(s.params, b)  # noqa: E731

    def evaluate(state) -> float:
        """Held-out loss: deterministic (unshuffled loader, fixed tail
        repetition, first-N decoder subset) so identical params yield
        identical eval_loss. Batches pool weighted by their AUDIO row
        count — the per-batch loss normalizes per audio row, so text-row
        counts must not skew the cross-batch mean. A repetition-padded
        tail batch still counts its repeats; the bias is fixed across
        calls and shrinks as the held-out set grows past one batch."""
        tot = w = 0.0
        for b in eval_loader:
            rows = float(np.asarray(b.mask[..., 0] & b.loss_mask).sum())
            m = eval_fn(state, _to_device(b))
            tot += float(m["loss"]) * rows
            w += rows
        return tot / max(w, 1.0)

    metrics = {}
    t0 = time.time()
    start = int(state.step)
    last_saved_step = -1
    for batch in prefetch(epochs(), depth=2):
        if int(state.step) >= args.steps:
            break
        state, metrics = step_fn(state, _to_device(batch))
        step = int(state.step)  # host sync once per step: also fetches loss
        if step % args.log_every == 0 or step == args.steps:
            rate = (step - start) / max(time.time() - t0, 1e-9)
            print(
                f"step {step}/{args.steps} loss {float(metrics['loss']):.4f} "
                f"(c0 {float(metrics['c0_loss']):.4f} dec "
                f"{float(metrics['decoder_loss']):.4f}) {rate:.2f} steps/s",
                file=sys.stderr,
            )
        if eval_fn and args.eval_every and step % args.eval_every == 0:
            print(f"step {step} eval_loss {evaluate(state):.4f}", file=sys.stderr)
        if args.ckpt_dir and step % args.save_every == 0:
            ckpt_lib.save_checkpoint(args.ckpt_dir, state)
            last_saved_step = step
    if eval_fn is not None:
        metrics = dict(metrics)
        metrics["eval_loss"] = evaluate(state)
        print(f"final eval_loss {metrics['eval_loss']:.4f}", file=sys.stderr)
    if args.ckpt_dir:
        if last_saved_step != int(state.step):
            # skip when the loop's periodic save already wrote this step —
            # a csm-1b TrainState is ~12 GB rewritten for nothing otherwise
            ckpt_lib.save_checkpoint(args.ckpt_dir, state)
        # params-only export ALWAYS runs (it is the servable artifact),
        # loadable as ModelSpec.csm_checkpoint; in LoRA mode the adapters
        # are merged into the dense weights so the export serves exactly
        # like a full finetune's
        from sesameai_tts_tpu.core.weights import save_pytree
        import os

        export = state.params
        if args.lora_rank:
            from sesameai_tts_tpu.training.lora import merge_lora

            export = jax.jit(
                lambda b, l: merge_lora(b, l, args.lora_alpha)
            )(base_params, state.params)
        save_pytree(os.path.join(args.ckpt_dir, "params"), export)
    return {k: float(v) for k, v in metrics.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data", required=True, help="dataset dir (wav + txt/metadata.json)")
    p.add_argument("--flavor", default="csm-1b", choices=["csm-1b", "test-tiny"])
    p.add_argument("--csm-checkpoint", default=None)
    p.add_argument("--mimi-checkpoint", default=None)
    p.add_argument("--tokenizer", default=None,
                   help="default: auto-inferred from the checkpoint dir's "
                        "tokenizer.json, else 'byte'")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--buckets", default="64,128,256,512,1024,2048")
    p.add_argument("--eval-frac", type=float, default=0.0,
                   help=">0 holds out that fraction of clips (seeded split) "
                        "and reports eval_loss")
    p.add_argument("--eval-every", type=int, default=0,
                   help="eval cadence in steps (0 = only at the end)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--decoder-frames", type=int, default=4)
    p.add_argument("--lora-rank", type=int, default=0,
                   help="0 = full finetune; >0 trains rank-r LoRA adapters "
                        "over --lora-targets and exports merged params")
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--lora-targets", default="qkv,o_proj,w13,w2")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16", "mixed"],
                   help="mixed = f32 params/optimizer, bf16 compute")
    p.add_argument("--mesh", default=None, help="dp,tp (e.g. 4,2)")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    metrics = finetune(args)
    print(f"final: {metrics}")
    return metrics


if __name__ == "__main__":
    main()
