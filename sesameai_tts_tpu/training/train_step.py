"""Sharded training step: optax + jit over a ('dp','tp') mesh.

Greenfield capability (the reference is inference-only, SURVEY.md §5):
data parallelism over 'dp', megatron-style tensor parallelism over 'tp'
via parameter shardings (parallel/mesh.py).  XLA inserts all
collectives; gradients reduce over 'dp' automatically because the batch
is 'dp'-sharded and the loss is a global mean.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sesameai_tts_tpu.core.config import CSMConfig
from sesameai_tts_tpu.parallel.mesh import (
    batch_sharding,
    csm_param_specs,
    shard_params,
)
from sesameai_tts_tpu.training.loss import Batch, csm_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    lr: float = 1e-4, weight_decay: float = 0.01, warmup: int = 100,
    total_steps: int = 10_000,
) -> optax.GradientTransformation:
    """``total_steps`` is the cosine horizon — pass the actual run length
    (the finetune CLI passes ``--steps``) or long runs flatline at the
    ``lr*0.1`` floor after the default 10k."""
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(total_steps, warmup + 1), end_value=lr * 0.1
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


def init_train_state(params: dict, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))


def _cast_floating(tree, dtype):
    """Cast floating leaves to ``dtype`` (ints — tokens, steps — pass)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        tree,
    )


def _subset_scores(step: jnp.ndarray, B: int, S: int, seed: int) -> jnp.ndarray:
    """(B, S-1) per-step uniform scores for the decoder-loss row subset.
    Derived from the step counter so every frame is eventually trained;
    computed on the FULL batch before any microbatch split so gradient
    accumulation selects the same rows as the unaccumulated step."""
    key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
    return jax.random.uniform(key, (B, S - 1))


def _apply_update(tx, state: TrainState, grads, metrics) -> Tuple[TrainState, dict]:
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return TrainState(params, opt_state, state.step + 1), metrics


def make_train_step(cfg: CSMConfig, tx: optax.GradientTransformation, decoder_frames: int = 4,
                    remat: bool = False, accum_steps: int = 1,
                    compute_dtype=None, subset_rng: bool = True,
                    subset_seed: int = 0):
    """→ jitted (state, batch) → (state, metrics). Donates state.

    ``remat=True`` rematerializes backbone layer activations in the
    backward pass (jax.checkpoint over the layer scan) — the standard
    memory/FLOPs trade for long sequences or big per-chip batches.

    ``accum_steps > 1`` splits the batch's leading axis into that many
    microbatches and scans the forward/backward over them, so peak
    activation memory is one microbatch's while the optimizer sees the
    full batch.  Gradients/metrics are the microbatch MEAN — identical
    to the unaccumulated step when microbatches carry equal loss-mask
    counts, the usual masked-mean approximation otherwise.

    ``compute_dtype=jnp.bfloat16`` with f32 params is the standard
    mixed-precision recipe: the forward/backward runs in bf16 (the cast
    is inside the differentiated function, so gradients land back in
    f32) while master params and Adam moments stay f32.

    ``subset_rng`` randomizes which audio rows carry the amortized
    decoder loss each step (see ``csm_loss``); ``False`` pins the
    first-N deterministic subset (exact-parity tests)."""

    def _grads(params, batch, subset_r):
        def loss_fn(p):
            if compute_dtype is not None:
                p = _cast_floating(p, compute_dtype)
            return csm_loss(p, cfg, batch, decoder_frames, remat=remat,
                            subset_r=subset_r)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Batch) -> Tuple[TrainState, dict]:
        B, S, _ = batch.tokens.shape
        subset_r = (
            _subset_scores(state.step, B, S, subset_seed) if subset_rng else None
        )
        metrics, grads = _accum_grads(
            _grads, state.params, batch, accum_steps, subset_r
        )
        return _apply_update(tx, state, grads, metrics)

    return train_step


def _accum_grads(grads_fn, params, batch: Batch, accum_steps: int,
                 subset_r=None):
    """Shared microbatch-accumulation core: ``grads_fn(params, batch,
    subset_r) → ((loss, metrics), grads)`` evaluated once
    (``accum_steps == 1``) or scanned over leading-axis microbatches with
    f32 gradient sums (bf16 sums across microbatches lose the
    low-magnitude tail).  ``subset_r`` splits along with the batch, so
    each example keeps the same decoder-loss row subset it would get
    unaccumulated."""
    if accum_steps == 1:
        (_, metrics), grads = grads_fn(params, batch, subset_r)
        return metrics, grads

    B = batch.tokens.shape[0]
    assert B % accum_steps == 0, (
        f"batch {B} not divisible by accum_steps {accum_steps}"
    )
    split = lambda x: x.reshape(accum_steps, B // accum_steps, *x.shape[1:])  # noqa: E731
    micro = jax.tree.map(split, batch)
    # scan xs must be arrays: a zero-width dummy stands in for None
    micro_r = split(subset_r) if subset_r is not None else jnp.zeros(
        (accum_steps, 0)
    )

    def body(carry, xs):
        mb, r = xs
        (_, metrics), grads = grads_fn(
            params, Batch(*mb), r if subset_r is not None else None
        )
        return (
            jax.tree.map(lambda a, g: a + g.astype(jnp.float32), carry[0], grads),
            jax.tree.map(jnp.add, carry[1], metrics),
        ), ()

    zeros_g = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    zeros_m = {k: jnp.float32(0.0) for k in ("loss", "c0_loss", "decoder_loss")}
    (gsum, msum), _ = jax.lax.scan(body, (zeros_g, zeros_m), (micro, micro_r))
    grads = jax.tree.map(
        lambda g, p: (g / accum_steps).astype(p.dtype), gsum, params
    )
    return {k: v / accum_steps for k, v in msum.items()}, grads


def make_lora_train_step(cfg: CSMConfig, tx: optax.GradientTransformation,
                         alpha: float = 16.0, decoder_frames: int = 4,
                         remat: bool = False, accum_steps: int = 1,
                         compute_dtype=None, subset_rng: bool = True,
                         subset_seed: int = 0):
    """→ jitted (state, base_params, batch) → (state, metrics).

    ``state.params`` is the LoRA adapter tree (training/lora.py); the
    frozen ``base_params`` are merged with the adapters INSIDE the step
    (one small matmul + add per target leaf, fused by XLA), so gradients
    flow only into the adapters and the optimizer state is ~1% of a full
    finetune's.  Donates the (tiny) state; never the base."""
    from sesameai_tts_tpu.training.lora import merge_lora

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, base_params: dict, batch: Batch
    ) -> Tuple[TrainState, dict]:
        def _grads(lora, b, subset_r):
            def loss_fn(l):
                merged = merge_lora(base_params, l, alpha)
                if compute_dtype is not None:
                    merged = _cast_floating(merged, compute_dtype)
                return csm_loss(merged, cfg, b, decoder_frames, remat=remat,
                                subset_r=subset_r)

            return jax.value_and_grad(loss_fn, has_aux=True)(lora)

        B, S, _ = batch.tokens.shape
        subset_r = (
            _subset_scores(state.step, B, S, subset_seed) if subset_rng else None
        )
        metrics, grads = _accum_grads(
            _grads, state.params, batch, accum_steps, subset_r
        )
        return _apply_update(tx, state, grads, metrics)

    return train_step


def make_eval_step(cfg: CSMConfig, decoder_frames: int = 4, compute_dtype=None):
    """→ jitted (params, batch) → metrics, no gradient/update."""

    @jax.jit
    def eval_step(params: dict, batch: Batch) -> dict:
        if compute_dtype is not None:
            params = _cast_floating(params, compute_dtype)
        _, metrics = csm_loss(params, cfg, batch, decoder_frames)
        return metrics

    return eval_step


def make_lora_eval_step(cfg: CSMConfig, alpha: float = 16.0,
                        decoder_frames: int = 4, compute_dtype=None):
    """→ jitted (lora, base_params, batch) → metrics; merges in-program
    (no merged-tree materialization outside the eval program)."""
    from sesameai_tts_tpu.training.lora import merge_lora

    @jax.jit
    def eval_step(lora: dict, base_params: dict, batch: Batch) -> dict:
        merged = merge_lora(base_params, lora, alpha)
        if compute_dtype is not None:
            merged = _cast_floating(merged, compute_dtype)
        _, metrics = csm_loss(merged, cfg, batch, decoder_frames)
        return metrics

    return eval_step


def make_sharded_train_state(
    key: jax.Array, cfg: CSMConfig, mesh, tx: optax.GradientTransformation, dtype=jnp.float32
) -> TrainState:
    """Init params already sharded over the mesh (tp rules) and build the
    optimizer state with matching shardings."""
    from sesameai_tts_tpu.models.csm import init_csm_params

    params = init_csm_params(key, cfg, dtype)
    params = shard_params(params, mesh, csm_param_specs())
    opt_state = tx.init(params)  # inherits param shardings leaf-wise
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))


def shard_batch(batch: Batch, mesh) -> Batch:
    sh = batch_sharding(mesh)
    return Batch(*(jax.device_put(x, sh) for x in batch))
