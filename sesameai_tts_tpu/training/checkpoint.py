"""TrainState checkpoint/resume (orbax) — step-numbered directories.

SURVEY.md §5 checkpoint/resume obligation, training side: params-only
round trips live in ``core/weights.py``; this module persists the FULL
``TrainState`` (params + optimizer state + step) so a resumed run
continues bit-for-bit where it stopped (momentum and schedule included
— restarting Adam from params alone silently changes the trajectory).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax.numpy as jnp

from sesameai_tts_tpu.core.weights import load_pytree, save_pytree
from sesameai_tts_tpu.training.train_step import TrainState

_STEP_DIR = re.compile(r"^step_(\d{8,})$")  # :08d widens past 8 digits


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    """Write ``ckpt_dir/step_XXXXXXXX``; returns the path."""
    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    save_pytree(path, state)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := _STEP_DIR.match(name))
    )
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{steps[-1]:08d}")


def restore_checkpoint(path: str, like: TrainState) -> TrainState:
    """Restore a TrainState; ``like`` supplies structure/shardings (build
    it with ``init_train_state`` / ``make_sharded_train_state`` so a
    restore onto a device mesh lands already sharded)."""
    restored = load_pytree(path, like)
    # orbax returns the same pytree type as the target (a TrainState);
    # normalize step to a jnp scalar for the donated-step train loop
    return TrainState(
        params=restored.params,
        opt_state=restored.opt_state,
        step=jnp.asarray(restored.step, jnp.int32),
    )
