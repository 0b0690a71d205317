"""Device mesh + sharding policy.

The reference has no distributed execution at all (SURVEY.md §2.3) — this
module is the greenfield TPU scale-out path: a named ``Mesh`` over
('dp', 'tp') axes with ``NamedSharding`` rules for the CSM parameter
pytree.  XLA inserts the collectives (psum over 'tp' for partial matmul
results) — nothing here issues communication explicitly, per the
scaling-book recipe: pick a mesh, annotate shardings, let XLA do the
rest.

Sharding rules (megatron-style tensor parallelism):
  * attention: q/k/v projections column-sharded over 'tp' (heads split),
    output row-sharded → psum;
  * MLP: w1/w3 column-sharded, w2 row-sharded → psum;
  * embeddings + LM heads: vocab-sharded;
  * norms, small projections: replicated;
  * batch: sharded over 'dp'.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert dp * tp <= len(devices), f"need {dp*tp} devices, have {len(devices)}"
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def trunk_param_specs() -> dict:
    """PartitionSpecs for one transformer trunk (layer-stacked leaves)."""
    return {
        "layers": {
            "attn_norm": P(),
            # fused qkv/w13 column-shard over 'tp'; the post-matmul q|k|v and
            # w1|w3 slices cross shard boundaries, so XLA inserts reshards
            # there under TP — correct, slightly chattier than split weights
            # (single-chip, the primary serving mode, is unaffected)
            "qkv": P(None, None, "tp"),
            "o_proj": P(None, "tp", None),
            "mlp_norm": P(),
            "w13": P(None, None, "tp"),
            "w2": P(None, "tp", None),
        },
        "final_norm": P(),
    }


def csm_param_specs() -> dict:
    return {
        "backbone": trunk_param_specs(),
        "decoder": trunk_param_specs(),
        "text_embeddings": P("tp", None),
        "audio_embeddings": P("tp", None),
        "projection": P(),
        # audio vocab is 2051 (odd — not tp-divisible); the heads are small,
        # so replicate them rather than pad the vocab
        "codebook0_head": P(),
        "audio_head": P(),
    }


def shard_params(params: dict, mesh: Mesh, specs: Optional[dict] = None) -> dict:
    specs = specs or csm_param_specs()
    leaves, treedef = jax.tree.flatten(params)
    spec_leaves = jax.tree.flatten(specs, is_leaf=lambda x: isinstance(x, P))[0]
    assert len(leaves) == len(spec_leaves), "param/spec tree mismatch"
    out = [
        jax.device_put(x, NamedSharding(mesh, s)) for x, s in zip(leaves, spec_leaves)
    ]
    return jax.tree.unflatten(treedef, out)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
