"""Multi-chip **inference** sharding: TP/DP decode over a device mesh.

The reference has no distributed execution (SURVEY.md §2.3); this module
is the serving half of the greenfield scale-out story (the training half
is training/train_step.py):

* parameters shard megatron-style over the ``'tp'`` axis — the same
  rules as ``parallel/mesh.py::csm_param_specs`` but extended to the
  decode path's parameter layouts: **unstacked** per-layer trunks
  (models/transformer.py::unstack_trunk_params) and **int8-quantized**
  ``{"q","scale"}`` leaves (ops/quant.py);
* the batched backbone ``CSMState`` shards over ``'dp'`` on the batch
  axis, so a BatchedTTSServer slot pool spreads sessions across chips;
* the decode programs themselves (models/csm.py) are unchanged pure
  functions — committed sharded inputs propagate through ``jax.jit`` and
  XLA inserts every collective (psum over 'tp' partial matmul products,
  all-gathers at layout boundaries), per the scaling-book recipe.

Single-chip remains the default; pass ``mesh=`` to
``runtime.loader.build_generator`` to opt in.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sesameai_tts_tpu.models import csm as csm_model
from sesameai_tts_tpu.models.transformer import KVCache, is_unstacked
from sesameai_tts_tpu.ops.quant import is_quantized
from sesameai_tts_tpu.parallel.mesh import csm_param_specs, replicated


def _scale_spec(wspec: P) -> P:
    """Spec for a quant 'scale' leaf: the weight spec minus its
    second-to-last (in-features) axis — scale is (..., out)."""
    axes = tuple(wspec)
    if len(axes) < 2:
        return wspec
    return P(*axes[:-2], axes[-1])


def _leaf_specs(spec: P, leaf) -> object:
    """Match a weight spec to the actual leaf: quantized leaves are
    ``{"q","scale"}`` / ``{"q4","scale"}`` dicts.  int8 q keeps the weight
    layout; packed int4 leaves are REPLICATED — the nibble packing pairs
    row d with row d+D/2, which a row-shard would split across devices
    (int4 is the single-chip bandwidth play; use int8 with TP)."""
    if is_quantized(leaf):
        return {"q": spec, "scale": _scale_spec(spec)}
    if isinstance(leaf, dict) and "q4" in leaf:
        return {"q4": P(), "scale": P()}
    return spec


def _drop_lead(spec: P) -> P:
    """Stacked (L, ...) spec → per-layer (...) spec."""
    axes = tuple(spec)
    return P(*axes[1:]) if axes else spec


def infer_param_specs(params: dict) -> dict:
    """PartitionSpec tree matching ``params``' actual layout.

    Handles all four decode-path parameter layouts: stacked/unstacked ×
    bf16/int8-quantized.  Base rules come from
    ``parallel/mesh.py::csm_param_specs`` (single source of truth for
    which axes shard over 'tp').
    """
    base = csm_param_specs()
    out = {}
    for name, spec in base.items():
        if name not in ("backbone", "decoder"):
            out[name] = _leaf_specs(spec, params[name])
            continue
        trunk = params[name]
        layer_specs = base[name]["layers"]
        if is_unstacked(trunk):
            per_layer = tuple(
                {
                    k: _leaf_specs(_drop_lead(layer_specs[k]), wl[k])
                    for k in layer_specs
                }
                for wl in trunk["layers"]
            )
            out[name] = {"layers": per_layer, "final_norm": base[name]["final_norm"]}
        else:
            out[name] = {
                "layers": {
                    k: _leaf_specs(layer_specs[k], trunk["layers"][k])
                    for k in layer_specs
                },
                "final_norm": base[name]["final_norm"],
            }
    return out


def shard_csm_params(params: dict, mesh: Mesh) -> dict:
    """device_put every leaf with its inference sharding."""
    specs = infer_param_specs(params)

    def put(x, s):
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(
        put, params, specs, is_leaf=lambda x: isinstance(x, P)
    )


def state_sharding(mesh: Mesh, state: csm_model.CSMState):
    """Sharding tree for a batched CSMState: batch over 'dp', everything
    else replicated.  (KV heads are deliberately NOT 'tp'-sharded: the
    fused-qkv column sharding is not head-aligned, so XLA chooses the
    attention-local layout itself; pinning kv-heads would force an extra
    reshard per step.)"""

    # batch shards over 'dp' only when divisible (B=1 single-stream prefill
    # on a dp>1 mesh stays replicated; slot pools pick B as a multiple of dp)
    B = state.pos.shape[0]
    dp = mesh.shape.get("dp", 1)
    b_axis = "dp" if (dp > 1 and B % dp == 0) else None

    def cache_spec(a):
        # stacked: (L, B, KV, T, hd); unstacked per-layer: (B, KV, T, hd)
        return P(None, b_axis) if a.ndim == 5 else P(b_axis)

    k = jax.tree.map(lambda a: NamedSharding(mesh, cache_spec(a)), state.cache.k)
    v = jax.tree.map(lambda a: NamedSharding(mesh, cache_spec(a)), state.cache.v)
    return csm_model.CSMState(
        cache=KVCache(k=k, v=v), pos=NamedSharding(mesh, P(b_axis))
    )


def shard_state(state: csm_model.CSMState, mesh: Mesh) -> csm_model.CSMState:
    """Place a (fresh) CSMState on the mesh: batch over 'dp'.

    The batch size must be divisible by the 'dp' axis size (slot pools
    pick B as a multiple of dp; single-stream uses dp=1)."""
    return jax.device_put(state, state_sharding(mesh, state))


def shard_replicated(tree, mesh: Mesh):
    """Replicate a pytree (Mimi/watermark params) across the mesh."""
    return jax.device_put(tree, replicated(mesh))
