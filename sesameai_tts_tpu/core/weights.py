"""Checkpoint loading: torch/safetensors checkpoints → JAX pytrees.

The reference "checkpoints" are pretrained weights pulled from the HF
hub at runtime (reference models.py:99-105 ``PyTorchModelHubMixin``,
generator.py:338 ``Model.from_pretrained("sesame/csm-1b")``; Mimi via
``hf_hub_download`` generator.py:52). This framework loads from **local
files only** (no-egress environments are the norm for TPU pods):

* ``load_csm_checkpoint(path)`` — maps the torchtune-layout CSM
  state_dict (``backbone.layers.N.attn.q_proj.weight`` …) onto our
  layer-stacked pytree. Linear weights transpose (torch stores
  (out, in); we store (in, out)); q/k stay in the meta/interleaved RoPE
  convention torchtune checkpoints already use.
* ``load_mimi_checkpoint(path)`` — maps moshi's Mimi state_dict onto
  codec/mimi.py's pytree.
* orbax round-trip for converted (sharded) pytrees, so conversion runs
  once and serving loads the native format.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sesameai_tts_tpu.core.config import CSMConfig, TransformerConfig


def _strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize key prefixes real checkpoints carry: ``model.`` (hub
    mixin wrappers) and ``_orig_mod.`` (torch.compile'd modules)."""
    for prefix in ("model.", "_orig_mod."):
        if sd and all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}
    return {k.replace("._orig_mod.", "."): v for k, v in sd.items()}


def _read_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .safetensors or torch .pt/.ckpt file into numpy arrays.

    Accepts a model DIRECTORY too (picks model.safetensors / *.safetensors
    / ckpt.pt — the published sesame/csm-1b repo layout)."""
    if os.path.isdir(path):
        for name in ("model.safetensors", "ckpt.pt", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            import glob

            st = sorted(glob.glob(os.path.join(path, "*.safetensors")))
            if not st:
                raise FileNotFoundError(f"no checkpoint file found in {path}")
            if len(st) > 1:
                # HF-style sharded export (model-00001-of-0000N...): merge
                # every shard — loading only the first silently dropped
                # the layers living in later shards
                merged: Dict[str, np.ndarray] = {}
                for shard in st:
                    merged.update(_read_state_dict(shard))
                return merged
            path = st[0]
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return _strip_prefixes(load_file(path))
        except Exception:
            # bf16 tensors have no numpy dtype — go through torch
            from safetensors.torch import load_file as load_torch

            return _strip_prefixes(
                {k: v.float().numpy() for k, v in load_torch(path).items()}
            )
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return _strip_prefixes({k: v.float().numpy() for k, v in sd.items()})


def _stack_trunk(
    sd: Dict[str, np.ndarray], prefix: str, cfg: TransformerConfig, dtype
) -> dict:
    """torchtune llama3_2 trunk state_dict → layer-stacked pytree."""
    L = cfg.num_layers

    def t(name, i):  # transpose Linear to (in, out)
        return sd[f"{prefix}.layers.{i}.{name}.weight"].T

    def n(name, i):
        return sd[f"{prefix}.layers.{i}.{name}.scale"]

    # q/k/v and w1/w3 fuse into single matmuls in our layout
    layers = {
        "qkv": np.stack(
            [
                np.concatenate(
                    [t("attn.q_proj", i), t("attn.k_proj", i), t("attn.v_proj", i)],
                    axis=1,
                )
                for i in range(L)
            ]
        ),
        "o_proj": np.stack([t("attn.output_proj", i) for i in range(L)]),
        "w13": np.stack(
            [np.concatenate([t("mlp.w1", i), t("mlp.w3", i)], axis=1) for i in range(L)]
        ),
        "w2": np.stack([t("mlp.w2", i) for i in range(L)]),
        "attn_norm": np.stack([n("sa_norm", i) for i in range(L)]),
        "mlp_norm": np.stack([n("mlp_norm", i) for i in range(L)]),
    }
    return {
        "layers": {k: jnp.asarray(v, dtype) for k, v in layers.items()},
        "final_norm": jnp.asarray(sd[f"{prefix}.norm.scale"], dtype),
    }


def _expect_shape(arr, shape: tuple, name: str, dtype) -> jnp.ndarray:
    """Load a checkpoint tensor, failing loudly on a layout mismatch."""
    if tuple(arr.shape) != tuple(shape):
        raise ValueError(
            f"{name}: checkpoint shape {tuple(arr.shape)} != expected "
            f"{tuple(shape)} (wrong layout or incompatible config)"
        )
    return jnp.asarray(arr, dtype)


def _is_orbax_dir(path: str) -> bool:
    """An orbax pytree dir (what ``save_pytree`` / the finetune CLI's
    ``<ckpt-dir>/params`` export writes), vs a hub-style weights dir."""
    return os.path.isdir(path) and any(
        os.path.exists(os.path.join(path, marker))
        for marker in ("_CHECKPOINT_METADATA", "_METADATA", "manifest.ocdbt", "d")
    )


def load_csm_checkpoint(path: str, cfg: CSMConfig, dtype=jnp.bfloat16) -> dict:
    """sesame/csm-1b torch checkpoint → CSM params pytree.

    Also accepts a native orbax params dir (a ``save_pytree`` export,
    e.g. the finetune CLI's ``<ckpt-dir>/params``) — the pytree is
    already in this framework's layout, so it restores directly."""
    if _is_orbax_dir(path):
        tree = load_pytree(path)
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)
    sd = _read_state_dict(path)
    return {
        "backbone": _stack_trunk(sd, "backbone", cfg.backbone, dtype),
        "decoder": _stack_trunk(sd, "decoder", cfg.decoder, dtype),
        "text_embeddings": jnp.asarray(sd["text_embeddings.weight"], dtype),
        "audio_embeddings": jnp.asarray(sd["audio_embeddings.weight"], dtype),
        "projection": jnp.asarray(sd["projection.weight"].T, dtype),
        "codebook0_head": jnp.asarray(sd["codebook0_head.weight"].T, dtype),
        "audio_head": jnp.asarray(sd["audio_head"], dtype),
    }


def save_csm_checkpoint(path: str, params: dict) -> None:
    """Inverse of load_csm_checkpoint (testing + export)."""
    from safetensors.numpy import save_file

    sd: Dict[str, np.ndarray] = {}
    # NOTE: values must be C-contiguous — np.asarray on a JAX array can be
    # an F-order view (XLA may choose column-major output layouts, and the
    # persistent compile cache makes that nondeterministic across runs);
    # safetensors serializes raw bytes assuming C-order, silently
    # transposing the data otherwise.

    def unstack(prefix, trunk, hd, H, KV, F):
        lp = trunk["layers"]
        L = lp["qkv"].shape[0]
        for i in range(L):
            qkv = np.asarray(lp["qkv"][i], np.float32)
            sd[f"{prefix}.layers.{i}.attn.q_proj.weight"] = qkv[:, : H * hd].T.copy()
            sd[f"{prefix}.layers.{i}.attn.k_proj.weight"] = qkv[
                :, H * hd : (H + KV) * hd
            ].T.copy()
            sd[f"{prefix}.layers.{i}.attn.v_proj.weight"] = qkv[:, (H + KV) * hd :].T.copy()
            sd[f"{prefix}.layers.{i}.attn.output_proj.weight"] = np.asarray(
                lp["o_proj"][i], np.float32
            ).T.copy()
            w13 = np.asarray(lp["w13"][i], np.float32)
            sd[f"{prefix}.layers.{i}.mlp.w1.weight"] = w13[:, :F].T.copy()
            sd[f"{prefix}.layers.{i}.mlp.w3.weight"] = w13[:, F:].T.copy()
            sd[f"{prefix}.layers.{i}.mlp.w2.weight"] = np.asarray(
                lp["w2"][i], np.float32
            ).T.copy()
            sd[f"{prefix}.layers.{i}.sa_norm.scale"] = np.ascontiguousarray(
                np.asarray(lp["attn_norm"][i], np.float32)
            )
            sd[f"{prefix}.layers.{i}.mlp_norm.scale"] = np.ascontiguousarray(
                np.asarray(lp["mlp_norm"][i], np.float32)
            )
        sd[f"{prefix}.norm.scale"] = np.ascontiguousarray(
            np.asarray(trunk["final_norm"], np.float32)
        )

    for prefix, trunk in (("backbone", params["backbone"]), ("decoder", params["decoder"])):
        F = trunk["layers"]["w2"].shape[1]
        tot = trunk["layers"]["qkv"].shape[2]
        h_hd = trunk["layers"]["o_proj"].shape[1]  # H·hd
        kv_hd = (tot - h_hd) // 2  # KV·hd
        # pass hd=1 with H·hd / KV·hd — the slices only use the products
        unstack(prefix, trunk, 1, h_hd, kv_hd, F)
    sd["text_embeddings.weight"] = np.ascontiguousarray(np.asarray(params["text_embeddings"], np.float32))
    sd["audio_embeddings.weight"] = np.ascontiguousarray(np.asarray(params["audio_embeddings"], np.float32))
    sd["projection.weight"] = np.asarray(params["projection"], np.float32).T.copy()
    sd["codebook0_head.weight"] = np.asarray(params["codebook0_head"], np.float32).T.copy()
    sd["audio_head"] = np.ascontiguousarray(np.asarray(params["audio_head"], np.float32))
    save_file(sd, path)


# ---------------------------------------------------------------------------
# Mimi (moshi) checkpoint conversion
# ---------------------------------------------------------------------------


def _hf_mimi_to_moshi_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """transformers MimiModel naming → moshi naming (the layout the
    mapping below consumes).  Both exist in the wild: kyutai publishes
    moshi-layout weights, HF hub hosts the transformers port — this
    loader accepts either.  The remap is validated numerically by
    tests/test_mimi_oracle.py (codes bit-exact vs torch MimiModel)."""
    out: Dict[str, np.ndarray] = {}

    def _count_layers(side: str) -> int:
        # per side: a decode-only export has no encoder_transformer keys,
        # and sharing one count would silently skip the other side's remap
        return max(
            (int(k.split(".")[2]) + 1 for k in sd
             if k.startswith(f"{side}.layers.")),
            default=0,
        )
    for k, v in sd.items():
        for side in ("encoder", "decoder"):
            if k.startswith(f"{side}.layers."):
                rest = k[len(f"{side}.layers."):]
                idx, sub = rest.split(".", 1)
                if sub.startswith("block."):
                    j, tail = sub[len("block."):].split(".", 1)
                    out[f"{side}.model.{idx}.block.{j}.conv.{tail}"] = v
                else:
                    out[f"{side}.model.{idx}.conv.{sub}"] = v
    for side in ("encoder_transformer", "decoder_transformer"):
        for i in range(_count_layers(side)):
            p, o = f"{side}.layers.{i}", f"{side}.transformer.layers.{i}"
            out[f"{o}.self_attn.in_proj_weight"] = np.concatenate(
                [sd[f"{p}.self_attn.q_proj.weight"],
                 sd[f"{p}.self_attn.k_proj.weight"],
                 sd[f"{p}.self_attn.v_proj.weight"]], 0
            )
            out[f"{o}.self_attn.out_proj.weight"] = sd[f"{p}.self_attn.o_proj.weight"]
            out[f"{o}.norm1.weight"] = sd[f"{p}.input_layernorm.weight"]
            out[f"{o}.norm1.bias"] = sd[f"{p}.input_layernorm.bias"]
            out[f"{o}.norm2.weight"] = sd[f"{p}.post_attention_layernorm.weight"]
            out[f"{o}.norm2.bias"] = sd[f"{p}.post_attention_layernorm.bias"]
            out[f"{o}.linear1.weight"] = sd[f"{p}.mlp.fc1.weight"]
            out[f"{o}.linear2.weight"] = sd[f"{p}.mlp.fc2.weight"]
            out[f"{o}.layer_scale_1.scale"] = sd[f"{p}.self_attn_layer_scale.scale"]
            out[f"{o}.layer_scale_2.scale"] = sd[f"{p}.mlp_layer_scale.scale"]
    out["downsample.conv.conv.weight"] = sd["downsample.conv.weight"]
    out["upsample.convtr.convtr.weight"] = sd["upsample.conv.weight"]
    for hf, mo in (("semantic_residual_vector_quantizer", "rvq_first"),
                   ("acoustic_residual_vector_quantizer", "rvq_rest")):
        out[f"quantizer.{mo}.input_proj.weight"] = sd[f"quantizer.{hf}.input_proj.weight"]
        out[f"quantizer.{mo}.output_proj.weight"] = sd[f"quantizer.{hf}.output_proj.weight"]
        n = sum(1 for k in sd
                if k.startswith(f"quantizer.{hf}.layers.") and k.endswith("embed_sum"))
        for i in range(n):
            base = f"quantizer.{hf}.layers.{i}.codebook"
            out[f"quantizer.{mo}.vq.layers.{i}._codebook.embedding_sum"] = sd[f"{base}.embed_sum"]
            out[f"quantizer.{mo}.vq.layers.{i}._codebook.cluster_usage"] = sd[f"{base}.cluster_usage"]
    return out


def load_mimi_checkpoint(path: str, mimi, dtype=jnp.float32) -> dict:
    """Mimi state_dict (moshi OR transformers layout, auto-detected) →
    codec/mimi.py pytree.  The mapping + topology are oracle-verified:
    encode codes match torch MimiModel bit-exactly and decode PCM to
    ~1e-5 relative on converted weights (tests/test_mimi_oracle.py);
    structure/shape mismatches raise loudly.

    Mapping strategy:
      * SEANet conv stacks: the checkpoint's ``encoder.model.*`` /
        ``decoder.model.*`` conv weights, ordered by their sequential
        index, zip 1:1 with our spec traversal order (same topology);
      * transformers: ``{enc,dec}oder_transformer.layers.N.*`` →
        layer-stacked pytree (packed qkv transposed to (in, out));
      * quantizer: ``quantizer.rvq_{first,rest}.*`` input/output 1×1
        projections + per-stage codebooks.
    """
    import re

    sd = _read_state_dict(path)
    if any(k.startswith("encoder.layers.") for k in sd):
        sd = _hf_mimi_to_moshi_keys(sd)  # transformers MimiModel layout

    def seanet_params(prefix: str, module) -> list:
        # collect conv/convtr weights in sequential-index order
        pat = re.compile(rf"{prefix}\.model\.(\d+)\.(.*)")
        by_idx: Dict[int, Dict[str, np.ndarray]] = {}
        for k, v in sd.items():
            m = pat.match(k)
            if m:
                by_idx.setdefault(int(m.group(1)), {})[m.group(2)] = v
        ordered = [by_idx[i] for i in sorted(by_idx)]

        params = []
        oi = 0
        for spec in module.specs:
            if spec[0] in ("conv", "convtr"):
                entry = ordered[oi]
                oi += 1
                w = next(v for k, v in entry.items() if k.endswith("weight"))
                p = {"w": jnp.asarray(w, dtype)}
                bias = [v for k, v in entry.items() if k.endswith("bias")]
                if bias:
                    p["b"] = jnp.asarray(bias[0], dtype)
                params.append(p)
            elif spec[0] == "res":
                entry = ordered[oi]
                oi += 1
                # residual block layout [ELU, conv, ELU, conv] → conv weights
                # live at sequential indices 1 and 3 (raise loudly if absent)
                sub = []
                for j in range(len(spec[1])):
                    w = entry[f"block.{2*j+1}.conv.conv.weight"]
                    p = {"w": jnp.asarray(w, dtype)}
                    bias_key = f"block.{2*j+1}.conv.conv.bias"
                    if bias_key in entry:
                        p["b"] = jnp.asarray(entry[bias_key], dtype)
                    sub.append(p)
                params.append(sub)
            else:
                params.append(None)
        return params

    def transformer_params(prefix: str) -> dict:
        L = mimi.cfg.transformer.num_layers
        def g(i, name):
            return sd[f"{prefix}.layers.{i}.{name}"]

        layers = {
            "norm1_w": np.stack([g(i, "norm1.weight") for i in range(L)]),
            "norm1_b": np.stack([g(i, "norm1.bias") for i in range(L)]),
            "qkv": np.stack(
                [g(i, "self_attn.in_proj_weight").T for i in range(L)]
            ),
            "out": np.stack(
                [g(i, "self_attn.out_proj.weight").T for i in range(L)]
            ),
            "norm2_w": np.stack([g(i, "norm2.weight") for i in range(L)]),
            "norm2_b": np.stack([g(i, "norm2.bias") for i in range(L)]),
            "lin1": np.stack([g(i, "linear1.weight").T for i in range(L)]),
            "lin2": np.stack([g(i, "linear2.weight").T for i in range(L)]),
            "ls1": np.stack([g(i, "layer_scale_1.scale") for i in range(L)]),
            "ls2": np.stack([g(i, "layer_scale_2.scale") for i in range(L)]),
        }
        return {"layers": {k: jnp.asarray(v, dtype) for k, v in layers.items()}}

    def rvq_params(prefix: str, n_q: int) -> dict:
        cbs = np.stack(
            [
                sd[f"{prefix}.vq.layers.{i}._codebook.embedding"]
                if f"{prefix}.vq.layers.{i}._codebook.embedding" in sd
                else sd[f"{prefix}.vq.layers.{i}._codebook.embedding_sum"]
                / np.maximum(
                    sd[f"{prefix}.vq.layers.{i}._codebook.cluster_usage"][:, None], 1e-5
                )
                for i in range(n_q)
            ]
        )
        return {
            "input_proj": jnp.asarray(sd[f"{prefix}.input_proj.weight"][:, :, 0].T, dtype),
            "output_proj": jnp.asarray(sd[f"{prefix}.output_proj.weight"][:, :, 0].T, dtype),
            "codebooks": jnp.asarray(cbs, dtype),
        }

    rvq = mimi.cfg.rvq
    return {
        "encoder": seanet_params("encoder", mimi.encoder),
        "decoder": seanet_params("decoder", mimi.decoder),
        "encoder_transformer": transformer_params("encoder_transformer.transformer"),
        "decoder_transformer": transformer_params("decoder_transformer.transformer"),
        "downsample": {"w": jnp.asarray(sd["downsample.conv.conv.weight"], dtype)},
        # channel-wise (groups=dimension) upsample: real checkpoints ship
        # (d, 1, 2s) — validate rather than silently loading a wrong
        # layout into the grouped transposed conv
        "upsample": {"w": _expect_shape(
            sd["upsample.convtr.convtr.weight"],
            (mimi.upsample.in_channels,
             mimi.upsample.out_channels // mimi.upsample.groups,
             mimi.upsample.kernel_size),
            "upsample.convtr.convtr.weight", dtype,
        )},
        "quantizer": {
            "semantic": rvq_params("quantizer.rvq_first", rvq.n_q_semantic),
            "acoustic": rvq_params("quantizer.rvq_rest", rvq.n_q_acoustic),
        },
    }


# ---------------------------------------------------------------------------
# orbax round-trip for converted pytrees
# ---------------------------------------------------------------------------


def save_pytree(path: str, params: dict) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like: Optional[dict] = None) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))
