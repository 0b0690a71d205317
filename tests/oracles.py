"""Independent torch/HF oracles for numerics tests.

``build_hf_llama`` loads our JAX trunk params into a HuggingFace
``LlamaModel`` — an independent implementation of the same llama3.2
architecture the reference uses via torchtune (reference
sesameai/models.py:10-39). HF uses rotate-half RoPE with permuted q/k
weights; we use the meta/interleaved convention, so exporting applies the
standard Meta→HF permutation.

``oracle_generate_frame`` recreates the reference's ``generate_frame``
semantics (reference models.py:132-184) in torch/numpy on top of two HF
trunks, greedy (topk=1), as the end-to-end CSM parity oracle.
"""

import numpy as np

from sesameai_tts_tpu.core.config import TransformerConfig


def build_hf_llama(params, cfg: TransformerConfig):
    import torch
    from transformers import LlamaConfig, LlamaModel

    hf_cfg = LlamaConfig(
        vocab_size=8,
        hidden_size=cfg.embed_dim,
        intermediate_size=cfg.intermediate_dim,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=max(cfg.max_seq_len, 4 * cfg.rope.old_context_len),
        rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope.base,
        rope_scaling={
            "rope_type": "llama3",
            "factor": float(cfg.rope.scale_factor),
            "low_freq_factor": cfg.rope.low_freq_factor,
            "high_freq_factor": cfg.rope.high_freq_factor,
            "original_max_position_embeddings": cfg.rope.old_context_len,
        },
        attention_bias=False,
        mlp_bias=False,
    )
    model = LlamaModel(hf_cfg)
    model.eval()

    def t(x):  # our (in, out) -> torch Linear (out, in)
        return torch.from_numpy(np.asarray(x, np.float32).T.copy())

    def permute(w, n_heads, dim_out, dim_in):
        # meta/interleaved -> HF rotate-half layout (HF conversion script)
        return (
            w.view(n_heads, dim_out // n_heads // 2, 2, dim_in)
            .transpose(1, 2)
            .reshape(dim_out, dim_in)
        )

    hd = cfg.head_dim
    H, KV, F = cfg.num_heads, cfg.num_kv_heads, cfg.intermediate_dim
    lp = params["layers"]
    with torch.no_grad():
        for i, layer in enumerate(model.layers):
            qkv = np.asarray(lp["qkv"][i], np.float32)  # fused (D, (H+2KV)hd)
            q_w, k_w, v_w = (
                qkv[:, : H * hd],
                qkv[:, H * hd : (H + KV) * hd],
                qkv[:, (H + KV) * hd :],
            )
            layer.self_attn.q_proj.weight.copy_(
                permute(t(q_w), H, H * hd, cfg.embed_dim)
            )
            layer.self_attn.k_proj.weight.copy_(
                permute(t(k_w), KV, KV * hd, cfg.embed_dim)
            )
            layer.self_attn.v_proj.weight.copy_(t(v_w))
            layer.self_attn.o_proj.weight.copy_(t(lp["o_proj"][i]))
            w13 = np.asarray(lp["w13"][i], np.float32)
            layer.mlp.gate_proj.weight.copy_(t(w13[:, :F]))
            layer.mlp.up_proj.weight.copy_(t(w13[:, F:]))
            layer.mlp.down_proj.weight.copy_(t(lp["w2"][i]))
            layer.input_layernorm.weight.copy_(
                torch.from_numpy(np.asarray(lp["attn_norm"][i], np.float32).copy())
            )
            layer.post_attention_layernorm.weight.copy_(
                torch.from_numpy(np.asarray(lp["mlp_norm"][i], np.float32).copy())
            )
        model.norm.weight.copy_(
            torch.from_numpy(np.asarray(params["final_norm"], np.float32).copy())
        )
    return model


def oracle_generate_frame(csm_params, cfg, tokens, tokens_mask):
    """Greedy reference-semantics frame generation in torch/numpy.

    tokens/tokens_mask: numpy (S, K+1). Returns (K,) int frame.
    """
    import torch

    K = cfg.audio_num_codebooks
    V = cfg.audio_vocab_size
    p = {k: np.asarray(v, np.float32) if not isinstance(v, dict) else v for k, v in csm_params.items()}
    audio_emb = np.asarray(csm_params["audio_embeddings"], np.float32)
    text_emb = np.asarray(csm_params["text_embeddings"], np.float32)
    proj = np.asarray(csm_params["projection"], np.float32)
    c0_head = np.asarray(csm_params["codebook0_head"], np.float32)
    audio_head = np.asarray(csm_params["audio_head"], np.float32)

    backbone = build_hf_llama(csm_params["backbone"], cfg.backbone)
    decoder = build_hf_llama(csm_params["decoder"], cfg.decoder)

    # embed frames: masked sum of K audio gathers + 1 text gather
    S = tokens.shape[0]
    embeds = np.zeros((S, K + 1, audio_emb.shape[1]), np.float32)
    for c in range(K):
        embeds[:, c] = audio_emb[tokens[:, c] + c * V]
    embeds[:, K] = text_emb[tokens[:, K]]
    h_in = (embeds * tokens_mask[:, :, None]).sum(axis=1)  # (S, D)

    with torch.no_grad():
        h = backbone(
            inputs_embeds=torch.from_numpy(h_in[None])
        ).last_hidden_state.numpy()[0]
    last_h = h[-1]

    c0 = int(np.argmax(last_h @ c0_head))
    frame = [c0]

    dec_inputs = [last_h @ proj, audio_emb[c0 + 0 * V] @ proj]
    for i in range(1, K):
        with torch.no_grad():
            dh = decoder(
                inputs_embeds=torch.from_numpy(np.stack(dec_inputs)[None].astype(np.float32))
            ).last_hidden_state.numpy()[0]
        ci = int(np.argmax(dh[-1] @ audio_head[i - 1]))
        frame.append(ci)
        dec_inputs.append(audio_emb[ci + i * V] @ proj)
    return np.array(frame)
