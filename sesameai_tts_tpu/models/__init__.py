from sesameai_tts_tpu.models.transformer import (
    init_transformer_params,
    transformer_forward,
    init_kv_cache,
    precompute_rope,
)
