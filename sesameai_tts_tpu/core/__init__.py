from sesameai_tts_tpu.core.config import (
    TransformerConfig,
    CSMConfig,
    SamplingConfig,
    FLAVORS,
    register_flavor,
    get_flavor,
)
