from sesameai_tts_tpu.watermark.api import (
    CSM_1B_GH_WATERMARK,
    CSM_1B_WATERMARK,
    load_watermarker,
    watermark,
    verify,
    check_audio_from_file,
)
