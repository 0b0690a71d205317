from sesameai_tts_tpu.service.tts import TTS
from sesameai_tts_tpu.service.voices import load_registry
