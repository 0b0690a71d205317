from sesameai_tts_tpu.audio.io import read_wav, read_wav_mono, write_wav
from sesameai_tts_tpu.audio.resample import resample, resample_jax
from sesameai_tts_tpu.audio.segment import AudioClip
