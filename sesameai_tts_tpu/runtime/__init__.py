from sesameai_tts_tpu.runtime.frames import Segment, FrameTokenizer
from sesameai_tts_tpu.runtime.generator import Generator
from sesameai_tts_tpu.runtime.loader import build_generator, load_csm_1b, ModelSpec
from sesameai_tts_tpu.runtime.context import RollingContext
