"""sesameai_tts_tpu — a TPU-native speech-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
CUDA/PyTorch CSM-1B runner (zenoran/sesameai-tts): dual-transformer
(Llama-3.2-1B backbone + 100M codebook decoder) autoregressive Mimi-RVQ
acoustic-token generation at 12.5 Hz, decoded to 24 kHz audio, with
watermarking, voice cloning via audio+transcript context prompts, a CLI,
web apps, batched serving, and a training stack.

Design stance (vs. reference /root/reference):
  * the text→PCM pipeline is a compiled on-device program — sampling,
    KV-cache feedback and EOS accounting live inside ``jax.lax.scan``
    (the reference round-trips to the host every frame,
    reference generator.py:180-203);
  * parallelism is expressed with ``jax.sharding`` over a Mesh, not
    translated NCCL calls (the reference has none — SURVEY.md §2.3);
  * the host runtime (tokenizer, audio I/O, resampling) has native C++
    implementations with pure-Python fallbacks.

Top-level conveniences (lazy — importing the package stays cheap):

    from sesameai_tts_tpu import load_csm_1b, Segment, TTS
"""

__version__ = "0.1.0"

_LAZY = {
    "load_csm_1b": ("sesameai_tts_tpu.runtime.loader", "load_csm_1b"),
    "build_generator": ("sesameai_tts_tpu.runtime.loader", "build_generator"),
    "ModelSpec": ("sesameai_tts_tpu.runtime.loader", "ModelSpec"),
    "Generator": ("sesameai_tts_tpu.runtime.generator", "Generator"),
    "Segment": ("sesameai_tts_tpu.runtime.frames", "Segment"),
    "TTS": ("sesameai_tts_tpu.service.tts", "TTS"),
    "BatchedTTSServer": ("sesameai_tts_tpu.runtime.serving", "BatchedTTSServer"),
    "generate_streaming_audio": ("sesameai_tts_tpu.runtime.streaming", "generate_streaming_audio"),
    "AudioStreamWriter": ("sesameai_tts_tpu.runtime.streaming", "AudioStreamWriter"),
    "watermark": ("sesameai_tts_tpu.watermark.api", "watermark"),
    "verify": ("sesameai_tts_tpu.watermark.api", "verify"),
    "load_watermarker": ("sesameai_tts_tpu.watermark.api", "load_watermarker"),
    "CSM_1B_WATERMARK": ("sesameai_tts_tpu.watermark.api", "CSM_1B_WATERMARK"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'sesameai_tts_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
