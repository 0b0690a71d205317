"""sesameai_tts_tpu — a TPU-native speech-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
CUDA/PyTorch CSM-1B runner (zenoran/sesameai-tts): dual-transformer
(Llama-3.2-1B backbone + 100M codebook decoder) autoregressive Mimi-RVQ
acoustic-token generation at 12.5 Hz, decoded to 24 kHz audio, with
watermarking, voice cloning via audio+transcript context prompts, a CLI,
and web apps.

Design stance (vs. reference /root/reference):
  * the text→PCM pipeline is a compiled on-device program — sampling,
    KV-cache feedback and EOS accounting live inside ``jax.lax.scan``
    (the reference round-trips to the host every frame,
    reference generator.py:180-203);
  * parallelism is expressed with ``jax.sharding`` over a Mesh, not
    translated NCCL calls (the reference has none — SURVEY.md §2.3);
  * the host runtime (tokenizer, audio I/O, resampling) has native C++
    implementations with pure-Python fallbacks.
"""

__version__ = "0.1.0"
