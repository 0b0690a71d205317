"""Regenerate the golden witness (tests/test_golden.py) after an
INTENTIONAL numerics change.  Must run under the exact test config
(CPU backend, matmul precision "highest" — mirrors tests/conftest.py):

    PYTHONPATH="$PYTHONPATH:/root/repo" python tests/golden/regen.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# mirror conftest's 8-virtual-device CPU client exactly: the golden must
# be produced by the same XLA client configuration the suite verifies
# it under
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

from sesameai_tts_tpu.runtime.loader import test_tiny_spec  # noqa: E402
from sesameai_tts_tpu.service.tts import TTS  # noqa: E402

tts = TTS(spec=test_tiny_spec(), enable_watermark=False)
tts.load_model()
tts.export_wav(
    "The quick brown fox jumps over the lazy dog.",
    os.path.join(os.path.dirname(__file__), "tiny_seed123.wav"),
    seed=123,
)
