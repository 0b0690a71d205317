"""Test harness config: CPU JAX with 8 virtual devices for mesh/sharding
tests (SURVEY.md §4d). Must run before jax initializes a backend."""

import os

# NOTE: this environment's experimental 'axon' TPU plugin ignores
# JAX_PLATFORMS; the legacy JAX_PLATFORM_NAME does force CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

# Env vars can be too late here (pytest plugins may import jax first);
# the config route still works because the backend initializes lazily.
jax.config.update("jax_platforms", "cpu")

# JAX's default matmul precision downcasts to bf16-grade on CPU; numerics
# tests need exact f32. (Production TPU code opts into bf16 via dtypes.)
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: XLA compiles dominate test time on small hosts
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
