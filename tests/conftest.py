"""Test harness config: CPU JAX with 8 virtual devices for mesh/sharding
tests (SURVEY.md §4d). Must run before jax initializes a backend."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

# JAX's default matmul precision downcasts to bf16-grade on CPU; numerics
# tests need exact f32. (Production TPU code opts into bf16 via dtypes.)
jax.config.update("jax_default_matmul_precision", "highest")
