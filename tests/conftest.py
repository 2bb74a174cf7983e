"""Test env: force CPU with 8 virtual devices so sharding/mesh tests run
without TPU hardware. Must run before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This environment defaults matmuls to bf16 inputs (TPU-style) even on CPU;
# parity tests need true f32 accumulation.
import jax

jax.config.update("jax_default_matmul_precision", "float32")

# persistent compile cache makes repeat test runs much faster
jax.config.update("jax_compilation_cache_dir", "/tmp/gitax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
