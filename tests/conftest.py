"""Test env: force CPU with 8 virtual devices so sharding/mesh tests run
without TPU hardware.  Must run before jax backends initialize.

Note: this container exports JAX_PLATFORMS=axon (remote TPU plugin) and a
sitecustomize that registers it at interpreter startup, so we must
overwrite (not setdefault) the platform selection here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize pins the platform at interpreter startup; the env
# var alone does not win — override the config directly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# This environment defaults matmuls to bf16 inputs (TPU-style) even on CPU;
# parity tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "float32")

# persistent compile cache makes repeat test runs much faster
jax.config.update("jax_compilation_cache_dir", "/tmp/gitax_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() == 8, jax.device_count()
