"""Persistent XLA compile cache (gitax/runtime/compile_cache.py)."""

import os
import subprocess
import sys

from e2e_common import strip_remote_tpu_env

SCRIPT = """
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from gitax.runtime.compile_cache import enable_compile_cache
d = enable_compile_cache()
import jax, jax.numpy as jnp
@jax.jit
def f(x):
    return jnp.tanh(x @ x.T) * 3.0
t0 = time.time()
f(jnp.ones((64, 64))).block_until_ready()
print("DIR=%s ELAPSED=%.4f" % (d, time.time() - t0))
"""


def _run(env):
    full = strip_remote_tpu_env(dict(os.environ, **env))
    full.pop("XLA_FLAGS", None)  # no virtual-device mesh in the child
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, env=full, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_cache_populates_and_is_reused(tmp_path):
    cache = str(tmp_path / "xla")
    first = _run({"GITAX_COMPILE_CACHE": cache})
    assert "DIR=%s" % cache in first
    entries = os.listdir(cache)
    assert entries, "first run should write compiled executables"
    # Second process must not add new entries — same program, cache hit.
    second = _run({"GITAX_COMPILE_CACHE": cache})
    assert "DIR=%s" % cache in second
    assert sorted(os.listdir(cache)) == sorted(entries)


def test_disable_via_env(tmp_path):
    out = _run({"GITAX_COMPILE_CACHE": "0"})
    assert "DIR=None" in out


def test_enable_idempotent_and_default_dir(monkeypatch, tmp_path):
    import jax

    from gitax.runtime import compile_cache as cc

    old_dir = jax.config.jax_compilation_cache_dir
    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.delenv("GITAX_COMPILE_CACHE", raising=False)
    try:
        d1 = cc.enable_compile_cache()
        d2 = cc.enable_compile_cache()
        assert d1 == d2 == os.path.join(str(tmp_path), "gitax", "xla")
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
