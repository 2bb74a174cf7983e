"""Persistent XLA compilation cache for the CLI entry points.

The reference pays PyTorch's eager-mode cost per op; gitax pays XLA's
compile cost per *process* instead — a single-image caption CLI spends
most of its wall time tracing + compiling the encoder/beam programs it
will run exactly once.  Persisting compiled executables across processes
removes that cost from the second invocation onward (the classic
serving/CLI cold-start fix; jax's built-in persistent cache keyed on
HLO + compile options + backend).

Enabled automatically by ``dispatch_main`` for every gitax CLI.  Control
via environment:

    GITAX_COMPILE_CACHE=0        disable
    GITAX_COMPILE_CACHE=/path    cache directory (default
                                 ~/.cache/gitax/xla, or
                                 $XDG_CACHE_HOME/gitax/xla)

Library users can call :func:`enable_compile_cache` directly.
"""

from __future__ import annotations

import logging
import os

_ENV = "GITAX_COMPILE_CACHE"
_enabled_dir: str | None = None


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "gitax", "xla")


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at ``cache_dir`` and relax
    the size/compile-time floors so CLI-sized programs qualify.

    Idempotent; returns the active cache directory, or None when disabled
    via ``GITAX_COMPILE_CACHE=0``.  Must run before the first compilation
    to benefit that process (later calls still help subsequent ones).
    """
    global _enabled_dir

    env = os.environ.get(_ENV, "")
    if env.strip() in ("0", "false", "off"):
        return None
    if cache_dir is None:
        cache_dir = env if env and env.strip() not in ("1", "true", "on") \
            else default_cache_dir()

    if _enabled_dir == cache_dir:
        return _enabled_dir

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        # Default floors (1 s compile time / 0 bytes) skip exactly the
        # small-but-recompiled-every-process programs we care about.
        # Floors first, cache dir LAST: the dir update is what turns the
        # cache on, so a partial failure leaves it fully off, matching
        # the warning below.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except (OSError, AttributeError) as exc:  # unwritable dir / old jax
        logging.warning("compile cache disabled: %s", exc)
        return None

    _enabled_dir = cache_dir
    logging.info("persistent XLA compile cache: %s", cache_dir)
    return _enabled_dir
