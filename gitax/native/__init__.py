"""Native (C++) host data path: threaded base64 + JPEG decode + PIL-kernel
resize + center crop, compiled lazily with g++ against libjpeg.

Falls back cleanly when the toolchain or libjpeg is unavailable —
callers check `available()` and use the PIL path otherwise.
"""

from __future__ import annotations

import logging
import os
import os.path as op
import subprocess
import sysconfig

import numpy as np

_HERE = op.dirname(op.abspath(__file__))
_SRC = op.join(_HERE, "dataloader.cpp")
_module = None
_build_failed = False


def _so_path():
    tag = sysconfig.get_config_var("SOABI") or "cpython"
    return op.join(_HERE, "_gitax_native.{}.so".format(tag))


def _build():
    so = _so_path()
    if op.isfile(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    include = sysconfig.get_paths()["include"]
    # compile to a private temp name and publish with an atomic rename:
    # concurrent processes may race on a stale/missing .so, and loading
    # a half-written object would poison this process's native path
    tmp = "{}.tmp.{}".format(so, os.getpid())
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-I",
        include,
        _SRC,
        "-ljpeg",
        "-lpthread",
        "-o",
        tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)
    return so


def _load():
    global _module, _build_failed
    if _module is not None or _build_failed:
        return _module
    try:
        so = _build()
        import importlib.util

        spec = importlib.util.spec_from_file_location("_gitax_native", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _module = mod
    except Exception as e:  # toolchain or libjpeg missing
        logging.info("gitax native loader unavailable (%s); using PIL path", e)
        _build_failed = True
    return _module


def available() -> bool:
    return _load() is not None


def decode_resize_crop_batch(payloads, crop_size, is_base64=True, threads=None,
                             fast_scale=True):
    """payloads: list[bytes] -> (images uint8 [N, crop, crop, 3],
    ok_mask bool [N]).  Failed decodes leave zeroed rows with ok=False.
    fast_scale uses libjpeg's reduced-scale IDCT (short side kept >= crop
    target) — much faster on large photos, pixel differences vs the full
    decode are minor; pass False for PIL-parity pixels."""
    mod = _load()
    assert mod is not None, "native loader not available"
    threads = threads or min(16, os.cpu_count() or 4)
    buf, ok = mod.decode_resize_crop_batch(
        list(payloads), int(crop_size), bool(is_base64), int(threads),
        bool(fast_scale),
    )
    n = len(payloads)
    arr = np.frombuffer(buf, np.uint8).reshape(n, crop_size, crop_size, 3)
    return arr, np.asarray(ok, bool)


def decode_minmax_batch(payloads, min_size, max_size, is_base64=True,
                        threads=None, fast_scale=True):
    """payloads: list[bytes] -> list[uint8 HWC array | None] at each
    image's own MinMax target size (gitax.preprocess.min_max_resize_size
    semantics; aspect-preserving, no crop) — the high-res VQA family's
    transform, which the fixed-size batch entry cannot serve."""
    mod = _load()
    assert mod is not None, "native loader not available"
    threads = threads or min(16, os.cpu_count() or 4)
    rows = mod.decode_minmax_batch(
        list(payloads), int(min_size), int(max_size), bool(is_base64),
        int(threads), bool(fast_scale),
    )
    out = []
    for row in rows:
        if row is None:
            out.append(None)
        else:
            buf, h, w = row
            out.append(np.frombuffer(buf, np.uint8).reshape(h, w, 3))
    return out


def b64_decode(payload: bytes):
    mod = _load()
    assert mod is not None
    return mod.b64_decode(payload)
