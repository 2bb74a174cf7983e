"""Environment self-test: ``python -m gitax.doctor``.

One line per check, human-readable by default, ``--json`` for a machine
summary; exit 0 when every REQUIRED check passes, 1 otherwise.  Checks
are ordered so the dangerous one — jax backend init, which can block
FOREVER when this container's remote-TPU relay is wedged (the PJRT
plugin retries its terminal connection with no deadline) — runs under a
watchdog thread and is reported as a failure instead of hanging the
caller.  The reference has no equivalent; this exists because a wedged
relay once turned every ``import jax``-ing process into a silent hang
(see tests/e2e_common.strip_remote_tpu_env).

Checks:
  backend   jax backend init + device enumeration (watchdog-bounded,
            GITAX_DOCTOR_BACKEND_TIMEOUT_S, default 60)
  compute   one tiny jit matmul on the default backend
  cache     persistent compile-cache dir resolvable + writable
  native    C++ dataloader builds/loads (optional — python fallback)
  vocab     bert-base-uncased vocab discoverable (optional — needed
            only for real-checkpoint tokenization)
  tsv       TSV write/read round-trip under a temp dir
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time


class Check(object):
    def __init__(self, name, required=True):
        self.name = name
        self.required = required
        self.ok = False
        self.detail = ""
        self.seconds = 0.0

    def run(self, fn):
        t0 = time.time()
        try:
            self.detail = fn() or ""
            self.ok = True
        except Exception as exc:  # noqa: BLE001 — every failure is a report
            self.detail = "{}: {}".format(type(exc).__name__, exc)
            self.ok = False
        self.seconds = time.time() - t0
        return self


def _check_backend(timeout_s, init_fn=None):
    """Backend init under a watchdog: a wedged remote-TPU relay blocks
    make_c_api_client forever, so poll from a side thread and report
    instead of hanging.  ``init_fn`` is injectable for tests."""
    result = {}

    def default_init():
        import jax

        return [str(d) for d in jax.devices()]

    def init():
        try:
            result["devices"] = (init_fn or default_init)()
        except Exception as exc:  # noqa: BLE001
            result["error"] = str(exc)

    t = threading.Thread(target=init, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise TimeoutError(
            "backend init still blocked after {}s — remote accelerator "
            "relay unreachable?  (JAX_PLATFORMS={})".format(
                timeout_s, os.environ.get("JAX_PLATFORMS", "<unset>"))
        )
    if "error" in result:
        raise RuntimeError(result["error"])
    devs = result["devices"]
    return "{} device(s): {}".format(len(devs), ", ".join(devs[:4]))


def _check_compute():
    import jax
    import jax.numpy as jnp

    out = jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((64, 64), jnp.float32))
    val = float(out)
    assert abs(val - 64.0 * 64 * 64) < 1e-3, val
    return "jit matmul OK on {}".format(jax.devices()[0].platform)


def _check_cache():
    # default-dir logic inlined from gitax.runtime.compile_cache:
    # importing it pulls gitax.runtime.__init__ -> pipeline -> jax
    # module constants, which BLOCKS on jax's backend-init lock while a
    # timed-out backend thread still holds it.  Every check after a
    # backend timeout must stay jax-import-free.
    if os.environ.get("GITAX_COMPILE_CACHE") == "0":
        return "disabled via GITAX_COMPILE_CACHE=0"
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    d = os.environ.get("GITAX_COMPILE_CACHE") or os.path.join(
        base, "gitax", "xla")
    os.makedirs(d, exist_ok=True)
    probe = os.path.join(d, ".doctor_probe_{}".format(os.getpid()))
    with open(probe, "w") as fp:
        fp.write("ok")
    os.remove(probe)
    return d


def _check_native():
    from gitax import native

    if not native.available():
        raise RuntimeError(
            "C++ dataloader unavailable (falls back to PIL decode)")
    import numpy as np
    from PIL import Image
    import io as _io

    buf = _io.BytesIO()
    Image.fromarray(np.full((32, 32, 3), 128, np.uint8)).save(buf, "JPEG")
    imgs, ok = native.decode_resize_crop_batch([buf.getvalue()], 16,
                                               is_base64=False)
    assert ok[0] and imgs.shape == (1, 16, 16, 3), (imgs.shape, ok)
    return "libjpeg decode pipeline OK"


def _check_vocab():
    from gitax.tokenization import BertTokenizer

    tok = BertTokenizer.bert_base_uncased()
    return "vocab of {} tokens".format(tok.vocab_size)


def _check_tsv():
    from gitax.io.tsv import TSVFile, tsv_writer

    with tempfile.TemporaryDirectory(prefix="gitax_doctor_") as d:
        p = os.path.join(d, "probe.tsv")
        tsv_writer([("k0", "v0"), ("k1", "v1")], p)
        t = TSVFile(p)
        assert [t[i][1] for i in range(len(t))] == ["v0", "v1"]
    return "write/read round-trip OK"


def run_checks(backend_timeout_s=None):
    if backend_timeout_s is None:
        try:
            backend_timeout_s = float(os.environ.get(
                "GITAX_DOCTOR_BACKEND_TIMEOUT_S", "60"))
        except ValueError:
            backend_timeout_s = 60.0
    checks = [
        Check("backend").run(lambda: _check_backend(backend_timeout_s)),
    ]
    # compute only makes sense if the backend came up
    if checks[0].ok:
        checks.append(Check("compute").run(_check_compute))
    else:
        c = Check("compute", required=False)  # backend already FAILed
        c.detail = "skipped: backend unavailable"
        checks.append(c)
    checks.append(Check("cache").run(_check_cache))
    checks.append(Check("native", required=False).run(_check_native))
    checks.append(Check("vocab", required=False).run(_check_vocab))
    checks.append(Check("tsv").run(_check_tsv))
    return checks


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    as_json = "--json" in argv
    checks = run_checks()
    failed_required = [c for c in checks if c.required and not c.ok]
    if as_json:
        print(json.dumps({
            "ok": not failed_required,
            "checks": [
                {"name": c.name, "ok": c.ok, "required": c.required,
                 "detail": c.detail, "seconds": round(c.seconds, 2)}
                for c in checks
            ],
        }))
    else:
        for c in checks:
            mark = "OK  " if c.ok else ("warn" if not c.required else "FAIL")
            print("[{}] {:<8} {}  ({:.2f}s)".format(
                mark, c.name, c.detail, c.seconds))
        print("gitax doctor: {}".format(
            "all required checks passed" if not failed_required else
            "{} required check(s) FAILED".format(len(failed_required))))
    return 1 if failed_required else 0


if __name__ == "__main__":
    sys.exit(main())
