"""gitax.doctor environment self-test (`python -m gitax.doctor`)."""

import json
import os
import subprocess
import sys
import time

import pytest

from e2e_common import strip_remote_tpu_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_doctor(extra_env=None, args=()):
    env = strip_remote_tpu_env(dict(os.environ))
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-m", "gitax.doctor", *args],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )


def test_doctor_healthy_cpu_passes():
    r = _run_doctor()
    assert r.returncode == 0, r.stdout + r.stderr
    assert "all required checks passed" in r.stdout
    for name in ("backend", "compute", "cache", "tsv"):
        assert "[OK  ] {}".format(name) in r.stdout, r.stdout


def test_doctor_json_mode():
    r = _run_doctor(args=("--json",))
    assert r.returncode == 0, r.stdout + r.stderr
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["ok"] is True
    names = {c["name"]: c for c in payload["checks"]}
    assert names["backend"]["ok"] and names["tsv"]["ok"]
    assert set(names) == {"backend", "compute", "cache", "native",
                          "vocab", "tsv"}


def test_doctor_unreachable_backend_fails_without_hanging():
    """An unregisterable backend must FAIL the backend check quickly and
    still run the jax-free checks (relay-wedge behavior without a
    wedged relay: JAX_PLATFORMS names a platform that doesn't exist)."""
    t0 = time.time()
    r = _run_doctor(extra_env={"JAX_PLATFORMS": "nonexistent_backend"})
    assert r.returncode == 1, r.stdout + r.stderr
    assert time.time() - t0 < 120
    assert "[FAIL] backend" in r.stdout
    assert "[OK  ] tsv" in r.stdout  # post-backend checks still ran


def test_check_backend_timeout_reports_instead_of_hanging():
    """A backend init that never returns (the wedged-relay mode) is
    reported as TimeoutError by the watchdog."""
    from gitax.doctor import _check_backend

    def never_returns():
        time.sleep(60)

    t0 = time.time()
    with pytest.raises(TimeoutError, match="relay unreachable"):
        _check_backend(1.0, init_fn=never_returns)
    assert time.time() - t0 < 10
