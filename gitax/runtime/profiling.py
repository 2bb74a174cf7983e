"""Profiling + throughput observability.

The reference's only instrumentation is wall-clock images/s logging
(train.py:246-303) and slow-open warnings (tsv_io.py:332-336).  gitax
adds first-class TPU tracing via jax.profiler (viewable in
TensorBoard/XProf) and a reusable throughput meter.
"""

from __future__ import annotations

import contextlib
import logging
import time


@contextlib.contextmanager
def trace(logdir="/tmp/gitax_trace"):
    """Capture a device trace for the enclosed block:

        with profiling.trace('/tmp/trace'):
            run_step()
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", logdir)


class ThroughputMeter(object):
    """Rolling items/s logger (reference train.py:290-300 semantics:
    periodic window timing after warmup)."""

    def __init__(self, name="throughput", unit="items", log_every=10, warmup=2):
        self.name, self.unit = name, unit
        self.log_every, self.warmup = log_every, warmup
        self._count = 0
        self._items = 0
        self._t0 = time.time()
        self.last_rate = None

    def update(self, n_items):
        self._count += 1
        if self._count <= self.warmup:
            self._t0 = time.time()
            return
        self._items += n_items
        if (self._count - self.warmup) % self.log_every == 0:
            dt = time.time() - self._t0
            self.last_rate = self._items / max(dt, 1e-9)
            logging.info(
                "%s: %.1f %s/s", self.name, self.last_rate, self.unit
            )
            self._items = 0
            self._t0 = time.time()


class StepLogger(object):
    """Periodic training-metrics logging (covers the reference's
    in-module loss stats, decoder.py:645-665, without stateful loss
    modules)."""

    def __init__(self, log_every=100):
        self.log_every = log_every
        self._min = float("inf")
        self._max = float("-inf")

    def update(self, step, metrics):
        loss = float(metrics.get("loss", float("nan")))
        self._min = min(self._min, loss)
        self._max = max(self._max, loss)
        if step % self.log_every == 0:
            extras = {
                k: float(v) for k, v in metrics.items() if k != "loss"
            }
            logging.info(
                "step=%d loss=%.4f window_min=%.4f window_max=%.4f %s",
                step, loss, self._min, self._max, extras,
            )
            self._min, self._max = float("inf"), float("-inf")
