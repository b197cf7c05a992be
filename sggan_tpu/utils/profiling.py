"""Profiling / step-timing — a first-class subsystem here because the
reference has none (SURVEY §5: only wall-clock prints at model.py:260-261)
and the north-star metric IS images/sec/chip.

* `trace(logdir)` — context manager around `jax.profiler` producing traces
  viewable in TensorBoard / Perfetto / xprof.
* `StepTimer` — amortized throughput meter whose `read()` forces a host
  sync (a device->host read is the only trustworthy fence through
  async/remote dispatch layers — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates (images, seconds) across steps; call mark() after each
    step and read(sync_value) at sync points (e.g. epoch end)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._images = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def mark(self, n_images: int):
        if self._t0 is None:
            self.start()
        self._images += n_images

    def read(self, sync_value=None) -> dict:
        """sync_value: any device array to block on (e.g. a loss) so the
        measured interval covers real execution."""
        if sync_value is not None:
            try:
                float(jax.numpy.asarray(sync_value).reshape(-1)[0])
            except Exception:
                pass
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        ips = self._images / dt if dt > 0 else 0.0
        out = {"images": self._images, "seconds": dt, "images_per_sec": ips}
        return out


class TraceWindow:
    """Profiles a bounded window of train dispatches (CLI --profile_dir).

    Call ``tick()`` after every step/chunk dispatch: the trace starts
    after `start_after` dispatches (so the first-call compile stays out
    of the trace) and covers the next `n`; ``close()`` stops an open
    trace at shutdown.  Produces a Perfetto/xprof trace under
    ``logdir/plugins/profile/...`` (works through this environment's
    remote device relay — PERF.md)."""

    def __init__(self, logdir: str, start_after: int = 1, n: int = 2):
        self.logdir = logdir
        self.start_after = start_after
        self.n = n
        self._count = 0
        self._state = 0  # 0 pending, 1 tracing, 2 done

    def tick(self):
        self._count += 1
        if self._state == 0 and self._count >= self.start_after:
            jax.profiler.start_trace(self.logdir)
            self._state = 1
        elif self._state == 1 and self._count >= self.start_after + self.n:
            jax.profiler.stop_trace()
            self._state = 2

    def close(self):
        if self._state == 1:
            jax.profiler.stop_trace()
            self._state = 2
