"""Lightweight stage telemetry + jax.profiler integration.

The reference's only observability is total_in/total_out byte counters
(zstream.ts:24,30) and ad-hoc harness timing (SURVEY.md §5).  Here:
per-stage (calls, bytes, seconds) counters — zero overhead unless
enabled via TPUZLIB_TRACE=1 or enable() — plus a context manager that
wraps jax.profiler.trace for device timeline capture.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict

_enabled = bool(os.environ.get("TPUZLIB_TRACE"))
_lock = threading.Lock()
_stats: dict = defaultdict(lambda: [0, 0, 0.0])  # name -> [calls, bytes, secs]


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def telemetry_enabled() -> bool:
    return _enabled


def reset() -> None:
    with _lock:
        _stats.clear()


def get_telemetry() -> dict:
    """{stage: {calls, bytes, seconds, MBps}}"""
    with _lock:
        out = {}
        for name, (calls, nbytes, secs) in _stats.items():
            out[name] = {
                "calls": calls,
                "bytes": nbytes,
                "seconds": round(secs, 6),
                "MBps": round(nbytes / secs / 1e6, 2) if secs > 0 else None,
            }
        return out


@contextlib.contextmanager
def timed_stage(name: str, nbytes: int = 0):
    """Record one stage execution (no-op unless telemetry is enabled)."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            s = _stats[name]
            s[0] += 1
            s[1] += nbytes
            s[2] += dt


_counters: dict = defaultdict(int)


def count(name: str, n: int = 1) -> None:
    """Increment a named event counter (always on — counters are cheap).

    Used for device-dispatch observability: every device-path entry and
    every host fallback bumps a counter, so a silent regression to 100%
    fallback is visible (``get_counters()['inflate.device_fallback']``).
    """
    with _lock:
        _counters[name] += n


def get_counters() -> dict:
    with _lock:
        return dict(_counters)


def reset_counters() -> None:
    with _lock:
        _counters.clear()


@contextlib.contextmanager
def profile(logdir: str = "/tmp/tpuzlib_profile"):
    """Capture a jax.profiler device trace around a codec region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
