"""Runtime observability: nested stopwatches and memory statistics.

ref: SKIRTcore/StopWatch.hpp:14-45 (5 nested high-resolution global timers
reported at exit, SkirtCommandLineHandler.cpp:175) and
Fundamentals/MemoryStatistics.cpp:58-256 (physical/peak RSS).
"""

from __future__ import annotations

import resource
import time
from contextlib import contextmanager


class StopWatch:
    """Nested global timers (ref: SKIRTcore/StopWatch.hpp).

    Usage: with StopWatch.scope("traversal"): ...; StopWatch.report().
    """

    _stack: list = []
    _totals: dict[str, float] = {}
    _counts: dict[str, int] = {}

    @classmethod
    @contextmanager
    def scope(cls, name: str):
        label = "/".join(s for s, _ in cls._stack) + ("/" if cls._stack else "") + name
        t0 = time.perf_counter()
        cls._stack.append((name, t0))
        try:
            yield
        finally:
            cls._stack.pop()
            dt = time.perf_counter() - t0
            cls._totals[label] = cls._totals.get(label, 0.0) + dt
            cls._counts[label] = cls._counts.get(label, 0) + 1

    @classmethod
    def report(cls) -> str:
        lines = ["StopWatch report:"]
        for label in sorted(cls._totals):
            lines.append(f"  {label}: {cls._totals[label]:.3f} s "
                         f"({cls._counts[label]} calls)")
        return "\n".join(lines)

    @classmethod
    def reset(cls) -> None:
        cls._totals.clear()
        cls._counts.clear()


def memory_statistics() -> dict:
    """Current and peak RSS (ref: Fundamentals/MemoryStatistics.cpp).

    Returns bytes; includes accelerator memory when a jax backend is live.
    """
    ru = resource.getrusage(resource.RUSAGE_SELF)
    stats = {"peak_rss": ru.ru_maxrss * 1024}
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        import os
        stats["current_rss"] = pages * os.sysconf("SC_PAGE_SIZE")
    except OSError:
        stats["current_rss"] = None
    try:
        import jax
        d = jax.devices()[0]
        ms = d.memory_stats() if hasattr(d, "memory_stats") else None
        if ms:
            stats["device_bytes_in_use"] = ms.get("bytes_in_use")
            stats["device_bytes_limit"] = ms.get("bytes_limit")
    except Exception:
        pass
    return stats


def format_memory(stats: dict | None = None) -> str:
    s = stats or memory_statistics()
    def fmt(b):
        return f"{b / (1 << 30):.2f} GB" if b else "n/a"
    parts = [f"peak RSS {fmt(s.get('peak_rss'))}",
             f"current RSS {fmt(s.get('current_rss'))}"]
    if s.get("device_bytes_in_use") is not None:
        parts.append(f"device {fmt(s['device_bytes_in_use'])} of "
                     f"{fmt(s.get('device_bytes_limit'))}")
    return ", ".join(parts)


class AllocationLogger:
    """Phase-boundary memory-growth logging.

    ref: Fundamentals/MemoryLogger.hpp + the reference's `-l` flag
    (per-Array allocation logging, SkirtCommandLineHandler.cpp:286-330).
    XLA owns device allocations, so the per-Array hook becomes a sampler:
    `check(tag)` logs host-RSS/device growth above the threshold since
    the previous check; Log.timer scopes call it automatically once
    installed.
    """

    _instance = None

    def __init__(self, log, limit_gb: float):
        self.log = log
        self.limit = float(limit_gb) * (1 << 30)
        self._last = memory_statistics()

    @classmethod
    def install(cls, log, limit_gb: float):
        cls._instance = cls(log, limit_gb)
        return cls._instance

    @classmethod
    def active(cls):
        return cls._instance

    def check(self, tag: str) -> None:
        now = memory_statistics()
        for key, label in (("current_rss", "host RSS"),
                           ("device_bytes_in_use", "device memory")):
            a, b = self._last.get(key), now.get(key)
            if a is not None and b is not None and b - a >= self.limit:
                self.log.info(f"[alloc] {label} grew "
                              f"{(b - a) / (1 << 30):.2f} GB during {tag} "
                              f"(now {b / (1 << 30):.2f} GB)")
        self._last = now
