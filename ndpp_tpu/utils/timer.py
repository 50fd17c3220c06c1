"""Per-phase wall-clock timers.

The reference prints a timer table at exit (SURVEY.md section 5, tracing).
Here timers are structured: nested spans accumulated into a dict that is
emitted in the end-of-run metrics block and echoed into the output library
metadata for provenance.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager


class PhaseTimers:
    """Accumulating named wall-clock spans (thread-safe: the driver's writer
    thread records spans concurrently with the main pipeline).

    >>> t = PhaseTimers()
    >>> with t.span("parse"):
    ...     pass
    >>> "parse" in t.report()
    True
    """

    def __init__(self) -> None:
        self._elapsed: dict[str, float] = {}
        self._counts: dict[str, int] = {}
        self._lock = threading.Lock()
        # Optional progress callback fired on every span exit — the sweep
        # watchdog's heartbeat (utils/watchdog.py): any completed span
        # (prep/dispatch/wait/write) counts as dispatch-layer progress.
        self.on_add = None

    @contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        with self._lock:
            self._elapsed[name] = self._elapsed.get(name, 0.0) + seconds
            self._counts[name] = self._counts.get(name, 0) + 1
        cb = self.on_add
        if cb is not None:
            cb()

    def report(self) -> dict[str, float]:
        return dict(sorted(self._elapsed.items(), key=lambda kv: -kv[1]))

    def snapshot(self) -> dict[str, float]:
        """Copy of the accumulated spans (for per-nuclide deltas)."""
        return dict(self._elapsed)

    @staticmethod
    def delta(before: dict[str, float], after: dict[str, float]) -> dict[str, float]:
        """after - before, dropping ~zero entries; sorted descending."""
        out = {k: v - before.get(k, 0.0) for k, v in after.items()}
        return dict(sorted(((k, v) for k, v in out.items() if v > 1e-4), key=lambda kv: -kv[1]))

    def pretty(self) -> str:
        lines = ["phase timers (s):"]
        for name, dt in self.report().items():
            lines.append(f"  {name:<32s} {dt:10.3f}  (x{self._counts[name]})")
        return "\n".join(lines)
