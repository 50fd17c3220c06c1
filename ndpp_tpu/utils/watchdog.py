"""Sweep stall watchdog (SURVEY.md section 5, failure detection).

The remote dispatch layer on this hardware has twice wedged a
300-nuclide sweep on an RPC that never returned (rounds 2 and 3:
sweep threads idle in futex/epoll at 65/300 and 137/300 nuclides, no
error ever surfaced). A sweep that can hang forever on one dispatch
fails the failure-detection bar at exactly the scale the north star
cares about — so the driver arms this watchdog:

  - every phase-span exit (prep/dispatch/wait/write, per kernel family)
    counts as progress (PhaseTimers.on_add -> SweepWatchdog.progress);
  - a monitor thread polls; if no span completed for ``timeout_s`` it
    dumps every thread's stack to stderr (the round-3 wedge diagnosis
    took a manual py-spy session; now it is automatic) and invokes
    ``on_stall`` — by default a hard ``os._exit(EXIT_STALL)``.

EXIT_STALL (4) is distinct from the quarantine exit (3) so a supervisor
(scripts/scale_demo.py --max-restarts) can tell "some nuclides failed"
from "the dispatch layer wedged: restart me with --resume". A hard exit
is safe for the library output: nuclide groups carry a ``complete``
attribute written last, so at most one nuclide is re-done on resume and
merge/read paths skip the partial group.

The timeout must exceed the worst legitimate single span: cold remote
compiles run 60-600 s per distinct kernel shape on this container, so
production sweeps default to tens of minutes (config.device.watchdog_minutes).
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

EXIT_STALL = 4


class SweepWatchdog:
    """Monitor thread that aborts the process on dispatch-progress stalls."""

    def __init__(self, timeout_s: float, on_stall=None, poll_s: float | None = None):
        self.timeout_s = float(timeout_s)
        self._on_stall = on_stall or self._default_stall
        self._poll_s = poll_s if poll_s is not None else max(0.5, min(30.0, self.timeout_s / 4.0))
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, name="ndpp-watchdog", daemon=True)

    def progress(self, *_args, **_kwargs) -> None:
        """Record progress (signature-tolerant: usable as any callback)."""
        self._last = time.monotonic()

    def start(self) -> "SweepWatchdog":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()

    def idle_seconds(self) -> float:
        return time.monotonic() - self._last

    def _loop(self) -> None:
        while not self._stop.wait(self._poll_s):
            idle = self.idle_seconds()
            if idle > self.timeout_s:
                self._on_stall(idle)
                return

    def _default_stall(self, idle: float) -> None:
        sys.stderr.write(
            f"\nndpp watchdog: NO dispatch progress for {idle:.0f} s "
            f"(timeout {self.timeout_s:.0f} s) — dumping thread stacks and "
            f"aborting with exit code {EXIT_STALL} (restart with --resume)\n"
        )
        sys.stderr.flush()
        faulthandler.dump_traceback(file=sys.stderr, all_threads=True)
        sys.stderr.flush()
        os._exit(EXIT_STALL)
