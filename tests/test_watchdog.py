"""Sweep stall watchdog (SURVEY.md section 5, failure detection; round-3
verdict Next #2): stalls are detected, abort with a distinct exit code,
and --resume completes the sweep afterwards."""

import json
import os
import subprocess
import sys
import time

import h5py
import numpy as np

from ndpp_tpu.host.ace import synth
from ndpp_tpu.host.ace.write import write_ace
from ndpp_tpu.utils.watchdog import EXIT_STALL, SweepWatchdog


def test_watchdog_fires_on_stall():
    fired = []
    wd = SweepWatchdog(timeout_s=0.3, on_stall=fired.append, poll_s=0.05).start()
    try:
        time.sleep(1.0)
        assert fired and fired[0] >= 0.3
    finally:
        wd.stop()


def test_watchdog_quiet_under_progress():
    fired = []
    wd = SweepWatchdog(timeout_s=0.4, on_stall=fired.append, poll_s=0.05).start()
    try:
        for _ in range(8):
            time.sleep(0.1)
            wd.progress()
        assert not fired
    finally:
        wd.stop()


def test_timer_spans_heartbeat_the_watchdog():
    """Every PhaseTimers span exit counts as progress (the driver wiring)."""
    from ndpp_tpu.utils.timer import PhaseTimers

    fired = []
    wd = SweepWatchdog(timeout_s=0.4, on_stall=fired.append, poll_s=0.05).start()
    t = PhaseTimers()
    t.on_add = wd.progress
    try:
        for _ in range(8):
            time.sleep(0.1)
            with t.span("dispatch.test"):
                pass
        assert not fired
    finally:
        wd.stop()


def test_injected_hang_aborts_and_resume_completes(tmp_path):
    """End to end, in subprocesses (the watchdog's os._exit must not kill
    the test runner): a sweep wedged before nuclide #2 (NDPP_TEST_HANG_AT,
    the driver's fault-injection hook mirroring the observed environmental
    RPC wedge) exits with EXIT_STALL after dumping stacks; rerunning with
    --resume and no hang completes the remaining nuclides into the same
    library."""
    lib = tmp_path / "wdlib"
    lib.mkdir()
    entries = []
    for i, ne in enumerate([40, 44]):
        nuc = synth.h1_like(n_energy=ne)
        nuc.name, nuc.zaid = f"100{i + 1}.80c", 1001 + i
        p = write_ace(nuc, lib / f"n{i}.ace")
        entries.append(f"{nuc.name} {nuc.awr:.6f} {p.name} 0 1 1 0")
    (lib / "xsdir").write_text("directory\n" + "\n".join(entries) + "\n")
    def deck(watchdog_minutes: float) -> str:
        d = {
            "run": {
                "nuclides": ["1001.80c", "1002.80c"],
                "library": str(lib / "xsdir"),
                "groups": "uniform-lethargy-47",
                "legendre_order": 1,
                "temperatures": [293.6],
                "thermal_cutoff_kt": 1e-9,
            },
            "output": {"path": str(tmp_path / "wd.h5")},
            "device": {"e_tile": 64, "watchdog_minutes": watchdog_minutes},
        }
        p = tmp_path / f"deck_{watchdog_minutes}.json"
        p.write_text(json.dumps(d))
        return str(p)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    run = lambda deck_path, *extra: subprocess.run(  # noqa: E731
        [sys.executable, "-m", "ndpp_tpu.cli", "run", "-c", deck_path, *extra],
        env=env, capture_output=True, text=True, timeout=900,
    )
    # Warm the persistent compile cache first (cold CPU compiles exceed any
    # test-sized watchdog timeout; in production the timeout is tens of
    # minutes, above the worst cold compile). Watchdog off for this pass.
    r0 = run(deck(0.0))
    assert r0.returncode == 0, (r0.returncode, r0.stderr[-2000:])
    os.remove(tmp_path / "wd.h5")

    env["NDPP_TEST_HANG_AT"] = "1"
    r1 = run(deck(0.5))  # 30 s timeout: above warm trace/lower gaps, far below the 900 s bound
    assert r1.returncode == EXIT_STALL, (r1.returncode, r1.stderr[-2000:])
    assert "watchdog" in r1.stderr  # the stall banner + stack dump went out
    assert "Thread" in r1.stderr  # faulthandler stack dump present

    env.pop("NDPP_TEST_HANG_AT")
    r2 = run(deck(0.5), "--resume")
    assert r2.returncode == 0, (r2.returncode, r2.stderr[-2000:])
    with h5py.File(tmp_path / "wd.h5") as f:
        assert sorted(f["nuclides"]) == ["1001.80c", "1002.80c"]
        for n in f["nuclides"]:
            assert f["nuclides"][n].attrs["complete"] == 1
            assert np.isfinite(f["nuclides"][n]["scatter"][()]).all()
