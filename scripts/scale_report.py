#!/usr/bin/env python
"""Summarize a scale-demo log: per-nuclide wall times + steady-state rate.

Parses the driver's "[HH:MM:SS] INFO done <name> (NE=N)" lines from a
scale_demo.py log, reports the compile-dominated head vs the steady-state
tail (median/p90 per-nuclide seconds over the last half), and projects the
full-sweep wall. Usage: python scripts/scale_report.py /tmp/scale_r2.log
"""

from __future__ import annotations

import datetime as dt
import json
import re
import sys

PAT = re.compile(r"\[(\d\d):(\d\d):(\d\d)\] INFO done (\S+) \(NE=(\d+)\)")


def main(path: str) -> None:
    rows = []
    for line in open(path, errors="replace"):
        m = PAT.search(line)
        if m:
            h, mi, s, name, ne = m.groups()
            t = int(h) * 3600 + int(mi) * 60 + int(s)
            rows.append((t, name, int(ne)))
    if len(rows) < 2:
        print(json.dumps({"done": len(rows)}))
        return
    # handle midnight wrap
    times = [t for t, _, _ in rows]
    for i in range(1, len(times)):
        while times[i] < times[i - 1]:
            times[i] += 86400
    durs = [times[i] - times[i - 1] for i in range(1, len(times))]
    names = [r[1] for r in rows[1:]]
    nes = [r[2] for r in rows[1:]]
    half = len(durs) // 2
    tail = sorted(durs[half:]) or sorted(durs)
    med = tail[len(tail) // 2]
    p90 = tail[min(int(len(tail) * 0.9), len(tail) - 1)]
    tail_per_ne = sorted(d / max(n, 1) for d, n in zip(durs[half:], nes[half:])) or [0]
    worst = sorted(zip(durs, names), reverse=True)[:5]
    print(
        json.dumps(
            {
                "done": len(rows),
                "elapsed_s": times[-1] - times[0],
                "mean_s_all": round(sum(durs) / len(durs), 1),
                "steady_median_s": med,
                "steady_p90_s": p90,
                "steady_median_s_per_ne": round(tail_per_ne[len(tail_per_ne) // 2], 4),
                "slowest": [[n, d] for d, n in worst],
            },
            indent=None,
        )
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r2.log")
