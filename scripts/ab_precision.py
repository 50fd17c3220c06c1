#!/usr/bin/env python
"""dd vs f64 A/B at driver tiles, in-driver (round-4 verdict Next #4).

Runs the SAME warm subset through the full production pipeline twice per
precision (cold pass compiles, warm pass measures — big-kernel
executables only live in-process on this container) and reports the warm
wall + phase spans. The decision rule from the verdict: flip the
production default to dd iff warm wait.twobody(dd) <= wait.twobody(f64)
at the shipping e_tile (2048); otherwise production stays f64.

    python scripts/ab_precision.py [--workdir /tmp/ndpp_scale] [--n 6]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ndpp_scale")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--e-tile", type=int, default=2048)
    args = ap.parse_args()

    from ndpp_tpu import config as config_mod
    from ndpp_tpu import driver
    from ndpp_tpu.host import library_index
    from ndpp_tpu.utils import log as log_mod

    log_mod.setup(level=20)
    xsdir = Path(args.workdir) / "xsdir"
    idx = library_index.load(str(xsdir))
    # pick the N largest-NE stress nuclides (two-body + continuum mix):
    # parse is cheap; size by union grid length
    from ndpp_tpu.host.ace.parse import read_ace

    sizes = []
    for name in idx.names():
        if name.endswith("t"):
            continue
        try:
            nuc = read_ace(idx.path_for(name), name_hint=name)
        except Exception:
            continue
        sizes.append((nuc.energy.size, name))
    sizes.sort(reverse=True)
    subset = [n for _, n in sizes[: args.n]]
    print("subset:", subset, flush=True)

    rows = {}
    for prec in ("f64", "dd"):
        cfg = config_mod.RunConfig(
            nuclides=subset,
            library=str(xsdir),
            groups="uniform-lethargy-361",
            legendre_order=5,
            temperatures=[293.6, 600.0],
        )
        cfg.device.precision = prec
        cfg.device.e_tile = args.e_tile
        per_pass = []
        for which in ("cold", "warm"):
            cfg.output.path = str(Path(args.workdir) / f"ab_{prec}_{which}.h5")
            t0 = time.perf_counter()
            m = driver.run(cfg)
            per_pass.append(
                {
                    "pass": which,
                    "wall_s": round(time.perf_counter() - t0, 2),
                    "phase": {k: round(v, 2) for k, v in m.phase_seconds.items()},
                    "quarantined": m.nuclides_quarantined,
                }
            )
        rows[prec] = per_pass
        print(f"AB {prec} " + json.dumps(per_pass), flush=True)

    w_f64 = rows["f64"][1]["phase"].get("wait.twobody", 0.0)
    w_dd = rows["dd"][1]["phase"].get("wait.twobody", 0.0)
    verdict = "dd" if w_dd <= w_f64 else "f64"
    print(
        "AB_SUMMARY "
        + json.dumps(
            {
                "warm_wait_twobody": {"f64": w_f64, "dd": w_dd},
                "warm_wall": {p: rows[p][1]["wall_s"] for p in rows},
                "winner": verdict,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
