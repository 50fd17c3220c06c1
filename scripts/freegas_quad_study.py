#!/usr/bin/env python
"""Free-gas quadrature cost/accuracy study (round-1 verdict item 2).

Evaluates freegas_moments_pointwise variants (GL orders + fill-ladder
densities) against a high-order truth setting on a matrix of (A, E,
window) cases, reporting max abs error and the relative node cost, to
pick the production Pareto point. CPU/x64; run on a quiet box.
"""

from __future__ import annotations

import itertools
import sys

import numpy as np

import jax

try:
    jax.config.update("jax_num_cpu_devices", 1)
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from ndpp_tpu.ops.freegas import freegas_moments_pointwise  # noqa: E402

KT = 0.0253
ORDER = 5

CASES = []  # (label, A, e_rows, bounds)
for awr in (0.999167, 15.858, 238.0):
    # fine thermal window (the S(alpha,beta)-handoff regime)
    bw_fine = np.concatenate([[0.0], np.geomspace(1e-4, 4.0, 24), [50.0]])
    # production-style coarse window (driver recipe: catch + 32 log groups)
    bw_prod = np.concatenate([[0.0], np.geomspace(1e-3, 200.0, 33)])
    e_rows = np.array([KT / 10.0, KT, 1.0, 9.9])
    CASES.append((f"A={awr} fine", awr, e_rows, bw_fine))
    CASES.append((f"A={awr} prod", awr, e_rows, bw_prod))

# (name, nq_g, nq_r, nq_c, nfill_r, nfill_c, ngeo_c)
VARIANTS = [
    ("prod-8/8/8 f7/7/8", 8, 8, 8, 7, 7, 8),
    ("slim  8/8/8 f3/3/4", 8, 8, 8, 3, 3, 4),
    ("slim  8/6/6 f3/3/4", 8, 6, 6, 3, 3, 4),
    ("slim  6/6/6 f3/3/4", 6, 6, 6, 3, 3, 4),
    ("slim  8/6/6 f2/2/3", 8, 6, 6, 2, 2, 3),
    ("slim  8/4/6 f3/3/4", 8, 4, 6, 3, 3, 4),
    ("slim  8/6/4 f3/3/4", 8, 6, 4, 3, 3, 4),
    ("min   6/4/4 f2/2/3", 6, 4, 4, 2, 2, 3),
]
TRUTH = (12, 16, 16, 7, 7, 8)


def cost(nq_g, nq_r, nq_c, nfill_r, nfill_c, ngeo_c):
    """Relative inner-node count: y-pts x vr-panels x nq_r x C-panels x nq_c."""
    vr_panels = 11 + 3 + 8 + nfill_r  # ladder + kinks + roots + fill (edges-1)
    c_panels = 2 + 11 + 11 + nfill_c + ngeo_c
    return nq_g * vr_panels * nq_r * c_panels * nq_c


def run(awr, e_rows, bounds, nq_g, nq_r, nq_c, nfill_r, nfill_c, ngeo_c):
    return np.asarray(
        freegas_moments_pointwise(
            jnp.asarray(e_rows), awr, KT, jnp.asarray(bounds), ORDER,
            nq_g, nq_r, nq_c, 8, nfill_r, nfill_c, ngeo_c,
        )
    )


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    truth = {}
    for label, awr, e_rows, bounds in CASES:
        truth[label] = run(awr, e_rows, bounds, *TRUTH)
    base_cost = cost(8, 8, 8, 7, 7, 8)
    print(f"{'variant':<22s} {'cost':>6s} {'max_err':>10s}  worst case")
    for name, *params in VARIANTS:
        if only and only not in name:
            continue
        errs = {}
        for label, awr, e_rows, bounds in CASES:
            got = run(awr, e_rows, bounds, *params)
            errs[label] = float(np.abs(got - truth[label]).max())
        worst = max(errs, key=errs.get)
        rel_cost = cost(*params) / base_cost
        print(f"{name:<22s} {rel_cost:>6.2f} {errs[worst]:>10.2e}  {worst}")
        for label in errs:
            print(f"    {label:<16s} {errs[label]:.2e}")


if __name__ == "__main__":
    main()
