#!/usr/bin/env python
"""Benchmark: nuclide-group-moments/sec on the flagship two-body kernel.

Runs on whatever backend jax selects (the real TPU under the driver).
Prints ONE JSON line:
  {"metric": "nuclide-group-moments/sec", "value": N, "unit": "moments/s",
   "vs_baseline": R}

The metric counts computed moment values (E-points x (L+1) x G) per second
of steady-state device execution at a production-like shape (P5, 361
groups, 2048-point E-tiles), matching BASELINE.json:2. ``vs_baseline``
is relative to the round-1 pinned self-baseline in BASELINE.md (no
reference numbers exist on this machine; see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 self-baseline (first measured steady-state value on this v5e chip,
# 2026-08-16, f64 path, pre-optimization); see BASELINE.md. Updated only when
# the baseline row itself is re-pinned.
BASELINE_MOMENTS_PER_SEC = 1_664_594.0

ORDER = 5
NQ = 16
TILE = 2048
K = 48
NG = 361
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ndpp_tpu import groups
    from ndpp_tpu.ops.twobody import twobody_moments

    e, knots, pdf, _, c1, c2, awr = ge._example_batch(1, TILE, k=K, ng=NG)
    bounds = groups.get("uniform-lethargy-361").bounds
    args = (
        jnp.asarray(e[0]),
        jnp.asarray(knots[0]),
        jnp.asarray(pdf[0]),
        jnp.asarray(bounds),
        jnp.asarray(np.repeat(c1, TILE)),
        jnp.asarray(np.repeat(c2, TILE)),
        jnp.asarray(np.repeat(awr, TILE)),
    )

    def step(e_arr):
        # perturb the energies each iteration so no caching layer can elide
        # work, and chain the dependency through the output so iterations
        # serialize even under fully async dispatch
        out = twobody_moments(e_arr, *args[1:], ORDER, NQ)
        return out, e_arr * (1.0 + 1e-12 * out[0, 0, 0])

    e_arr = args[0]
    out, e_arr = step(e_arr)
    float(np.asarray(out[0, 0, 0]))  # compile + warm + forced sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, e_arr = step(e_arr)
    float(np.asarray(out[0, 0, 0]))  # host pull: hard synchronization point
    dt = time.perf_counter() - t0

    moments = TILE * (ORDER + 1) * NG * ITERS
    value = moments / dt
    vs = value / BASELINE_MOMENTS_PER_SEC if BASELINE_MOMENTS_PER_SEC else 1.0

    # secondary: the f32 fused-Pallas fast path (device.precision='f32';
    # production accuracy bar stays on the f64 primary above)
    f32_value = None
    if jax.devices()[0].platform == "tpu":
        from ndpp_tpu.ops.twobody_pallas import twobody_moments_pallas

        args32 = tuple(jnp.asarray(a, jnp.float32) for a in args)

        def step32(e_arr):
            out = twobody_moments_pallas(e_arr, *args32[1:], ORDER, NQ)
            return out, e_arr * (1.0 + 1e-6 * out[0, 0, 0])

        e32 = args32[0]
        out, e32 = step32(e32)
        float(np.asarray(out[0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out, e32 = step32(e32)
        float(np.asarray(out[0, 0, 0]))
        f32_value = moments / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "nuclide-group-moments/sec",
                "value": round(value, 1),
                "unit": "moments/s",
                "vs_baseline": round(vs, 4),
                "detail": {
                    "backend": jax.devices()[0].platform,
                    "device": str(jax.devices()[0]),
                    "tile": TILE,
                    "order": ORDER,
                    "groups": NG,
                    "iters": ITERS,
                    "seconds": round(dt, 4),
                    "dtype": "float64",
                    "f32_pallas_moments_per_sec": round(f32_value, 1) if f32_value else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
