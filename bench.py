#!/usr/bin/env python
"""Benchmark: nuclide-group-moments/sec on the flagship two-body kernel.

Runs on whatever backend jax selects (the real TPU under the driver).
Prints ONE JSON line:
  {"metric": "nuclide-group-moments/sec", "value": N, "unit": "moments/s",
   "vs_baseline": R}

The metric counts computed moment values (E-points x (L+1) x G) per second
of steady-state device execution at a production-like shape (P5, 361
groups, 2048-point E-tiles), matching BASELINE.json:2. The PRIMARY value
is the fastest accuracy-compliant path (<= 1e-8 rel per moment): the
Pallas double-double kernel on TPU (~1e-11 vs f64; tests/test_pallas.py),
the XLA f64 kernel elsewhere. ``vs_baseline`` is relative to the round-1
pinned self-baseline in BASELINE.md (no reference numbers exist on this
machine; see BASELINE.md).

Timing methodology (see BASELINE.md): ONE device execution of a
lax.fori_loop whose carry chains a perturbation of the inputs through
every iteration — the axon remote layer elides repeated identical
executions, and per-iteration host round-trips are noise on a 1-core box.
"""

from __future__ import annotations

import json
import os
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


def _rate(fn, e0, eps_scale):
    """moments/s of fn over ITERS chained iterations in one dispatch."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(e_arr):
        def body(i, e_arr):
            out = fn(e_arr)
            return e_arr * (1.0 + eps_scale * out[0, 0, 0].astype(e_arr.dtype))

        return lax.fori_loop(0, ITERS, body, e_arr)

    out = run(e0)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    out = run(e0 * jnp.asarray(1.0 + 1e-9, e0.dtype))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return TILE * (ORDER + 1) * NG * ITERS / dt, dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ndpp_tpu import groups
    from ndpp_tpu.ops.twobody import twobody_moments

    e, knots, pdf, _, c1, c2, awr = ge._example_batch(1, TILE, k=K, ng=NG)
    bounds = groups.get("uniform-lethargy-361").bounds
    args = (
        jnp.asarray(knots[0]),
        jnp.asarray(pdf[0]),
        jnp.asarray(bounds),
        jnp.asarray(np.repeat(c1, TILE)),
        jnp.asarray(np.repeat(c2, TILE)),
        jnp.asarray(np.repeat(awr, TILE)),
    )
    e0 = jnp.asarray(e[0])

    # Time budget: cold compiles on the remote axon compiler cost 60-100 s
    # per distinct kernel shape (>10 min for the f64 bench shape on a
    # degraded container, 2026-08-20), and the big-kernel executables were
    # observed NOT to land in the persistent compile cache on this container
    # — so a timed-out path must be assumed lost, not resumable. Measure the
    # mandatory f64 path first, then START each optional path only while
    # inside the budget (the guard bounds path *starts*, not total runtime:
    # a path begun just under budget can still overrun, but the f64 JSON
    # line is guaranteed once f64 itself finishes).
    try:
        budget_s = float(os.environ.get("NDPP_BENCH_BUDGET_S", "1500"))
    except ValueError:
        budget_s = 1500.0
    t_start = time.perf_counter()

    f64_rate, f64_dt = _rate(
        lambda e_arr: twobody_moments(e_arr, *args, ORDER, NQ), e0, 1e-13
    )

    dd_rate = f32_rate = None
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and time.perf_counter() - t_start < budget_s:
        from ndpp_tpu.ops.twobody_pallas_dd import twobody_moments_dd

        dd_rate, _ = _rate(
            lambda e_arr: twobody_moments_dd(e_arr, *args, ORDER, NQ), e0, 1e-13
        )
    if on_tpu and time.perf_counter() - t_start < budget_s:
        from ndpp_tpu.ops.twobody_pallas import twobody_moments_pallas

        args32 = tuple(jnp.asarray(a, jnp.float32) for a in args)
        f32_rate, _ = _rate(
            lambda e_arr: twobody_moments_pallas(e_arr, *args32, ORDER, NQ),
            jnp.asarray(e0, jnp.float32),
            1e-6,
        )

    # primary: fastest ACCURACY-COMPLIANT path (dd ~1e-11 vs f64; f32 is
    # the ~1e-6 preview path and stays a detail entry)
    primary, primary_path = max(
        [(f64_rate, "f64-xla")] + ([(dd_rate, "dd-pallas")] if dd_rate else []),
    )
    vs = primary / BASELINE_MOMENTS_PER_SEC if BASELINE_MOMENTS_PER_SEC else 1.0

    print(
        json.dumps(
            {
                "metric": "nuclide-group-moments/sec",
                "value": round(primary, 1),
                "unit": "moments/s",
                "vs_baseline": round(vs, 4),
                "detail": {
                    "backend": jax.devices()[0].platform,
                    "device": str(jax.devices()[0]),
                    "tile": TILE,
                    "order": ORDER,
                    "groups": NG,
                    "iters": ITERS,
                    "path": primary_path,
                    "f64_moments_per_sec": round(f64_rate, 1),
                    "dd_pallas_moments_per_sec": round(dd_rate, 1) if dd_rate else None,
                    "f32_pallas_moments_per_sec": round(f32_rate, 1) if f32_rate else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
