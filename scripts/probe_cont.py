#!/usr/bin/env python
"""Ablate cm_moments_pointwise at bench.py's exact continuum shape.

Probe-chained timing (the honest methodology on the axon backend: every
dispatch's first element folds into ONE fetched scalar array, so
execution is forced while cross-dispatch pipelining is preserved).

Usage: python scripts/probe_cont.py var1 var2 ...   (default: prod)
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax.numpy as jnp

    import bench
    from ndpp_tpu import groups
    from ndpp_tpu.ops.continuum import cm_moments_pointwise
    from ndpp_tpu.continuum_driver import _window_knot_bound

    import os
    rows, k = int(os.environ.get("ROWS", 256)), 64
    awr = 89.132
    e = np.geomspace(4e6, 2e7, rows)
    emax_r = (e - 2e6) * awr / (awr + 1.0)
    kn = np.linspace(1e3, emax_r, k, axis=-1)
    pd = kn * np.exp(-kn / (emax_r[:, None] / 4.0))
    pd /= np.trapezoid(pd, kn, axis=1)[:, None]
    rr = np.full((rows, k), 0.3)
    aa = 0.2 + 1.5 * kn / np.maximum(emax_r[:, None], 1.0)
    bounds = groups.get("uniform-lethargy-361").bounds
    muk = jnp.asarray(np.array([-1.0, 1.0]))
    mup = jnp.zeros((rows, k, 2))
    moments = rows * 6 * (bounds.size - 1)
    args = (
        jnp.asarray(kn), jnp.asarray(pd), jnp.asarray(rr), jnp.asarray(aa),
        muk, mup, jnp.zeros(rows), 0.0, jnp.asarray(bounds),
    )
    from ndpp_tpu.continuum_driver import quantize_ksel

    ksel = quantize_ksel(_window_knot_bound(e, awr, kn), k)

    variants = {
        "prod": dict(nq_w=10, nq_y=7, angular="kalbach", chunk=8, ksel=ksel, split="lagrange"),
        "iso": dict(nq_w=10, nq_y=7, angular="isotropic", chunk=8, ksel=ksel, split="lagrange"),
        "nqy8": dict(nq_w=10, nq_y=8, angular="kalbach", chunk=8, ksel=ksel, split="lagrange"),
        "nqw8": dict(nq_w=8, nq_y=7, angular="kalbach", chunk=8, ksel=ksel, split="lagrange"),
        "chunk16": dict(nq_w=10, nq_y=7, angular="kalbach", chunk=16, ksel=ksel, split="lagrange"),
        "chunk4": dict(nq_w=10, nq_y=7, angular="kalbach", chunk=4, ksel=ksel, split="lagrange"),
        "nowin": dict(nq_w=10, nq_y=7, angular="kalbach", chunk=8, ksel=0, split="lagrange"),
        "panels": dict(nq_w=10, nq_y=7, angular="kalbach", chunk=8, ksel=ksel, split="panels"),
        # timing-only ablations (order0 / undersampled inner nodes)
        "order0": dict(nq_w=10, nq_y=7, angular="kalbach", chunk=8, ksel=ksel, split="lagrange", order=0),
        "nqy4": dict(nq_w=10, nq_y=4, angular="kalbach", chunk=8, ksel=ksel, split="lagrange"),
        "ksel4": dict(nq_w=10, nq_y=7, angular="kalbach", chunk=8, ksel=4, split="lagrange"),
        "iso0": dict(nq_w=10, nq_y=7, angular="isotropic", chunk=8, ksel=ksel, split="lagrange", order=0),
        "iso0_nqy1": dict(nq_w=10, nq_y=1, angular="isotropic", chunk=8, ksel=ksel, split="lagrange", order=0),
    }
    for name in (sys.argv[1:] or ["prod"]):
        v = variants[name]
        order = v.get("order", 5)
        m = rows * (order + 1) * (bounds.size - 1)
        rate, dt = bench._rate_pipelined(
            lambda e_arr, v=v, order=order: cm_moments_pointwise(
                e_arr, *args, awr, order, v["nq_w"], v["nq_y"], v["angular"],
                "tabular", True, v["chunk"], v["ksel"], v["split"],
            ),
            jnp.asarray(e),
            m,
        )
        print(f"{name:10s} {rate:12.4g} moments/s   ({dt:.3f} s / 6 calls)", flush=True)


if __name__ == "__main__":
    main()
