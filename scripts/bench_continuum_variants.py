#!/usr/bin/env python
"""Measure cm_moments_pointwise variants at the REAL production shape.

Uses stress000's Kalbach reaction (NE=2310, K padded 128) — the dispatch
that dominated the round-3 warm profile (wait.continuum ~40 s/nuclide) —
tiled at 256 rows like continuum_driver. Prints s/tile + moments/s per
variant and max rel error vs a high-quadrature reference.

Usage: python scripts/bench_continuum_variants.py [--variants base,nqy6,iso,...]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def setup(tile=256):
    from ndpp_tpu.host import unionize
    from ndpp_tpu.host.ace.synth import stress_nuclide
    from ndpp_tpu.host.prep_continuum import prepare_continuum
    from ndpp_tpu import groups

    nuc = stress_nuclide(0)
    rxn = nuc.reactions[91]
    ed = rxn.energy_dists[0]
    e_grid = nuc.energy
    prep = prepare_continuum(nuc, rxn, ed, e_grid, 5)
    # the TOP tile: rows where the threshold reaction is actually live
    # (below-threshold rows have trivial windows and zero applicability)
    sl = slice(prep.e.size - tile, prep.e.size)
    k16 = unionize.bucket_pow2(prep.e_knots.shape[1])
    kn = unionize.pad_to(prep.e_knots[sl], k16, axis=1)
    pd = unionize.pad_to(prep.pdf[sl], k16, axis=1)
    rr = unionize.pad_to(prep.r_rows[sl], k16, axis=1)
    aa = unionize.pad_to(prep.a_rows[sl], k16, axis=1)
    bounds = groups.get("uniform-lethargy-361").bounds
    return {
        "e": prep.e[sl].copy(), "kn": kn, "pd": pd, "rr": rr, "aa": aa,
        "bounds": bounds, "awr": nuc.awr, "k_real": prep.e_knots.shape[1],
    }


def run_variant(d, nq_w=8, nq_y=8, ksel=0, angular="kalbach", chunk=8, split="lagrange"):
    import jax
    import jax.numpy as jnp

    from ndpp_tpu.ops.continuum import cm_moments_pointwise

    tile = d["e"].size
    muk = jnp.asarray(np.array([-1.0, 1.0]))
    mup = jnp.zeros((tile, d["kn"].shape[1], 2))

    def call(pd):
        return cm_moments_pointwise(
            jnp.asarray(d["e"]), jnp.asarray(d["kn"]), pd,
            jnp.asarray(d["rr"]), jnp.asarray(d["aa"]), muk, mup,
            jnp.zeros(tile), 0.0, jnp.asarray(d["bounds"]), d["awr"], 5,
            nq_w, nq_y, angular, "tabular", True, chunk, ksel, split,
        )

    # DISTINCT inputs per timed dispatch: the axon remote layer elides
    # repeated identical executions, so identical-input timing is bogus
    pds = [jnp.asarray(d["pd"] * (1.0 + 1e-9 * i)) for i in range(5)]
    out = call(pds[0])
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    outs = [call(p) for p in pds[1:]]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(outs)
    moments = tile * 6 * (d["bounds"].size - 1)
    return np.asarray(out), dt, moments / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,win,nqy6,win_nqy6,iso")
    args = ap.parse_args()
    d = setup()
    from ndpp_tpu.continuum_driver import _window_knot_bound
    from ndpp_tpu.host import unionize

    kb = _window_knot_bound(d["e"], d["awr"], d["kn"][:, : d["k_real"]])
    kb = unionize.bucket_pow2(kb, lo=4) if kb else 0
    if kb >= d["kn"].shape[1]:
        kb = 0
    print(f"shape: tile={d['e'].size} K_real={d['k_real']} K_pad={d['kn'].shape[1]} window_bound={kb}", flush=True)

    variants = {
        "base": dict(),
        "win": dict(ksel=kb),
        "nqy6": dict(nq_y=6),
        "win_nqy6": dict(ksel=kb, nq_y=6),
        "win_nqy6_w6": dict(ksel=kb, nq_y=6, nq_w=6),
        "chunk16": dict(ksel=kb, chunk=16),
        "iso": dict(angular="isotropic"),
        "ref": dict(nq_w=16, nq_y=16),
    }
    want = [v for v in args.variants.split(",") if v]
    ref = None
    results = {}
    for name in want:
        out, dt, rate = run_variant(d, **variants[name])
        results[name] = out
        print(f"{name:14s} {dt:7.3f} s/tile  {rate:12.3g} moments/s", flush=True)
    if "ref" in results:
        ref = results["ref"]
        for name, out in results.items():
            if name in ("ref", "iso"):
                continue
            denom = np.maximum(np.abs(ref), np.abs(ref[:, 0:1, :]).max(axis=2, keepdims=True) * 1e-9)
            rel = np.abs(out - ref) / denom
            print(f"err[{name}] max_rel(f0-scaled) = {rel.max():.3g}", flush=True)


if __name__ == "__main__":
    main()
