"""Banded continuum/chi outputs == dense at roundoff (round 5).

The banded dispatch passes per-row (B+1)-boundary windows to the SAME
kernels (ops.continuum / ops.chi accept shared (G+1,) or per-row (T, B+1)
bounds); because each window covers its row's closed-form outgoing
support and the clamp convention puts out-of-domain mass in edge groups,
banding is a re-indexing of the same arithmetic — these tests pin the
equality and that banding actually ENGAGES on the fixtures it should.
"""

from __future__ import annotations

import numpy as np

from ndpp_tpu import banding
from ndpp_tpu import config as config_mod
from ndpp_tpu import groups
from ndpp_tpu.continuum_driver import continuum_reaction_moments
from ndpp_tpu.host.ace import synth

G361 = groups.get("uniform-lethargy-361")


def _banded_vs_dense(fn):
    """Run fn() with live banding (spying on partition), then banding off."""
    engaged = []
    real_part = banding.partition

    def spy(lo, hi, bounds, lo_bucket=16):
        r = real_part(lo, hi, bounds, lo_bucket)
        engaged.append(r is not None)
        return r

    banding.partition = spy
    try:
        banded = fn()
        banding.partition = lambda *a, **k: None
        dense = fn()
    finally:
        banding.partition = real_part
    return banded, dense, engaged


def _rxn_rows(name, n=10, emax=1.9e7):
    nuc = synth.build(name)
    rxn = next(iter(r for r in nuc.reactions.values() if r.energy_dists))
    thresh = max(nuc.energy[rxn.threshold_idx], 1e4)
    e_rows = np.exp(np.linspace(np.log(thresh * 1.3), np.log(emax), n))
    return nuc, rxn, e_rows


def _check(name, expect_engaged, order=3):
    nuc, rxn, e_rows = _rxn_rows(name)
    cfg = config_mod.RunConfig(legendre_order=order, temperatures=[293.6])

    banded, dense, engaged = _banded_vs_dense(
        lambda: continuum_reaction_moments(nuc, rxn, e_rows, G361, order, cfg)
    )
    if expect_engaged:
        assert any(engaged), f"banding never engaged on {name} at 361 groups"
    scale = np.abs(dense).max()
    np.testing.assert_allclose(banded, dense, rtol=1e-12, atol=1e-13 * scale)


def test_cm_kalbach_banded_matches_dense():
    _check("kalbach", expect_engaged=True)


def test_cm_tabular_banded_matches_dense():
    # the fixture's knot tables reach ~the whole structure, so the plan
    # correctly stays dense; the banded panels path is pinned by the
    # kernel-level test below
    _check("law61cm", expect_engaged=False)


def test_cm_tabular_kernel_banded_matches_dense():
    """panels-mode cm kernel: banded (T, L+1, B) == dense at roundoff on a
    narrow-support tabular-angle payload."""
    import jax.numpy as jnp

    from ndpp_tpu.ops.continuum import cm_moments_pointwise

    rng = np.random.default_rng(5)
    tt, ke, kmu = 6, 16, 8
    awr = 200.0
    e = np.exp(np.linspace(np.log(2e6), np.log(1.8e7), tt))
    kn = np.sort(rng.uniform(0.3, 0.5, (tt, ke)), axis=1) * e[:, None]
    pd = rng.uniform(0.2, 1.0, (tt, ke))
    muk = np.linspace(-1.0, 1.0, kmu)
    mup = rng.uniform(0.1, 1.0, (tt, ke, kmu))
    zeros = np.zeros_like(kn)
    emax = np.zeros(tt)
    bounds = G361.bounds

    part = banding.partition(*banding.support_cm(e, awr, kn), bounds)
    assert part is not None and part[0].all()
    _, b_w, g0 = part
    win = banding.window_bounds(bounds, g0, b_w)

    def call(b):
        return np.asarray(
            cm_moments_pointwise(
                jnp.asarray(e), jnp.asarray(kn), jnp.asarray(pd),
                jnp.asarray(zeros), jnp.asarray(zeros), jnp.asarray(muk),
                jnp.asarray(mup), jnp.asarray(emax), 0.0, jnp.asarray(b),
                awr, 3, 16, 8, "tabular", "tabular", True, 8, 0, "panels",
            )
        )

    dense = call(bounds)
    banded = banding.densify(call(win), g0, G361.ng)
    np.testing.assert_allclose(banded, dense, rtol=1e-11, atol=1e-12 * np.abs(dense).max())


def test_lab_tabular_banded_matches_dense():
    _check("law61", expect_engaged=True)


def test_nbody_banded_matches_dense():
    # n-body support is [0, emax] — wide; equality must hold whether or
    # not the plan engages (it normally returns None here)
    _check("nbody", expect_engaged=False)


def test_chi_banded_matches_dense():
    from ndpp_tpu.chi_driver import chi_collapse
    from ndpp_tpu.io.library import NuclideResult

    nuc = synth.build("u235")
    cfg = config_mod.RunConfig(legendre_order=0, temperatures=[293.6])
    e_rows = np.exp(np.linspace(np.log(1e2), np.log(1.9e7), 12))

    def run():
        res = NuclideResult(
            name=nuc.name, zaid=nuc.zaid, awr=nuc.awr, kT=nuc.kT,
            energy=e_rows, temperatures=np.array([293.6]),
            scatter=np.zeros((1, e_rows.size, 1, G361.ng)),
            sigma_scatter=np.ones(e_rows.size),
        )
        chi_collapse(res, nuc, G361, cfg)
        return res

    banded, dense, engaged = _banded_vs_dense(run)
    assert any(engaged), "chi banding never engaged on the u235 fixture"
    for attr in ("chi_prompt", "chi_delayed", "chi_total"):
        b = getattr(banded, attr, None)
        d = getattr(dense, attr, None)
        assert (b is None) == (d is None)
        if b is not None:
            np.testing.assert_allclose(b, d, rtol=1e-12, atol=1e-14)


def test_plan_window_covers_support():
    # property: for any support, every row's [g_lo, g_hi] sits inside its
    # window [g0, g0 + B] — the invariant the kernel equality relies on
    rng = np.random.default_rng(11)
    bounds = G361.bounds
    lo = rng.uniform(1e-2, 1e6, 64)
    hi = lo * rng.uniform(1.01, 50.0, 64)
    r = banding.plan(lo, hi, bounds)
    assert r is not None
    b_w, g0 = r
    g_lo = np.clip(np.searchsorted(bounds, lo, side="right") - 1, 0, G361.ng - 1)
    g_hi = np.clip(np.searchsorted(bounds, hi, side="left"), 1, G361.ng)
    assert np.all(g0 <= g_lo)
    assert np.all(g0 + b_w >= g_hi)
    win = banding.window_bounds(bounds, g0, b_w)
    assert win.shape == (64, b_w + 1)
    assert np.all(np.diff(win, axis=1) > 0)
