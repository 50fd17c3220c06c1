"""Independent-formula spot oracles for law 44 (Kalbach-Mann) and law 61.

Round-1 verdict, Weak #6: the standing continuum oracle integrates
adaptively but consumes the SAME host-prep outputs as the device kernels
(oracle/continuum.py reads ContinuumPrepared), so a prep bug passes both.
These tests close that common-mode gap: each computes the (L+1, G) moment
row at one incident energy straight from the fixture's RAW law tables
using only the published formulas (SURVEY.md section 8.1) —
``host/prep_continuum`` is never imported here.

Published definitions used (ENDF-6 / ACE, SURVEY.md sections 8.1-8.2):

  law 44 (CM):  p(mu|E,E') = a / (2 sinh a) * [cosh(a mu) + r sinh(a mu)]
                (normalized over mu in [-1,1]); E'_cm ~ tabulated pdf with
                r(E'), a(E') interpolated lin-lin on the outgoing grid.
                CM->lab:  s = sqrt(E)/(A+1),
                          E'_lab = E'_cm + s^2 + 2 s sqrt(E'_cm) mu_cm,
                          mu_lab = (sqrt(E'_cm) mu_cm + s) / sqrt(E'_lab).
  law 61 (lab): joint f(E', mu) = p(E') p(mu|E'), angular tables attached
                to outgoing knots, lin-lin in E' between knots (moments are
                linear functionals, so lin-lin pdf interpolation == lin-lin
                moment interpolation); isotropic where the table is absent.

Both fixtures put the probed incident energy EXACTLY on the law's incident
grid, so unit-base interpolation is the identity and any disagreement
implicates the prep/kernel algebra, not incident interpolation.
"""

import numpy as np
import pytest
from numpy.polynomial.legendre import leggauss
from scipy.special import eval_legendre

from ndpp_tpu import config as config_mod
from ndpp_tpu import groups
from ndpp_tpu.continuum_driver import continuum_reaction_moments
from ndpp_tpu.host.ace import synth

ORDER = 3


def _cfg():
    cfg = config_mod.RunConfig(legendre_order=ORDER, temperatures=[293.6])
    cfg.device.e_tile = 64
    return cfg


def _effective_bounds(gs):
    eff = gs.bounds.astype(np.float64).copy()
    eff[0], eff[-1] = -np.inf, np.inf  # clamp_outside=True edge semantics
    return eff


# --------------------------------------------------------------------------
# law 44


def _kalbach_mu_pdf(mu, r, a):
    return a / (2.0 * np.sinh(a)) * (np.cosh(a * mu) + r * np.sinh(a * mu))


def _kalbach_spot_oracle(tab, e0, awr, gs, order):
    """(L+1, G) from the raw ContinuousTable at incident e0 (CM frame).

    Iterated integral in the PUBLISHED variables (outer E'_cm, inner
    mu_cm) — the device kernel works pointwise in E'_lab with sqrt-window
    algebra, and the standing oracle integrates outer-mu/inner-E', so this
    is a third, independent integration structure.
    """
    s = np.sqrt(e0) / (awr + 1.0)
    eo, pdf, rr, aa = tab.e_out, tab.pdf, tab.r, tab.a
    eff = _effective_bounds(gs)
    bounds = gs.bounds

    # outer subdivision: spectrum knots + E'_cm values where a group
    # boundary enters/leaves the kinematic reach [(y-s)^2, (y+s)^2]
    cuts = set(eo.tolist())
    for eb in bounds:
        yb = np.sqrt(max(eb, 0.0))
        for y in (yb - s, yb + s):
            ec = y * y
            if y > 0 and eo[0] < ec < eo[-1]:
                cuts.add(float(ec))
    cuts = np.array(sorted(cuts))

    xg, wg = leggauss(32)
    out = np.zeros((order + 1, gs.ng))
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        if hi - lo <= 0:
            continue
        ec = 0.5 * (hi + lo) + 0.5 * (hi - lo) * xg  # outer nodes
        wc = 0.5 * (hi - lo) * wg
        p_e = np.interp(ec, eo, pdf)
        r_e = np.interp(ec, eo, rr)
        a_e = np.interp(ec, eo, aa)
        y = np.sqrt(ec)
        for g in range(gs.ng):
            # mu interval where E'_lab(mu) lands in group g, per outer node
            glo, ghi = eff[g], eff[g + 1]
            mu1 = np.clip((glo - ec - s * s) / (2.0 * s * y), -1.0, 1.0)
            mu2 = np.clip((ghi - ec - s * s) / (2.0 * s * y), -1.0, 1.0)
            width = mu2 - mu1
            act = width > 0
            if not np.any(act):
                continue
            mu = 0.5 * (mu2 + mu1)[act, None] + 0.5 * width[act, None] * xg[None, :]
            wmu = 0.5 * width[act, None] * wg[None, :]
            pmu = _kalbach_mu_pdf(mu, r_e[act, None], a_e[act, None])
            elab = ec[act, None] + s * s + 2.0 * s * y[act, None] * mu
            mulab = (y[act, None] * mu + s) / np.sqrt(elab)
            base = (wc[act, None] * p_e[act, None]) * wmu * pmu
            for l in range(order + 1):
                out[l, g] += np.sum(base * eval_legendre(l, mulab))
    return out


def test_law44_spot_oracle_from_published_formula():
    nuc = synth.kalbach_like()
    rxn = nuc.reactions[91]
    law = rxn.energy_dists[0].data
    e0 = float(law.energies[1])  # exactly on the law's incident grid (8 MeV)
    tab = law.tables[1]
    gs = groups.get("uniform-lethargy-47")

    ref = _kalbach_spot_oracle(tab, e0, nuc.awr, gs, ORDER)
    assert abs(ref[0].sum() - 1.0) < 1e-10  # oracle self-check: f0 sums to 1

    e_grid = np.array([4.0e6, e0, 1.6e7])
    got = continuum_reaction_moments(nuc, rxn, e_grid, gs, ORDER, _cfg())[1]
    np.testing.assert_allclose(got, ref, atol=1e-8, rtol=0)


# --------------------------------------------------------------------------
# law 61


def _angular_moment(table, order):
    """m_l = int P_l(mu) p(mu) dmu for one tabulated angular pdf (lin-lin),
    integrated panel-exactly with GL (linear x P_l is a degree l+1 poly)."""
    if table is None:  # isotropic entry
        return np.array([1.0] + [0.0] * order)
    mu, p = np.asarray(table.mu), np.asarray(table.pdf)
    xg, wg = leggauss(16)
    m = np.zeros(order + 1)
    for x0, x1, y0, y1 in zip(mu[:-1], mu[1:], p[:-1], p[1:]):
        if x1 - x0 <= 0:
            continue
        xm = 0.5 * (x1 + x0) + 0.5 * (x1 - x0) * xg
        wm = 0.5 * (x1 - x0) * wg
        ym = y0 + (xm - x0) / (x1 - x0) * (y1 - y0)
        for l in range(order + 1):
            m[l] += np.sum(wm * ym * eval_legendre(l, xm))
    return m


def _law61_spot_oracle(tab, gs, order):
    """(L+1, G) for a lab-frame law-61 table: integral over each group of
    p(E') * m_l(E'), both piecewise linear on the outgoing grid — the
    product is quadratic per panel, integrated EXACTLY by Simpson."""
    eo, pdf = tab.e_out, tab.pdf
    mk = np.stack([_angular_moment(t, order) for t in tab.angular])  # (K, L+1)
    eff = _effective_bounds(gs)
    out = np.zeros((order + 1, gs.ng))
    cuts = np.unique(np.concatenate([eo, np.clip(gs.bounds, eo[0], eo[-1])]))
    for x0, x1 in zip(cuts[:-1], cuts[1:]):
        if x1 - x0 <= 0:
            continue
        g = int(np.searchsorted(eff, 0.5 * (x0 + x1), side="right") - 1)
        g = min(max(g, 0), gs.ng - 1)
        xs = np.array([x0, 0.5 * (x0 + x1), x1])
        p3 = np.interp(xs, eo, pdf)
        for l in range(order + 1):
            m3 = np.interp(xs, eo, mk[:, l])
            y = p3 * m3  # quadratic in x on this panel
            out[l, g] += (x1 - x0) / 6.0 * (y[0] + 4.0 * y[1] + y[2])
    return out


def test_law61_spot_oracle_from_published_formula():
    nuc = synth.law61_like()
    rxn = nuc.reactions[22]
    law = rxn.energy_dists[0].data
    e0 = float(law.energies[1])  # exactly on the law's incident grid (10 MeV)
    tab = law.tables[1]
    gs = groups.get("uniform-lethargy-47")

    ref = _law61_spot_oracle(tab, gs, ORDER)
    assert abs(ref[0].sum() - 1.0) < 1e-10

    e_grid = np.array([5.0e6, e0, 1.8e7])
    got = continuum_reaction_moments(nuc, rxn, e_grid, gs, ORDER, _cfg())[1]
    np.testing.assert_allclose(got, ref, atol=1e-8, rtol=0)
