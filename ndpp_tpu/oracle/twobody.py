"""Adaptive-quadrature oracle for two-body group-transfer moments.

Same physical definition as ops.twobody (shared kinematics constants and
the shared p(mu|E) data definition in host.prep.pdf_at_energy), but the
integration path is scipy.integrate.quad per (group, order) with knot
break-points — structurally independent of the device kernel's
sorted-edges + fixed-GL scheme.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad
from scipy.special import eval_legendre

from ndpp_tpu.host.ace.records import AngularDistribution, Nuclide, Reaction
from ndpp_tpu.host.prep import _eval_limit, pdf_at_energy
from ndpp_tpu.ops.twobody import twobody_constants


def twobody_moments_oracle(
    nuc: Nuclide,
    rxn: Reaction,
    e_ev: float,
    bounds: np.ndarray,
    order: int,
    renormalize: bool = True,
    clamp: bool = True,
) -> np.ndarray:
    """f_{l,g'}(E) for one two-body reaction at one incident energy: (L+1, G)."""
    a = nuc.awr
    q = rxn.q if rxn.mt != 2 else 0.0
    c1, c2 = twobody_constants(a, q)
    ng = bounds.size - 1
    out = np.zeros((order + 1, ng))
    ecm = c2 * (e_ev - c1)
    if ecm <= 0.0:
        return out

    dist = rxn.angular
    if dist is None:
        dist = AngularDistribution.isotropic(1e-5, 2e7)
    x, y = pdf_at_energy(dist, e_ev)
    if renormalize:
        norm = np.sum(0.5 * (y[1:] + y[:-1]) * np.diff(x))
        y = y / norm

    ap1 = a + 1.0
    base = ecm + e_ev / ap1**2
    slope = 2.0 * np.sqrt(e_ev * ecm) / ap1

    def pdf(mu):
        return _eval_limit(x, y, np.asarray([mu]), "right")[0]

    def mu_lab(mu):
        elab = base + slope * mu
        return min(1.0, max(-1.0, mu * np.sqrt(ecm / elab) + np.sqrt(e_ev / elab) / ap1))

    eff_bounds = bounds.astype(np.float64).copy()
    if clamp:
        eff_bounds[0], eff_bounds[-1] = -np.inf, np.inf
    brk = np.clip((eff_bounds - base) / slope, -1.0, 1.0)
    for g in range(ng):
        lo, hi = brk[g], brk[g + 1]
        if hi <= lo:
            continue
        interior = x[(x > lo) & (x < hi)]
        pts = np.unique(interior)
        for l in range(order + 1):

            def f(mu, l=l):
                return pdf(mu) * eval_legendre(l, mu_lab(mu))

            val, _ = quad(f, lo, hi, points=pts if pts.size else None, limit=400, epsabs=1e-13, epsrel=1e-12)
            out[l, g] = val
    return out
