"""Adaptive 2D oracle for CM-frame continuum moments.

Same physical definition as ops.continuum.cm_moments (shared host-prepped
data rows = the data definition), but integration is nested adaptive
scipy.integrate.quad: outer over mu_cm, inner over E'_cm restricted to the
lab-group region (closed-form both-root boundaries per mu) — structurally
independent of the device kernel's fixed-GL panel scheme.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad
from scipy.special import beta as beta_fn
from scipy.special import eval_legendre

from ndpp_tpu.host.prep import _eval_limit
from ndpp_tpu.host.prep_continuum import ContinuumPrepared


def _row_interp(knots: np.ndarray, vals: np.ndarray, x: float) -> float:
    return _eval_limit(knots, vals, np.asarray([x]), "right")[0]


def cm_moments_oracle(
    prep: ContinuumPrepared,
    row: int,
    e_ev: float,
    awr: float,
    bounds: np.ndarray,
    order: int,
    clamp: bool = True,
) -> np.ndarray:
    """(L+1, G) for one incident-energy row of a ContinuumPrepared."""
    s = np.sqrt(e_ev) / (awr + 1.0)
    ng = bounds.size - 1
    eff = bounds.astype(np.float64).copy()
    if clamp:
        eff[0], eff[-1] = -np.inf, np.inf

    if prep.kind == "cm-nbody":
        emax = float(prep.nbody_emax[row])
        if emax <= 0:
            return np.zeros((order + 1, ng))
        expo = float(prep.nbody_expo)
        cnorm = 1.0 / (beta_fn(1.5, expo + 1.0) * emax ** (expo + 1.5))
        kn = np.array([0.0, emax])

        def pdf_e(x):
            return cnorm * np.sqrt(max(x, 0.0)) * max(emax - x, 0.0) ** expo

        def pdf_ang(mu, x):
            return 0.5

    else:
        kn = prep.e_knots[row]
        pdfrow = prep.pdf[row]

        def pdf_e(x):
            return _row_interp(kn, pdfrow, x)

        if prep.kind == "cm-kalbach":
            rrow, arow = prep.r_rows[row], prep.a_rows[row]

            def pdf_ang(mu, x):
                r = _row_interp(kn, rrow, x)
                a = max(_row_interp(kn, arow, x), 1e-12)
                return a / (2.0 * np.sinh(a)) * (np.cosh(a * mu) + r * np.sinh(a * mu))

        else:  # cm-tabular
            muk = prep.mu_knots
            mup = prep.mu_pdf[row]  # (K, KMU)

            def pdf_ang(mu, x):
                j = int(np.clip(np.searchsorted(muk, mu, side="right") - 1, 0, muk.size - 2))
                t = (mu - muk[j]) / (muk[j + 1] - muk[j])
                col = mup[:, j] + t * (mup[:, j + 1] - mup[:, j])
                return _row_interp(kn, col, x)

    x_lo, x_hi = float(kn[0]), float(kn[-1])
    out = np.zeros((order + 1, ng))

    def regions_for(mu: float, g: int) -> list[tuple[float, float]]:
        """E'_cm intervals mapping into lab group g at this mu."""

        def y_of(ebnd):
            if not np.isfinite(ebnd):
                return None  # +-inf handled by interval logic below
            disc = ebnd - s * s * (1.0 - mu * mu)
            if disc < 0:
                return ()
            r = np.sqrt(disc)
            return (-mu * s - r, -mu * s + r)

        # E'lab(y) = (y + mu s)^2 + s^2(1-mu^2): region E'lab <= b is the
        # y-interval between the two roots; E'lab in [b0, b1] is the set
        # difference, up to two y-intervals.
        def interval_below(ebnd):
            if not np.isfinite(ebnd):
                return (0.0, np.inf) if ebnd > 0 else None
            roots = y_of(ebnd)
            if roots == ():
                return None
            y0, y1 = roots
            return (max(y0, 0.0), max(y1, 0.0))

        lo_int = interval_below(eff[g])
        hi_int = interval_below(eff[g + 1])
        if hi_int is None:
            return []
        segs = []
        h0, h1 = hi_int
        if lo_int is None:
            segs = [(h0, h1)]
        else:
            l0, l1 = lo_int
            if h0 < l0:
                segs.append((h0, l0))
            if l1 < h1:
                segs.append((l1, h1))
        out_r = []
        ylo, yhi = np.sqrt(max(x_lo, 0.0)), np.sqrt(max(x_hi, 0.0))
        for a, b in segs:
            a2, b2 = max(a, ylo), min(b, yhi)
            if b2 > a2 + 0.0:
                out_r.append((a2 * a2, b2 * b2))
        return out_r

    # outer-mu break-points: |mu| where the fold minimum s^2(1-mu^2) crosses a
    # group boundary — low lab groups are reachable only inside a sliver near
    # mu = -1 that adaptive quad cannot find unaided
    mu_pts = []
    for bnd in bounds:
        if np.isfinite(bnd) and 0.0 < bnd < s * s:
            m = np.sqrt(1.0 - bnd / (s * s))
            mu_pts.extend([-m, m])
    if prep.kind == "cm-tabular":
        # the tabulated angular pdf is piecewise linear in mu: its knots are
        # C0 kinks of the outer integrand that adaptive quad must be told about
        mu_pts.extend(float(m) for m in prep.mu_knots if -1.0 < m < 1.0)
    mu_pts = np.unique(np.clip(np.asarray(mu_pts), -1.0 + 1e-15, 1.0 - 1e-15)) if mu_pts else None

    for g in range(ng):
        for l in range(order + 1):

            def outer(mu, g=g, l=l):
                total = 0.0
                for xa, xb in regions_for(mu, g):

                    def inner(x):
                        elab = x + 2.0 * mu * s * np.sqrt(max(x, 0.0)) + s * s
                        mul = (mu * np.sqrt(max(x, 0.0)) + s) / np.sqrt(max(elab, 1e-300))
                        mul = min(1.0, max(-1.0, mul))
                        return pdf_e(x) * pdf_ang(mu, x) * eval_legendre(l, mul)

                    pts = np.unique(kn[(kn > xa) & (kn < xb)])
                    val, _ = quad(
                        inner, xa, xb, points=pts if pts.size else None, limit=200, epsabs=1e-12, epsrel=1e-11
                    )
                    total += val
                return total

            val, _ = quad(
                outer,
                -1.0,
                1.0,
                points=mu_pts if mu_pts is not None and mu_pts.size else None,
                limit=400,
                epsabs=1e-11,
                epsrel=1e-10,
            )
            out[l, g] = val
    return out


def lab_tabular_moments_oracle(
    prep: ContinuumPrepared, row: int, bounds: np.ndarray, order: int, clamp: bool = True
) -> np.ndarray:
    """(L+1, G) for one row of a lab-tabular preparation."""
    kn = prep.e_knots[row]
    pdfrow = prep.pdf[row]
    moms = prep.mom_knots[row]  # (K, L+1)
    ng = bounds.size - 1
    eff = bounds.astype(np.float64).copy()
    if clamp:
        eff[0], eff[-1] = -np.inf, np.inf
    out = np.zeros((order + 1, ng))
    for g in range(ng):
        lo = min(max(eff[g], kn[0]), kn[-1])
        hi = min(max(eff[g + 1], kn[0]), kn[-1])
        if hi <= lo:
            continue
        pts = np.unique(kn[(kn > lo) & (kn < hi)])
        for l in range(order + 1):

            def f(x, l=l):
                return _row_interp(kn, pdfrow, x) * _row_interp(kn, moms[:, l], x)

            val, _ = quad(f, lo, hi, points=pts if pts.size else None, limit=400, epsabs=1e-13, epsrel=1e-12)
            out[l, g] = val
    return out
