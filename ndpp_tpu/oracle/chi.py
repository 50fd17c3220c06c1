"""Adaptive-quadrature oracle for spectrum group collapse.

Analytic laws integrate the RAW pdf formulas (Maxwell/evaporation/Watt)
with scipy.integrate.quad — fully independent of the closed-form erf
algebra in ops.chi. Tabular pdfs integrate the shared piecewise-linear data
definition with quad + knot break-points.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad

from ndpp_tpu.host.prep import _eval_limit


def _raw_pdf(law: int, theta: float, b: float):
    if law == 7:
        return lambda x: np.sqrt(x) * np.exp(-x / theta)
    if law == 9:
        return lambda x: x * np.exp(-x / theta)
    if law == 11:
        return lambda x: np.exp(-x / theta) * np.sinh(np.sqrt(b * x))
    raise ValueError(law)


def analytic_group_fractions_oracle(
    e: float, theta: float, b: float, u: float, bounds: np.ndarray, law: int, clamp: bool = True
) -> np.ndarray:
    emax = max(e - u, 0.0)
    ng = bounds.size - 1
    out = np.zeros(ng)
    if emax <= 0:
        return out
    pdf = _raw_pdf(law, theta, b)
    norm, _ = quad(pdf, 0.0, emax, limit=200, epsabs=1e-14, epsrel=1e-13)
    eff = bounds.astype(np.float64).copy()
    if clamp:
        eff[0], eff[-1] = -np.inf, np.inf
    for g in range(ng):
        lo = min(max(eff[g], 0.0), emax)
        hi = min(max(eff[g + 1], 0.0), emax)
        if hi <= lo:
            continue
        val, _ = quad(pdf, lo, hi, limit=200, epsabs=1e-14, epsrel=1e-13)
        out[g] = val / norm
    return out


def tabular_group_fractions_oracle(
    e_knots: np.ndarray, pdf: np.ndarray, bounds: np.ndarray, clamp: bool = True
) -> np.ndarray:
    """Group integrals of one piecewise-linear pdf row via adaptive quad."""
    ng = bounds.size - 1
    out = np.zeros(ng)
    eff = bounds.astype(np.float64).copy()
    if clamp:
        eff[0], eff[-1] = -np.inf, np.inf

    def f(x):
        return _eval_limit(e_knots, pdf, np.asarray([x]), "right")[0]

    for g in range(ng):
        lo = min(max(eff[g], e_knots[0]), e_knots[-1])
        hi = min(max(eff[g + 1], e_knots[0]), e_knots[-1])
        if hi <= lo:
            continue
        pts = np.unique(e_knots[(e_knots > lo) & (e_knots < hi)])
        val, _ = quad(f, lo, hi, points=pts if pts.size else None, limit=400, epsabs=1e-14, epsrel=1e-13)
        out[g] = val
    return out
