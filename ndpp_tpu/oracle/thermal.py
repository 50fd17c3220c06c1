"""Slow independent references for the thermal S(alpha,beta) kernels.

Structurally different from ops/thermal.py (adaptive scipy quadrature for
the continuous path; straight per-element python/numpy sums elsewhere) so
agreement is evidence, not tautology (SURVEY.md section 4.3).
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad

from ndpp_tpu.host.ace.thermal import ThermalInelasticContinuous, ThermalInelasticDiscrete, ThermalTable
from ndpp_tpu.ops.legendre import legendre_all_np


def continuous_moments_oracle(
    tab: ThermalTable, i: int, bounds: np.ndarray, order: int
) -> np.ndarray:
    """Group moments at the table's i-th incident energy: (L+1, G)."""
    inel = tab.inelastic
    assert isinstance(inel, ThermalInelasticContinuous)
    e = inel.e_out[i]
    pdf = inel.pdf[i]
    am = legendre_all_np(inel.mu[i], order).mean(axis=1)  # (NP, L+1)
    ng = bounds.size - 1
    out = np.zeros((order + 1, ng))
    for l in range(order + 1):
        def integrand(x, l=l):
            p = np.interp(x, e, pdf, left=0.0, right=0.0)
            a = np.interp(x, e, am[:, l])
            return p * a

        for g in range(ng):
            lo, hi = max(bounds[g], e[0]), min(bounds[g + 1], e[-1])
            if hi <= lo:
                continue
            pts = e[(e > lo) & (e < hi)]
            val, _ = quad(integrand, lo, hi, points=pts.tolist() if pts.size < 40 else None,
                          limit=200, epsabs=1e-13, epsrel=1e-12)
            out[l, g] = val
    return out


def discrete_moments_oracle(tab: ThermalTable, i: int, bounds: np.ndarray, order: int) -> np.ndarray:
    """(L+1, G) by direct per-line summation (clamped into edge groups)."""
    inel = tab.inelastic
    assert isinstance(inel, ThermalInelasticDiscrete)
    w = inel.weights()
    ng = bounds.size - 1
    out = np.zeros((order + 1, ng))
    for j in range(inel.e_out.shape[1]):
        g = int(np.clip(np.searchsorted(bounds, inel.e_out[i, j], side="right") - 1, 0, ng - 1))
        pl = legendre_all_np(inel.mu[i, j], order).mean(axis=0)
        out[:, g] += w[j] * pl
    return out


def coherent_elastic_oracle(e: float, edges: np.ndarray, cum: np.ndarray, order: int) -> np.ndarray:
    """Moment vector (L+1,) at incident energy e from cumulative sums."""
    s = np.diff(np.concatenate([[0.0], cum]))
    act = edges <= e
    if not np.any(act):
        return np.zeros(order + 1)
    mu = 1.0 - 2.0 * edges[act] / e
    pl = legendre_all_np(mu, order)  # (K, L+1)
    return (s[act, None] * pl).sum(axis=0) / s[act].sum()
