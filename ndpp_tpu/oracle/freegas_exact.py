"""High-trust free-gas references for the hard (A ~ 1, E <~ kT) regime.

The grouped device kernel's Laurent closed form cancels catastrophically
when a group window reaches y' << V_cm (fine thermal structures), and the
legacy (v_r, V_cm) numpy oracle tops out around 1e-7 self-convergence
there — neither can anchor the 1e-8 bar. This module anchors it two ways,
both built on the pointwise reduction (same physics as
ops.freegas.freegas_moments_pointwise, numerically independent):

  dF_l/dE'(y') = e^{beta^2 v^2/A} / (4 gamma)
                 * int dv_r v_r e^{-beta^2 v_r^2/(A+1)}
                 * int_{c in [max(|y-u|,|v-u|), min(y+u, v+u)]}
                       e^{-q c^2} P_l(c_a) P_l(c_b) dc
  with u = gamma v_r, q = beta^2 (A+1)/A,
  c_a = (v^2 + c^2 - u^2)/(2 v c), c_b = (y^2 + c^2 - u^2)/(2 y c)

  (prefactors cancel in the normalized ratio; the v_r integrand has the
  closed-form kinks {|v - y|, v + y}/(2 gamma) and y/gamma)

- f0_groups_exact: l = 0 in pure f64 — the inner c-integral is a single
  erf difference (P_0 = 1), the v_r and y integrals are adaptive with the
  kink points supplied. Absolute anchor for every group at ~1e-11.
- moments_dense: all l via dense vectorized f64 quadrature of the smooth
  c-integrand (no expansion, no cancellation), refinement-verified per
  group. Meant for spot/full-structure reference checks in tests.

Self-checks: f0 over a covering window must integrate to 1 and the same
quadrature reproduces the analytic Doppler sigma_eff ratio.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad
from scipy.special import erf

from ndpp_tpu.ops.legendre import gl_nodes_weights, legendre_all_np


def _vr_panels(v: float, y: float, gamma: float, beta: float, n_fill: int = 25) -> np.ndarray:
    lo = max(0.0, v - 9.0 / beta)
    hi = v + 9.0 / beta
    cand = [v + np.array([-8, -6, -4, -3, -2, -1.5, -1, -0.5, 0, 0.5, 1, 1.5, 2, 3, 4, 6, 8]) / beta]
    cand.append(np.array([abs(v - y), v + y]) / (2.0 * gamma))
    cand.append(np.array([y / gamma]))
    cand.append(np.linspace(lo, hi, n_fill))
    return np.unique(np.clip(np.concatenate(cand), lo, hi))


def _df0_dy(y: float, v: float, awr: float, kt: float, nq: int = 24) -> float:
    """dF_0/dy (unnormalized; includes the dE' = 2y dy factor)."""
    gamma = awr / (awr + 1.0)
    beta = np.sqrt(awr / kt)
    q = beta * beta * (awr + 1.0) / awr
    edges = _vr_panels(v, y, gamma, beta)
    xq, wq = gl_nodes_weights(nq)
    mid = 0.5 * (edges[1:] + edges[:-1])
    half = 0.5 * (edges[1:] - edges[:-1])
    vr = (mid[:, None] + half[:, None] * xq[None, :]).ravel()
    wr = (half[:, None] * wq[None, :]).ravel()
    u = gamma * vr
    lo = np.maximum(np.abs(y - u), np.abs(v - u))
    hi = np.minimum(y + u, v + u)
    ok = hi > lo
    sq = np.sqrt(q)
    inner = np.where(ok, 0.5 * np.sqrt(np.pi / q) * (erf(sq * hi) - erf(sq * lo)), 0.0)
    w_vr = vr * vr * np.exp(-(beta * beta) * (vr * vr / (awr + 1.0) - v * v / awr)) / (4.0 * u)
    # the 1/c from the E'-density cancels the c weight factor; dE' = 2y dy
    return float(np.sum(wr * w_vr * inner) * 2.0 * y)


def _den(v: float, awr: float, kt: float, nq: int = 24) -> float:
    """Total kernel weight (same integrand, full c and y range)."""
    gamma = awr / (awr + 1.0)
    beta = np.sqrt(awr / kt)
    q = beta * beta * (awr + 1.0) / awr
    edges = _vr_panels(v, v, gamma, beta)
    xq, wq = gl_nodes_weights(nq)
    mid = 0.5 * (edges[1:] + edges[:-1])
    half = 0.5 * (edges[1:] - edges[:-1])
    vr = (mid[:, None] + half[:, None] * xq[None, :]).ravel()
    wr = (half[:, None] * wq[None, :]).ravel()
    u = gamma * vr
    lo = np.abs(v - u)
    hi = v + u
    # full-range c-integral of c e^{-q c^2}: closed form
    inner = (np.exp(-q * lo * lo) - np.exp(-q * hi * hi)) / (2.0 * q)
    w_vr = vr * vr * np.exp(-(beta * beta) * (vr * vr / (awr + 1.0) - v * v / awr))
    return float(np.sum(wr * w_vr * inner))


def sigma_eff_ratio_exact(e: float, awr: float, kt: float) -> float:
    """Analytic Doppler-broadened sigma_eff/sigma_free (validation anchor)."""
    x = np.sqrt(awr * e / kt)
    return (1.0 + 0.5 / (x * x)) * erf(x) + np.exp(-x * x) / (np.sqrt(np.pi) * x)


def f0_groups_exact(e: float, awr: float, kt: float, bounds: np.ndarray, clamp: bool = True) -> np.ndarray:
    """(G,) exact f_{0,g'} in f64: adaptive y-integral of the erf-closed form.

    Self-validated: the same machinery must reproduce the analytic
    sigma_eff ratio to 1e-10 (asserted).
    """
    v = float(np.sqrt(e))
    gamma = awr / (awr + 1.0)
    beta = np.sqrt(awr / kt)
    den = _den(v, awr, kt)
    # self-check against the analytic Doppler ratio:
    #   vbar_r/v = 2 beta^3 N / (sqrt(pi) gamma v^2) with N the (vr, c)
    #   weight integral carrying exp(+beta^2 v^2/A)... the _den integrand
    #   already folds the constant exp factor in, so rebuild the ratio:
    n_plain = den * np.exp(-(beta * beta) * v * v / awr)
    ratio = 2.0 * beta**3 * n_plain * np.exp(beta * beta * v * v / awr) / (np.sqrt(np.pi) * gamma * v * v)
    # (the two exp factors cancel; kept explicit for clarity)
    assert abs(ratio / sigma_eff_ratio_exact(e, awr, kt) - 1.0) < 1e-9, "freegas f0 anchor: sigma_eff self-check failed"

    sb = np.sqrt(np.maximum(bounds, 0.0)).astype(np.float64)
    y_max = v + 2.0 * gamma * (v + 9.0 / beta)  # kinematic reach of the v_r window
    if clamp:
        sb = sb.copy()
        sb[0] = 0.0
        sb[-1] = max(sb[-1], y_max * 1.01)
    ng = sb.size - 1
    out = np.zeros(ng)
    for g in range(ng):
        lo, hi = float(sb[g]), float(min(sb[g + 1], y_max * 1.005))
        if hi <= lo:
            continue
        pts = [p for p in (v,) if lo < p < hi]
        val, _ = quad(
            _df0_dy, lo, hi, args=(v, awr, kt), points=pts or None, limit=300, epsabs=1e-13, epsrel=1e-11
        )
        out[g] = val / den
    return out


def _dmoments_dy_dense(
    y: float, v: float, awr: float, kt: float, order: int, n_c: int, nq: int
) -> np.ndarray:
    """dF_l/dy (unnormalized), dense vectorized quadrature.

    The c-integrand e^{-qc^2} P_l(c_a) P_l(c_b) is SMOOTH and bounded on
    [lo, hi] — n_c uniform panels x GL-nq resolves it to f64 roundoff with
    no expansion (hence no cancellation); trustworthiness comes from
    refinement (moments_dense checks n_c -> 2 n_c).
    """
    gamma = awr / (awr + 1.0)
    beta = np.sqrt(awr / kt)
    q = beta * beta * (awr + 1.0) / awr
    xq, wq = gl_nodes_weights(nq)
    edges = _vr_panels(v, y, gamma, beta, n_fill=33)
    mid = 0.5 * (edges[1:] + edges[:-1])
    half = 0.5 * (edges[1:] - edges[:-1])
    vr = (mid[:, None] + half[:, None] * xq[None, :]).ravel()
    wr = (half[:, None] * wq[None, :]).ravel()
    u = gamma * vr
    lo = np.maximum(np.abs(y - u), np.abs(v - u))
    hi = np.minimum(y + u, v + u)
    ok = hi > lo
    lo = np.where(ok, lo, 1.0)
    hi = np.where(ok, hi, 1.0)
    # c nodes: geometric grading at the lo end (c_a, c_b vary like 1/c when
    # lo << hi, i.e. u ~ y ~ v) + n_c uniform panels, x GL-nq per panel
    fr = np.unique(np.concatenate([[0.0], 4.0 ** -np.arange(12, 0, -1.0), np.arange(n_c + 1) / n_c]))[None, :]
    ce = lo[:, None] + (hi - lo)[:, None] * fr  # (R, NC+1)
    cm = 0.5 * (ce[:, 1:] + ce[:, :-1])
    ch = 0.5 * (ce[:, 1:] - ce[:, :-1])
    c = (cm[:, :, None] + ch[:, :, None] * xq[None, None, :]).reshape(vr.size, -1)  # (R, C)
    wc = (ch[:, :, None] * wq[None, None, :]).reshape(vr.size, -1)
    ca = np.clip((v * v + c * c - (u * u)[:, None]) / (2.0 * v * c), -1.0, 1.0)
    cb = np.clip((y * y + c * c - (u * u)[:, None]) / (2.0 * y * c), -1.0, 1.0)
    pla = legendre_all_np(ca, order)  # (R, C, L+1)
    plb = legendre_all_np(cb, order)
    gauss = np.exp(-q * c * c)
    inner = np.einsum("rc,rcl,rcl->rl", gauss * wc, pla, plb)  # (R, L+1)
    w_vr = np.where(ok, vr * vr * np.exp(-(beta * beta) * (vr * vr / (awr + 1.0) - v * v / awr)) / (4.0 * u), 0.0)
    return np.einsum("r,rl->l", wr * w_vr, inner) * 2.0 * y


def moments_dense(
    e: float,
    awr: float,
    kt: float,
    bounds: np.ndarray,
    order: int,
    groups_sel: list[int] | None = None,
    clamp: bool = True,
    nq_y: int = 24,
    n_c: int = 12,
    self_tol: float = 1e-9,
) -> dict[int, np.ndarray]:
    """{g: (L+1,)} reference moments, refinement-verified per group.

    Dense f64 quadrature of the pointwise reduction; each group is returned
    only if doubling the c-panel count and the y ladder density moves it by
    less than self_tol (relative to the group's own l=0 value, floored).
    """
    v = float(np.sqrt(e))
    gamma = awr / (awr + 1.0)
    beta = np.sqrt(awr / kt)
    den = _den(v, awr, kt)
    sb = np.sqrt(np.maximum(bounds, 0.0)).astype(np.float64)
    y_max = v + 2.0 * gamma * (v + 9.0 / beta)
    if clamp:
        sb = sb.copy()
        sb[0] = 0.0
        sb[-1] = max(sb[-1], y_max * 1.01)
    ng = sb.size - 1
    if groups_sel is None:
        groups_sel = list(range(ng))
    xq, wq = gl_nodes_weights(nq_y)

    delta = 2.0 * gamma / beta
    y_alpha = v * abs(awr - 1.0) / (awr + 1.0)
    lad = np.array([-32, -16, -8, -4, -2, -1, -0.5, 0.5, 1, 2, 4, 8, 16, 32], dtype=float)

    def group_val(g: int, n_c_: int, dense_y: bool) -> np.ndarray:
        lo, hi = float(sb[g]), float(min(sb[g + 1], y_max * 1.005))
        if hi <= lo:
            return np.zeros(order + 1)
        pts = [lo, hi, v, y_alpha]
        pts += list(v + delta * lad) + list(y_alpha + delta * lad)
        if dense_y:
            pts += list(np.linspace(lo, hi, 9))
        edges = np.unique(np.clip(np.asarray(pts), lo, hi))
        acc = np.zeros(order + 1)
        for a, b in zip(edges[:-1], edges[1:]):
            if b <= a:
                continue
            m, h = 0.5 * (a + b), 0.5 * (b - a)
            for xi, wi in zip(xq, wq):
                acc += h * wi * _dmoments_dy_dense(m + h * xi, v, awr, kt, order, n_c_, 24)
        return acc / den

    out: dict[int, np.ndarray] = {}
    for g in groups_sel:
        coarse = group_val(g, n_c, False)
        fine = group_val(g, 2 * n_c, True)
        scale = max(abs(fine[0]), 1e-12 * max(abs(v), 1.0))
        drift = np.abs(fine - coarse).max() / max(scale, 1e-300)
        assert drift < self_tol, f"freegas dense reference not converged (g={g}, drift={drift:.2e})"
        out[g] = fine
    return out
