"""Independent oracle for the free-gas thermal kernel.

Integrates in the ORIGINAL (target speed V, cosine omega, outgoing v')
variables — fully independent of the device kernel's (v_r, V_cm)
transformation and closed-form inner integral. Quadrature is dense graded
fixed GL (numpy), self-verified by refinement: the result is returned only
if doubling the density changes it by less than `self_tol`, otherwise an
assertion fires (an untrustworthy oracle must never silently pass).
"""

from __future__ import annotations

import numpy as np

from ndpp_tpu.ops.legendre import gl_nodes_weights, legendre_all_np

_V_OFFS = np.array([0.0, 0.25, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0])
_W_EDGES = np.array([-1.0, -0.5, 0.0, 0.5, 0.8, 0.9, 0.95, 0.98, 0.99, 0.995, 1.0])


def _panel_nodes(edges: np.ndarray, nq: int):
    x, w = gl_nodes_weights(nq)
    mid = 0.5 * (edges[1:] + edges[:-1])
    half = 0.5 * (edges[1:] - edges[:-1])
    nodes = (mid[:, None] + half[:, None] * x[None, :]).ravel()
    wts = (half[:, None] * w[None, :]).ravel()
    return nodes, wts


def _moments_once(
    e_ev: float, awr: float, kt_ev: float, sb: np.ndarray, order: int, nq: int, nq_inner: int
) -> np.ndarray:
    v = np.sqrt(e_ev)
    a = awr
    beta = np.sqrt(a / kt_ev)
    gamma = a / (a + 1.0)
    ng = sb.size - 1

    vv, wv = _panel_nodes(_V_OFFS / beta, nq)  # target speeds
    ww, wo = _panel_nodes(_W_EDGES, nq)  # cosines
    V = vv[:, None]
    W = ww[None, :]
    wgt2 = (V * V * np.exp(-(beta**2) * V * V)) * wv[:, None] * wo[None, :]  # (NV, NW)

    vr = np.sqrt(np.maximum(v * v + V * V - 2.0 * v * V * W, 1e-300))
    vcm = np.sqrt(v * v + a * a * V * V + 2.0 * a * v * V * W) / (a + 1.0)
    u = gamma * vr
    ca = np.clip((v + a * V * W) / ((a + 1.0) * vcm), -1.0, 1.0)
    pl_a = legendre_all_np(ca, order)  # (NV, NW, L+1)
    rate = vr  # relative-speed rate factor

    den = float(np.sum(wgt2 * rate))

    xi, wi = gl_nodes_weights(nq_inner)
    out = np.zeros((order + 1, ng))
    flat_w = (wgt2 * rate).ravel()
    flat_vcm = vcm.ravel()
    flat_u = u.ravel()
    flat_pla = pl_a.reshape(-1, order + 1)
    for g in range(ng):
        lo = np.maximum(np.abs(flat_vcm - flat_u), sb[g])
        hi = np.minimum(flat_vcm + flat_u, sb[g + 1])
        valid = hi > lo
        if not np.any(valid):
            continue
        loh = lo[valid]
        hih = hi[valid]
        cmid = 0.5 * (loh + hih)
        chalf = 0.5 * (hih - loh)
        yp = cmid[:, None] + chalf[:, None] * xi[None, :]  # (M, QI)
        cb = (yp * yp + (flat_vcm[valid] ** 2 - flat_u[valid] ** 2)[:, None]) / (
            2.0 * yp * flat_vcm[valid][:, None]
        )
        cb = np.clip(cb, -1.0, 1.0)
        pl_b = legendre_all_np(cb, order)  # (M, QI, L+1)
        dens = 2.0 * yp / (4.0 * flat_vcm[valid][:, None] * flat_u[valid][:, None])
        inner = np.einsum("mq,mql,q->ml", dens, pl_b, wi) * chalf[:, None]  # (M, L+1)
        out[:, g] = np.sum(flat_w[valid][:, None] * flat_pla[valid] * inner, axis=0)
    return out / den


def _moments_vrvcm(
    e_ev: float, awr: float, kt_ev: float, sb: np.ndarray, order: int, nq_r: int, nq_c: int, nq_i: int
) -> np.ndarray:
    """High-precision reference in (v_r, V_cm) coordinates.

    Same coordinates as the device kernel (the transform itself is verified
    independently: the (V, omega) oracle below cross-checks it at the 1e-5
    level and sigma_eff matches the analytic Doppler formula at ~1e-10) but
    numerically independent: numpy, kink-aware panelization with its own
    layout, and a dense-GL inner integral instead of the closed form.
    """
    v = np.sqrt(e_ev)
    a = awr
    beta = np.sqrt(a / kt_ev)
    gamma = a / (a + 1.0)
    ng = sb.size - 1
    finite_sb = sb[np.isfinite(sb)]

    # outer v_r panels: Maxwellian ladder + all closed-form kink values + uniform fill
    lo_r = max(0.0, v - 9.0 / beta)
    hi_r = v + 9.0 / beta
    cand = [v + np.asarray([-8, -6, -4, -3, -2, -1.5, -1, -0.5, 0, 0.5, 1, 1.5, 2, 3, 4, 6, 8]) / beta]
    cand.append((v + finite_sb) / (2 * gamma))
    cand.append((v - finite_sb) / (2 * gamma))
    cand.append((finite_sb - v) / (2 * gamma))
    cand.append(np.linspace(lo_r, hi_r, 33))
    edges_r = np.unique(np.clip(np.concatenate(cand), lo_r, hi_r))
    xr, wr_ = gl_nodes_weights(nq_r)
    xc, wc_ = gl_nodes_weights(nq_c)
    xi, wi = gl_nodes_weights(nq_i)

    out = np.zeros((order + 1, ng))
    den = 0.0
    for i in range(edges_r.size - 1):
        if edges_r[i + 1] <= edges_r[i]:
            continue
        h = 0.5 * (edges_r[i + 1] - edges_r[i])
        m = 0.5 * (edges_r[i + 1] + edges_r[i])
        for q in range(nq_r):
            vr = m + h * xr[q]
            w_r = h * wr_[q]
            u = gamma * vr
            clo, chi = abs(v - u), v + u
            # middle panels: graded + every kink family + uniform fill
            vstar2 = v * v / (a + 1.0) - a * vr * vr / (a + 1.0) ** 2
            vstar = np.sqrt(max(vstar2, 0.0))
            anchor = min(max(vstar, clo), chi)
            wq_ = 1.0 / (beta * np.sqrt((a + 1.0) / a))
            wl_ = 1.0 / (beta**2 * 2.0 * max(anchor, 1e-30) * (a + 1.0) / a)
            cands = [np.array([clo, chi, min(max(u, clo), chi)])]
            for w_scale in (wq_, wl_):
                cands.append(anchor + w_scale * np.asarray([-8, -4, -2, -1, -0.5, 0.5, 1, 2, 4, 8]))
            cands.append(finite_sb + u)
            cands.append(u - finite_sb)
            cands.append(finite_sb - u)
            cands.append(np.linspace(clo, chi, 17))
            edges_c = np.unique(np.clip(np.concatenate(cands), clo, chi))
            if edges_c.size < 2:
                continue
            mids = 0.5 * (edges_c[1:] + edges_c[:-1])
            halfs = 0.5 * (edges_c[1:] - edges_c[:-1])
            cc = (mids[:, None] + halfs[:, None] * xc[None, :]).ravel()
            w_c = (halfs[:, None] * wc_[None, :]).ravel()
            vsq = -v * v / a + vr * vr / (a + 1.0) + cc * cc * (a + 1.0) / a
            wgt = vr * vr * cc * np.exp(-(beta**2) * vsq) * w_c * w_r
            den += float(wgt.sum())
            ca = np.clip((v * v + cc * cc - u * u) / (2.0 * v * cc), -1.0, 1.0)
            pla = legendre_all_np(ca, order)  # (C, L+1)
            for g in range(ng):
                lo_g = np.maximum(np.abs(cc - u), sb[g])
                hi_g = np.minimum(cc + u, sb[g + 1])
                ok = hi_g > lo_g
                if not np.any(ok):
                    continue
                lo2, hi2 = lo_g[ok], hi_g[ok]
                cm_ = 0.5 * (lo2 + hi2)
                ch_ = 0.5 * (hi2 - lo2)
                yp = cm_[:, None] + ch_[:, None] * xi[None, :]
                cb = np.clip(
                    (yp * yp + (cc[ok] ** 2 - u * u)[:, None]) / (2.0 * yp * cc[ok][:, None]), -1.0, 1.0
                )
                plb = legendre_all_np(cb, order)
                dens = 2.0 * yp / (4.0 * cc[ok][:, None] * u)
                inner = np.einsum("mq,mql,q->ml", dens, plb, wi) * ch_[:, None]
                out[:, g] += np.einsum("m,ml->l", wgt[ok], pla[ok] * inner)

    return out / den


def freegas_moments_oracle(
    e_ev: float,
    awr: float,
    kt_ev: float,
    bounds: np.ndarray,
    order: int,
    clamp: bool = True,
    self_tol: float = 1e-8,
) -> np.ndarray:
    """(L+1, G) free-gas transfer moments, refinement- and transform-verified."""
    sb = np.sqrt(np.maximum(bounds, 0.0)).astype(np.float64)
    if clamp:
        sb[0], sb[-1] = 0.0, np.inf
    coarse = _moments_vrvcm(e_ev, awr, kt_ev, sb, order, nq_r=6, nq_c=6, nq_i=32)
    fine = _moments_vrvcm(e_ev, awr, kt_ev, sb, order, nq_r=10, nq_c=10, nq_i=64)
    scale = max(np.abs(fine).max(), 1e-300)
    drift = np.abs(fine - coarse).max() / scale
    assert drift < self_tol, f"free-gas oracle not converged: refinement drift {drift:.2e}"
    # independent-coordinate cross-check: (V, omega) fixed-grid path agrees at
    # its own (kink-limited) convergence level, validating the transform
    cross = _moments_once(e_ev, awr, kt_ev, sb, order, nq=32, nq_inner=64)
    assert np.abs(cross - fine).max() / scale < 5e-5, "coordinate-transform cross-check failed"
    return fine
