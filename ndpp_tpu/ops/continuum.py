"""Continuum-law group-transfer moments (laws 4/44/61/66; config 4).

Two device paths (SURVEY.md section 3.4):

lab_tabular_moments
  Lab frame: the angular factor decouples per outgoing-energy knot, so
  f_{l,g'}(E) = int p(E'|E) M_l(E') dE' with host-precomputed EXACT
  per-knot moments M_l (host.angular_moments). Sorted-edges + GL; the
  integrand is piecewise-quadratic, so modest GL order is exact.

cm_moments
  CM frame (Kalbach law 44, CM tabular law 61/4, N-body law 66):

    f_{l,g'}(E) = int dmu p(mu|..) int dE'c p(E'c|E) P_l(mu_lab) 1[E'lab in g']

  with E'lab = E'c + 2 mu s sqrt(E'c) + s^2, s = sqrt(E)/(A+1),
  mu_lab = (mu sqrt(E'c) + s)/sqrt(E'lab).

  Outer: fixed GL panels over mu (angular mu-knots as panel edges).
  Inner: for each mu, E'lab is quadratic in y = sqrt(E'c), so each lab
  group boundary maps to up to TWO closed-form E'c breakpoints (the
  CM->lab fold for backward emission); sorted-edges over
  (pdf knots + both root families) keeps every GL panel smooth and inside
  one outgoing group. The outer integrand is C^1 (moving breakpoints),
  handled by per-panel GL of configurable order — accuracy is test-tuned
  against the adaptive oracle (SURVEY.md section 4.3).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import scipy.special as sps

import jax
import jax.numpy as jnp

from ndpp_tpu.ops.legendre import gl_nodes_weights, legendre_all
from ndpp_tpu.ops.twobody import _affine_coeffs_rows, _interp_rows


def _effective_bounds(bounds, clamp: bool):
    if not clamp:
        return bounds
    lo = jnp.full((1,), -jnp.inf, dtype=bounds.dtype)
    hi = jnp.full((1,), jnp.inf, dtype=bounds.dtype)
    return jnp.concatenate([lo, bounds[1:-1], hi])


def _scatter_rows(m, gidx, ng):
    def row(m_row, g_row):
        return jnp.zeros((m_row.shape[0], ng), dtype=m_row.dtype).at[:, g_row].add(m_row)

    return jax.vmap(row)(m, gidx)


@partial(jax.jit, static_argnames=("order", "nq", "clamp"))
def lab_tabular_moments(e_knots, pdf, moms, bounds, order: int, nq: int = 6, clamp: bool = True):
    """f_{l,g'} rows for lab-frame tabular spectra.

    e_knots/pdf: (T, K); moms: (T, K, L+1) per-knot exact angular moments.
    Returns (T, L+1, G).
    """
    xq, wq = gl_nodes_weights(nq)
    xq = jnp.asarray(xq, dtype=pdf.dtype)
    wq = jnp.asarray(wq, dtype=pdf.dtype)
    ng = bounds.shape[0] - 1
    eff = _effective_bounds(bounds, clamp)
    brk = jnp.clip(eff[None, :], e_knots[:, :1], e_knots[:, -1:])
    edges = jnp.sort(jnp.concatenate([e_knots, brk], axis=1), axis=1)
    lo, hi = edges[:, :-1], edges[:, 1:]
    half = 0.5 * (hi - lo)
    mid = 0.5 * (hi + lo)
    tt, ss = mid.shape
    x = mid[:, None, :] + half[:, None, :] * xq[None, :, None]  # (T, Q, S)
    a_p, b_p = _affine_coeffs_rows(e_knots, pdf, mid)
    pdf_q = a_p[:, None, :] + b_p[:, None, :] * x
    w = pdf_q * wq[None, :, None] * half[:, None, :]
    out_m = []
    for l in range(order + 1):
        a_m, b_m = _affine_coeffs_rows(e_knots, moms[:, :, l], mid)
        ml = a_m[:, None, :] + b_m[:, None, :] * x
        out_m.append(jnp.sum(w * ml, axis=1))  # (T, S)
    m = jnp.stack(out_m, axis=1)  # (T, L+1, S)

    gidx = jnp.searchsorted(bounds, mid, side="right") - 1
    if clamp:
        gidx = jnp.clip(gidx, 0, ng - 1)
        valid = half > 0
    else:
        valid = (half > 0) & (gidx >= 0) & (gidx < ng)
        gidx = jnp.clip(gidx, 0, ng - 1)
    m = m * valid[:, None, :]
    return _scatter_rows(m, gidx, ng)


@partial(jax.jit, static_argnames=("order", "nq_e", "nq_mu", "angular", "energy", "clamp", "nbody_expo"))
def cm_moments(
    e,
    e_knots,
    pdf_e,
    r_rows,
    a_rows,
    mu_edges,
    mu_knots,
    mu_pdf,
    nbody_emax,
    nbody_expo,
    bounds,
    awr,
    order: int,
    nq_e: int = 16,
    nq_mu: int = 16,
    angular: str = "kalbach",  # 'kalbach' | 'tabular' | 'isotropic'
    energy: str = "tabular",  # 'tabular' | 'nbody'
    clamp: bool = True,
):
    """CM-frame continuum moments: (T, L+1, G).

    e: (T,); e_knots/pdf_e/r_rows/a_rows: (T, KE); mu_edges: (T, PM+1)
    per-row outer quadrature panel edges (sorted; duplicates = dead panels;
    the driver inserts the closed-form fold kink angles mu*_g so every GL
    panel sees a smooth integrand); mu_knots: (KMU,) + mu_pdf: (T, KE, KMU)
    carry the tabular angular payload; nbody_emax: (T,); nbody_expo: static.
    """
    dtype = e.dtype
    ng = bounds.shape[0] - 1
    eff = _effective_bounds(bounds, clamp)
    # finite clamp sentinels: TPU's emulated f64 returns NaN for sqrt(inf)
    # (verified on hardware), and `disc` below goes through a sqrt
    eff = jnp.clip(eff, -1e30, 1e30)
    s = jnp.sqrt(e) / (awr + 1.0)  # (T,) CM-motion speed scale (sqrt-energy units)

    if energy == "nbody":
        # support [0, emax]; graded knot ladder resolves the sqrt/power endpoints
        ladder = np.concatenate(
            [0.25 ** np.arange(12, 0, -1), [0.5], 1.0 - 0.25 ** np.arange(1, 13), [1.0]]
        )
        e_knots = nbody_emax[:, None] * jnp.asarray(np.concatenate([[0.0], ladder]), dtype=dtype)[None, :]
        # normalization: int_0^emax sqrt(x)(emax-x)^k dx = emax^(k+1.5) B(1.5, k+1)
        # Below-threshold rows have emax <= 0: zero them instead of dividing
        # by an underflowed power (1e-30**2 -> 0 -> inf -> NaN cascade).
        beta = float(sps.beta(1.5, float(nbody_expo) + 1.0))
        emax_ok = nbody_emax > 0.0
        emax_safe = jnp.where(emax_ok, nbody_emax, 1.0)
        c_norm = jnp.where(emax_ok, 1.0 / (beta * emax_safe ** (nbody_expo + 1.5)), 0.0)  # (T,)

    ke = e_knots.shape[1]
    y_lo = jnp.sqrt(jnp.maximum(e_knots[:, 0], 0.0))
    y_hi = jnp.sqrt(jnp.maximum(e_knots[:, -1], 0.0))

    xq_e, wq_e = gl_nodes_weights(nq_e)
    xq_e = jnp.asarray(xq_e, dtype=dtype)
    wq_e = jnp.asarray(wq_e, dtype=dtype)
    xq_m, wq_m = gl_nodes_weights(nq_mu)
    xq_m = jnp.asarray(xq_m, dtype=dtype)
    wq_m = jnp.asarray(wq_m, dtype=dtype)

    # outer mu points: GL inside each per-row panel; scan iterates the static
    # (panel, node) product with per-row mu values
    pm = mu_edges.shape[1] - 1
    mid_p = 0.5 * (mu_edges[:, 1:] + mu_edges[:, :-1])  # (T, PM)
    half_p = 0.5 * (mu_edges[:, 1:] - mu_edges[:, :-1])
    p_arr = jnp.asarray(np.repeat(np.arange(pm), nq_mu), dtype=jnp.int32)  # (NMU,)
    q_arr = jnp.asarray(np.tile(np.arange(nq_mu), pm), dtype=jnp.int32)

    def body(carry, inp):
        p_idx, q_idx = inp
        mid_c = jax.lax.dynamic_index_in_dim(mid_p, p_idx, axis=1, keepdims=False)  # (T,)
        half_c = jax.lax.dynamic_index_in_dim(half_p, p_idx, axis=1, keepdims=False)
        mu = (mid_c + half_c * jnp.take(xq_m, q_idx))[:, None]  # (T, 1)
        w_mu = (half_c * jnp.take(wq_m, q_idx))[:, None]  # (T, 1)
        mu3 = mu[:, :, None]  # (T, 1, 1)
        # --- breakpoints: both roots of E'lab(y) = Eb
        disc = eff[None, :] - (s**2)[:, None] * (1.0 - mu**2)  # (T, G+1)
        root = jnp.sqrt(jnp.maximum(disc, 0.0))
        y1 = -mu * s[:, None] + root
        y2 = -mu * s[:, None] - root
        b1 = jnp.clip(y1, y_lo[:, None], y_hi[:, None]) ** 2
        b2 = jnp.clip(y2, y_lo[:, None], y_hi[:, None]) ** 2
        edges = jnp.sort(jnp.concatenate([e_knots, b1, b2], axis=1), axis=1)  # (T, M)
        lo, hi = edges[:, :-1], edges[:, 1:]
        half = 0.5 * (hi - lo)
        mid = 0.5 * (hi + lo)
        tt, ss_ = mid.shape
        x = mid[:, None, :] + half[:, None, :] * xq_e[None, :, None]  # (T, QE, S)

        if energy == "nbody":
            pe = (
                c_norm[:, None, None]
                * jnp.sqrt(jnp.maximum(x, 0.0))
                * jnp.maximum(nbody_emax[:, None, None] - x, 0.0) ** nbody_expo
            )
        else:
            a_e, b_e = _affine_coeffs_rows(e_knots, pdf_e, mid)
            pe = a_e[:, None, :] + b_e[:, None, :] * x

        if angular == "kalbach":
            a_r, b_r = _affine_coeffs_rows(e_knots, r_rows, mid)
            a_a, b_a = _affine_coeffs_rows(e_knots, a_rows, mid)
            rr = a_r[:, None, :] + b_r[:, None, :] * x
            aa = a_a[:, None, :] + b_a[:, None, :] * x
            pa = aa / (2.0 * jnp.sinh(aa)) * (jnp.cosh(aa * mu3) + rr * jnp.sinh(aa * mu3))
        elif angular == "tabular":
            kmu = mu_knots.shape[0]
            j = jnp.clip(jnp.searchsorted(mu_knots, mu[:, 0], side="right") - 1, 0, kmu - 2)  # (T,)
            left = jnp.take_along_axis(mu_pdf, j[:, None, None], axis=2)[:, :, 0]  # (T, KE)
            right = jnp.take_along_axis(mu_pdf, (j + 1)[:, None, None], axis=2)[:, :, 0]
            mk0 = jnp.take(mu_knots, j)
            mk1 = jnp.take(mu_knots, j + 1)
            t_mu = jnp.clip((mu[:, 0] - mk0) / jnp.maximum(mk1 - mk0, 1e-30), 0.0, 1.0)
            pmu_k = left + t_mu[:, None] * (right - left)  # (T, KE) angular pdf at mu, per knot
            a_m, b_m = _affine_coeffs_rows(e_knots, pmu_k, mid)
            pa = a_m[:, None, :] + b_m[:, None, :] * x
        else:  # isotropic
            pa = 0.5

        ylab = x + 2.0 * mu3 * s[:, None, None] * jnp.sqrt(jnp.maximum(x, 0.0)) + (s**2)[:, None, None]
        mu_lab = jnp.clip(
            (mu3 * jnp.sqrt(jnp.maximum(x, 0.0)) + s[:, None, None]) / jnp.sqrt(jnp.maximum(ylab, 1e-30)),
            -1.0,
            1.0,
        )
        wgt = pe * pa * wq_e[None, :, None] * half[:, None, :] * w_mu[:, :, None]  # (T, QE, S)
        p_prev = jnp.ones_like(mu_lab)
        m_list = [jnp.sum(wgt, axis=1)]
        if order >= 1:
            p_cur = mu_lab
            m_list.append(jnp.sum(wgt * p_cur, axis=1))
            for l in range(1, order):
                p_next = ((2 * l + 1) * mu_lab * p_cur - l * p_prev) / (l + 1)
                p_prev, p_cur = p_cur, p_next
                m_list.append(jnp.sum(wgt * p_cur, axis=1))
        m = jnp.stack(m_list, axis=1)  # (T, L+1, S)

        elab_mid = mid + 2.0 * mu * s[:, None] * jnp.sqrt(jnp.maximum(mid, 0.0)) + (s**2)[:, None]
        gidx = jnp.searchsorted(bounds, elab_mid, side="right") - 1
        if clamp:
            gidx = jnp.clip(gidx, 0, ng - 1)
            valid = half > 0
        else:
            valid = (half > 0) & (gidx >= 0) & (gidx < ng)
            gidx = jnp.clip(gidx, 0, ng - 1)
        m = m * valid[:, None, :]
        return carry + _scatter_rows(m, gidx, ng), None

    tt = e.shape[0]
    # init derived from input data: keeps the carry mesh-varying under shard_map
    init = jnp.zeros((tt, order + 1, ng), dtype=dtype) + (0.0 * e)[:, None, None]
    out, _ = jax.lax.scan(body, init, (p_arr, q_arr))
    return out
