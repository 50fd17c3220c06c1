"""Continuum-law group-transfer moments (laws 4/44/61/66; config 4).

Two device paths (SURVEY.md section 3.4):

lab_tabular_moments
  Lab frame: the angular factor decouples per outgoing-energy knot, so
  f_{l,g'}(E) = int p(E'|E) M_l(E') dE' with host-precomputed EXACT
  per-knot moments M_l (host.angular_moments). Sorted-edges + GL; the
  integrand is piecewise-quadratic, so modest GL order is exact.

cm_moments_pointwise
  CM frame (Kalbach law 44, CM tabular law 61/4, N-body law 66): the exact
  (mu_cm, E'_cm) -> (E'_lab, y = sqrt(E'_cm)) change of variables — constant
  Jacobian 1/s, no CM->lab fold, group classification exact by panel
  construction, cost linear in the group count. See its docstring for the
  full derivation; validated against the adaptive nested-quad oracle
  (SURVEY.md section 4.3) at ~1e-10.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import scipy.special as sps

import jax
import jax.numpy as jnp

from ndpp_tpu.ops import select
from ndpp_tpu.ops.legendre import gl_nodes_weights
from ndpp_tpu.ops.twobody import _affine_coeffs_rows


def _effective_bounds(bounds, clamp: bool):
    """Clamped integration bounds; bounds may be shared (G+1,) or per-row
    (T, B+1) group-band windows (round 5: banded continuum outputs)."""
    if not clamp:
        return bounds
    shp = bounds.shape[:-1] + (1,)
    lo = jnp.full(shp, -jnp.inf, dtype=bounds.dtype)
    hi = jnp.full(shp, jnp.inf, dtype=bounds.dtype)
    return jnp.concatenate([lo, bounds[..., 1:-1], hi], axis=-1)


def _searchsorted_last(b, q):
    """Right-insertion index minus 1 of q into the sorted last axis of b.

    b: (NB,) shared or (T, NB) per-row; q: (T, S). Returns int32 (T, S).
    The per-row form is a count over the (narrow) banded boundary axis.
    """
    if b.ndim == 1:
        return jnp.searchsorted(b, q, side="right").astype(jnp.int32) - 1
    return jnp.sum((b[:, None, :] <= q[:, :, None]).astype(jnp.int32), axis=2) - 1


def _panel_index_rows(knots, q):
    """Index of the knot panel containing each query (masked sum, no gather).

    knots: (T, K) non-decreasing (duplicates = dead panels); q: (T, S).
    Returns int32 (T, S) in [0, K-2]; queries outside clamp to edge panels.
    """
    k = knots.shape[1]
    idx = jnp.zeros(q.shape, dtype=jnp.int32)
    covered = jnp.zeros(q.shape, dtype=bool)
    for j in range(k - 1):
        x0 = knots[:, j : j + 1]
        x1 = knots[:, j + 1 : j + 2]
        inside = (q >= x0) & (q < x1)
        if j == 0:
            inside = inside | (q < x0)
        if j == k - 2:
            inside = inside | (q >= x1)
        take = inside & ~covered
        idx = jnp.where(take, jnp.int32(j), idx)
        covered = covered | take
    return idx


def _scatter_rows(m, gidx, ng):
    def row(m_row, g_row):
        return jnp.zeros((m_row.shape[0], ng), dtype=m_row.dtype).at[:, g_row].add(m_row)

    return jax.vmap(row)(m, gidx)


@partial(jax.jit, static_argnames=("clamp",))
def discrete_lines_moments(e_out, w, am, bounds, clamp: bool = True):
    """Exact moments of per-row weighted discrete outgoing-energy lines.

    Law 4/44/61 tables may carry ND delta lines ahead of the continuous part
    (ACE DLW convention); each line contributes its probability times its
    angular Legendre factors in the group containing its energy. Also the
    shared engine for thermal discrete (IFENG<2) tables (ops/thermal.py).

    e_out: (T, J) eV; w: (T, J) line probabilities; am: (T, J, L+1);
    bounds: (G+1,). Returns (T, L+1, G). With clamp, out-of-range lines
    collapse into the edge groups; otherwise they are dropped.
    """
    ng = bounds.shape[0] - 1
    g = jnp.searchsorted(bounds, e_out, side="right") - 1  # (T, J)
    if clamp:
        inside = jnp.ones(g.shape, dtype=am.dtype)
    else:
        inside = ((g >= 0) & (g < ng)).astype(am.dtype)
    g = jnp.clip(g, 0, ng - 1)
    onehot = (g[:, :, None] == jnp.arange(ng)[None, None, :]).astype(am.dtype)
    return jnp.einsum("tjg,tjl,tj,tj->tlg", onehot, am, w, inside)


@partial(jax.jit, static_argnames=("order", "nq", "clamp"))
def lab_tabular_moments(e_knots, pdf, moms, bounds, order: int, nq: int = 6, clamp: bool = True):
    """f_{l,g'} rows for lab-frame tabular spectra.

    e_knots/pdf: (T, K); moms: (T, K, L+1) per-knot exact angular moments.
    bounds: shared (G+1,) or per-row (T, B+1) group-band windows (each
    row's window must cover its knot support). Returns (T, L+1, G|B).
    """
    xq, wq = gl_nodes_weights(nq)
    xq = jnp.asarray(xq, dtype=pdf.dtype)
    wq = jnp.asarray(wq, dtype=pdf.dtype)
    ng = bounds.shape[-1] - 1
    eff = _effective_bounds(bounds, clamp)
    if eff.ndim == 1:
        eff = eff[None, :]
    brk = jnp.clip(eff, e_knots[:, :1], e_knots[:, -1:])
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

    gidx = _searchsorted_last(bounds, mid)
    if clamp:
        gidx = jnp.clip(gidx, 0, ng - 1)
        valid = half > 0
    else:
        valid = (half > 0) & (gidx >= 0) & (gidx < ng)
        gidx = jnp.clip(gidx, 0, ng - 1)
    m = m * valid[:, None, :]
    return _scatter_rows(m, gidx, ng)


# N-body phase-space outgoing-energy knot ladder (fractions of emax): graded
# toward both support ends, where sqrt(x) and (emax-x)^expo defeat plain GL
_NBODY_LADDER = np.concatenate(
    [[0.0], 0.25 ** np.arange(12, 0, -1), [0.5], 1.0 - 0.25 ** np.arange(1, 13), [1.0]]
)


@partial(
    jax.jit,
    static_argnames=("order", "nq_w", "nq_y", "angular", "energy", "clamp", "nbody_expo", "chunk", "ksel", "group_split", "cross_edges"),
)
def cm_moments_pointwise(
    e,
    e_knots,
    pdf_e,
    r_rows,
    a_rows,
    mu_knots,
    mu_pdf,
    nbody_emax,
    nbody_expo,
    bounds,
    awr,
    order: int,
    nq_w: int = 8,
    nq_y: int = 8,
    angular: str = "kalbach",  # 'kalbach' | 'tabular' | 'isotropic'
    energy: str = "tabular",  # 'tabular' | 'nbody'
    clamp: bool = True,
    chunk: int = 8,
    ksel: int = 0,
    group_split: str = "panels",  # "panels" | "lagrange" (see below)
    cross_edges: bool = False,  # tabular only: K x KMU crossing-image outer edges
):
    """CM-frame continuum moments via the pointwise-E'_lab formulation: (T, L+1, G).

    Exact change of variables (mu_cm, E'_cm) -> (E'_lab, y = sqrt(E'_cm)):
    with s = sqrt(E)/(A+1) and w = sqrt(E'_lab),

        mu_cm  = (w^2 - s^2 - y^2) / (2 s y)        (single-valued: no CM->lab fold)
        mu_lab = (w^2 + s^2 - y^2) / (2 s w)
        |Jacobian| = 1/s                             (constant)
        mu_cm in [-1, 1]  <=>  y in [|w - s|, w + s]

    f_{l,g'} = (1/s) int_{g'} dE'_lab int dy p_E(y^2) p_mu(mu_cm) P_l(mu_lab),
    the inner y-window intersected with the data support. Outer panels in w
    use group boundaries as EXACT edges (a panel never crosses a boundary),
    plus the closed-form kink families {y_k +- s}, {s}, and for tabulated
    angles the mu-knot domain-entry images; inner panels in y use the data
    knots and (tabular) the closed-form mu-knot crossing roots
    y = -s mu_k +- sqrt(s^2 mu_k^2 + w^2 - s^2). Every GL panel therefore
    sees an analytic integrand (spectral convergence), the group
    classification is exact, and cost is LINEAR in G — this replaces the
    fold-kink-decimated path that capped fine-structure accuracy at ~5e-6
    (round-1 gap 2).

    ksel > 0 enables the windowed-knot fast path: only the <= ksel data
    knots that can fall inside a [|w-s|, w+s] window (host-verified bound)
    are gathered as inner panel edges; ksel = 0 uses every knot.

    group_split = "lagrange" drops the group boundaries from the outer
    panel edges (the density is SMOOTH across them) and splits panel
    integrals at the boundaries via the shared Lagrange cumulant machinery
    (ops/panelsplit; first proven on the free-gas kernels) — outer cost
    becomes independent of G (~4x fewer outer points at the production
    361-group structure). "panels" is the round-1 boundary-edged scheme.
    """
    dtype = e.dtype
    tt = e.shape[0]
    # bounds: shared (G+1,) or per-row (T, B+1) group-band windows (round
    # 5). A banded call returns (T, L+1, B); the caller guarantees each
    # row's window covers its kinematic support, so the clamp semantics
    # (edge groups absorb out-of-domain mass) are unchanged.
    ng = bounds.shape[-1] - 1
    awr = jnp.broadcast_to(jnp.asarray(awr, dtype=dtype), e.shape)
    s = jnp.sqrt(jnp.maximum(e, 0.0)) / (awr + 1.0)  # (T,)
    s_safe = jnp.where(s > 0, s, 1.0)
    inv_s = jnp.where(s > 0, 1.0 / s_safe, 0.0)

    if energy == "nbody":
        e_knots = nbody_emax[:, None] * jnp.asarray(_NBODY_LADDER, dtype=dtype)[None, :]
        beta_c = float(sps.beta(1.5, float(nbody_expo) + 1.0))
        emax_ok = nbody_emax > 0.0
        emax_safe = jnp.where(emax_ok, nbody_emax, 1.0)
        c_norm = jnp.where(emax_ok, 1.0 / (beta_c * emax_safe ** (nbody_expo + 1.5)), 0.0)  # (T,)

    ke = e_knots.shape[1]
    yk = jnp.sqrt(jnp.maximum(e_knots, 0.0))  # (T, KE)
    y_lo = yk[:, 0]
    y_hi = yk[:, -1]

    # ---- outer domain in w = sqrt(E'_lab)
    w_min = jnp.where(
        (y_lo <= s) & (s <= y_hi), 0.0, jnp.minimum(jnp.abs(y_lo - s), jnp.abs(y_hi - s))
    )
    w_max = y_hi + s
    sb = jnp.sqrt(jnp.maximum(bounds, 0.0))  # (G+1,) or (T, B+1)
    if not clamp:
        w_min = jnp.maximum(w_min, sb[..., 0])
        w_max = jnp.minimum(w_max, sb[..., -1])
    w_min_c = w_min[:, None]
    w_max_c = jnp.maximum(w_max, w_min)[:, None]

    parts = [
        yk + s[:, None],
        jnp.abs(yk - s[:, None]),
        s[:, None],
        w_min_c,
        w_max_c,
    ]
    if angular == "tabular":
        mk = jnp.asarray(mu_knots, dtype=dtype)[None, :]  # (1, KMU)
        for ye in (y_lo, y_hi):
            parts.append(jnp.sqrt(jnp.maximum(ye[:, None] ** 2 + 2.0 * s[:, None] * mk * ye[:, None] + (s**2)[:, None], 0.0)))
        # double-root pair birth: max_y mu_cm(y) = mu_k at w = s sqrt(1 - mu_k^2)
        parts.append(s[:, None] * jnp.sqrt(jnp.maximum(1.0 - mk**2, 0.0)))
        if cross_edges:
            # K x KMU crossing-image family (round-5; round-4 verdict
            # Missing #4): the outer integrand F(w) = int p dy has a C^1
            # kink wherever a mu-knot crossing root coincides with a DATA
            # knot, i.e. mu_cm(y_j; w) = mu_k, whose closed-form image is
            #   w_jk = sqrt((y_j + s mu_k)^2 + s^2 (1 - mu_k^2)).
            # With every such w an outer panel EDGE, each panel's
            # integrand is analytic and GL converges spectrally — this is
            # what takes adversarially rough tabular-angle tables to full
            # 1e-8 relative (the boundary-images-only edge set capped at
            # ~5e-8 rel-significant and did not converge in nq_w).
            mk3 = mk[:, None, :]  # (1, 1, KMU)
            img = jnp.sqrt(
                jnp.maximum(
                    (yk[:, :, None] + s[:, None, None] * mk3) ** 2
                    + (s**2)[:, None, None] * (1.0 - mk3**2),
                    0.0,
                )
            )  # (T, KE, KMU)
            parts.append(img.reshape(tt, -1))
    # graded ladders at both support ends (integrand ~ w near w=0; windows
    # shrink linearly at both ends)
    lad = jnp.asarray(4.0 ** -np.arange(1, 11, dtype=np.float64), dtype=dtype)[None, :]
    span = (w_max_c - w_min_c)
    parts.append(w_min_c + span * lad)
    parts.append(w_max_c - span * lad)
    if group_split != "lagrange":
        parts.insert(0, sb if sb.ndim == 2 else jnp.broadcast_to(sb[None, :], (tt, ng + 1)))
    w_edges = jnp.sort(jnp.clip(jnp.concatenate(parts, axis=1), w_min_c, w_max_c), axis=1)
    npan = w_edges.shape[1] - 1
    pmid = 0.5 * (w_edges[:, 1:] + w_edges[:, :-1])  # (T, P)
    phalf = 0.5 * (w_edges[:, 1:] - w_edges[:, :-1])
    gidx_pan = jnp.clip(_searchsorted_last(bounds, pmid**2), 0, ng - 1)

    xw, ww_ = gl_nodes_weights(nq_w)
    xw = jnp.asarray(xw, dtype=dtype)
    ww_ = jnp.asarray(ww_, dtype=dtype)
    xy, wy_ = gl_nodes_weights(nq_y)
    xy = jnp.asarray(xy, dtype=dtype)
    wy_ = jnp.asarray(wy_, dtype=dtype)

    n_chunks = -(-npan // chunk)
    pad_p = n_chunks * chunk
    pmid_p = jnp.pad(pmid, ((0, 0), (0, pad_p - npan)))
    phalf_p = jnp.pad(phalf, ((0, 0), (0, pad_p - npan)))  # pad: half=0 -> dead
    chunk_ids = jnp.arange(n_chunks) * chunk

    use_window = 0 < ksel < ke
    nsel = ksel if use_window else ke

    # Per-knot-panel affine coefficients of every interpolation channel,
    # computed ONCE at (T, KE-1) and looked up per query with a single
    # payload gather inside the body (round 4: the per-query masked-sum
    # interpolation scan was ~25% of the whole dispatch; the panel
    # coefficients never depended on the query, so the per-query work is
    # only a containment count + one take_along_axis).
    interp_chans = []
    if energy != "nbody":
        interp_chans.append(pdf_e)
    if angular == "kalbach":
        interp_chans += [r_rows, a_rows]
    chan_payload = None
    if interp_chans:
        dxk = e_knots[:, 1:] - e_knots[:, :-1]
        okp = dxk > 0
        dxk_s = jnp.where(okp, dxk, 1.0)
        coef_cols = []
        for c in interp_chans:
            b_c = jnp.where(okp, (c[:, 1:] - c[:, :-1]) / dxk_s, 0.0)
            a_c = jnp.where(okp, c[:, :-1] - b_c * e_knots[:, :-1], c[:, :-1])
            coef_cols += [a_c, b_c]
        chan_payload = jnp.stack(coef_cols, axis=-1)  # (T, KE-1, 2*NCH)

    def body(carry, c0):
        pm = jax.lax.dynamic_slice_in_dim(pmid_p, c0, chunk, axis=1)  # (T, PC)
        ph = jax.lax.dynamic_slice_in_dim(phalf_p, c0, chunk, axis=1)
        w = (pm[:, :, None] + ph[:, :, None] * xw[None, None, :]).reshape(tt, chunk * nq_w)  # (T, NW)
        w_wt = (ph[:, :, None] * ww_[None, None, :]).reshape(tt, chunk * nq_w) * 2.0 * w  # dE' = 2w dw
        nw = chunk * nq_w

        s2 = s[:, None]  # (T,1)
        ylo_i = jnp.maximum(jnp.abs(w - s2), y_lo[:, None])  # (T, NW)
        yhi_i = jnp.minimum(w + s2, y_hi[:, None])
        ok_w = yhi_i > ylo_i

        # ---- inner panel edges in y
        if use_window:
            j0 = jnp.clip(_panel_index_rows(yk, ylo_i), 0, ke - nsel)  # (T, NW)
            # one-hot f32 window selection on the MXU — the f64
            # take_along_axis here lowered to two kCustom scalar gathers
            # measuring 51 ms of a 167 ms dispatch (round-5 profile)
            yk_sel = select.select_windows(yk, j0, nsel)  # (T, NW, nsel)
        else:
            j0 = jnp.zeros((tt, nw), dtype=jnp.int32)
            yk_sel = jnp.broadcast_to(yk[:, None, :], (tt, nw, ke))
        lo_e = ylo_i[..., None]
        hi_e = yhi_i[..., None]
        kn_clip = jnp.clip(yk_sel, lo_e, hi_e)
        if angular == "tabular":
            iparts = [kn_clip, lo_e, hi_e]
            mkv = jnp.asarray(mu_knots, dtype=dtype)[None, None, :]  # (1,1,KMU)
            disc = jnp.maximum((s2**2)[..., None] * mkv**2 + (w**2)[..., None] - (s2**2)[..., None], 0.0)
            sq = jnp.sqrt(disc)
            for sgn in (1.0, -1.0):
                iparts.append(jnp.clip(-s2[..., None] * mkv + sgn * sq, lo_e, hi_e))
            y_edges = jnp.sort(jnp.concatenate(iparts, axis=-1), axis=-1)  # (T, NW, EY)
        else:
            # kalbach/isotropic inner edges are just the clipped knots:
            # sorted rows stay sorted under clip, the window ends bracket
            # them, and out-of-window knots collapse to dead (zero-width)
            # edge panels — identical multiset to the sorted concat, so
            # the (T, NW, EY) jnp.sort is pure waste here (inner-edge
            # construction was ~16% of the dispatch, round-4 ablation)
            y_edges = jnp.concatenate([lo_e, kn_clip, hi_e], axis=-1)  # (T, NW, EY)
        sy = y_edges.shape[-1] - 1
        ymid = 0.5 * (y_edges[..., 1:] + y_edges[..., :-1])  # (T, NW, SY)
        yhalf = 0.5 * (y_edges[..., 1:] - y_edges[..., :-1])
        y = ymid[..., None] + yhalf[..., None] * xy  # (T, NW, SY, QY)
        wgt_y = (yhalf[..., None] * wy_) * ok_w[..., None, None]

        x = y * y  # E'_cm at nodes
        xm = (ymid * ymid).reshape(tt, nw * sy)  # panel-constant interp selectors
        w4 = w[:, :, None, None]
        mu = (w4**2 - (s2[..., None, None]) ** 2 - x) / jnp.maximum(2.0 * s2[..., None, None] * y, 1e-30)
        mu = jnp.clip(mu, -1.0, 1.0)
        mu_lab = (w4**2 + (s2[..., None, None]) ** 2 - x) / jnp.maximum(2.0 * s2[..., None, None] * w4, 1e-30)
        mu_lab = jnp.clip(mu_lab, -1.0, 1.0)

        # Interpolation channels. For knot-delimited inner edges (kalbach /
        # isotropic / nbody) the y-panel -> knot-panel correspondence is
        # STATIC: y_edges = [lo, clip(knots j0..j0+nsel-1), hi], so live
        # panel p lies in knot panel j0 + p - 1 (panel 0 is always dead:
        # kn_clip[0] collapses onto lo). The containment count + dynamic
        # payload gather of rounds 4-5 (29 ms of a 167 ms dispatch) are
        # replaced by one MXU window selection + a static panel shift;
        # dead (clip-collapsed) panels may read an arbitrary finite panel
        # payload — their contribution is zeroed by wgt_y. The tabular
        # path keeps the count (its inner edges interleave mu-crossing
        # roots with the knots, so the correspondence is data-dependent)
        # but does the payload lookup as a one-hot MXU selection too.
        cf = None
        if chan_payload is not None:
            if angular == "tabular":
                cnt = jnp.sum(
                    (yk_sel[:, :, None, :] <= ymid[..., None]).astype(jnp.int32), axis=-1
                )  # (T, NW, SY)
                jq = j0[:, :, None] + jnp.clip(cnt - 1, 0, nsel - 2)
                jq = jnp.clip(jq, 0, ke - 2)
                cf = select.select_rows(chan_payload, jq.reshape(tt, nw * sy)).reshape(
                    tt, nw, sy, chan_payload.shape[-1]
                )
            elif use_window:
                # cf[p] = payload[clip(j0 + p - 1, 0, ke-2)] via one window
                # selection of the payload extended by a duplicated first
                # row (payext[i] = payload[max(i - 1, 0)])
                payext = jnp.concatenate([chan_payload[:, :1], chan_payload], axis=1)
                cf = select.select_windows(payext, j0, nsel + 1)  # (T, NW, SY, C)
            else:
                p_idx = np.clip(np.arange(ke + 1) - 1, 0, ke - 2)  # static
                cf = chan_payload[:, p_idx, :][:, None]  # (T, 1, SY, C) broadcast

        if energy == "nbody":
            pe = (
                c_norm[:, None, None, None]
                * y
                * jnp.maximum(nbody_emax[:, None, None, None] - x, 0.0) ** nbody_expo
            )
            # measure already includes dE'_cm = 2y dy? No: p_E is per unit
            # E'_cm and the change of variables integrates dy directly with
            # |J| = 1/s — the 2y from dE'_cm = 2y dy is NOT applied because
            # the Jacobian was computed for (E'_lab, y) directly. p_E(y^2)
            # here carries only sqrt(E'_cm) = y from the phase-space form.
        else:
            pe = cf[..., 0:1] + cf[..., 1:2] * x

        if angular == "kalbach":
            off = 0 if energy == "nbody" else 2
            rr = cf[..., off : off + 1] + cf[..., off + 1 : off + 2] * x
            aa = cf[..., off + 2 : off + 3] + cf[..., off + 3 : off + 4] * x
            aa = jnp.maximum(aa, 1e-12)
            # two-exp form of a/(2 sinh a) (cosh(a mu) + r sinh(a mu)):
            # cosh + r sinh = ((1+r) e^{a mu} + (1-r) e^{-a mu})/2 and
            # 2 sinh a = e^a - e^{-a}, so ONE exp pair + reciprocals replaces
            # three full-tensor transcendentals — the f64-emulated sinh/cosh
            # were the measured cost center of the production Kalbach
            # dispatch (~3 transcendentals/eval at ~2.3M evals/row, round 3)
            ex = jnp.exp(aa * mu)
            # denominator 2 sinh(aa) via expm1: e^a - e^-a = em (2 + em)/(1 + em)
            # with em = expm1(aa). The naive e^a - e^-a cancels catastrophically
            # for small aa (~eps/(2 aa) relative, ~1e-4 at the 1e-12 clamp that
            # every a=0/near-isotropic law-44 knot hits); expm1 is exact there
            # and aa/em -> 1 smoothly (round-4 advisor finding).
            em = jnp.expm1(aa)
            # single fused divide (f64-emulated divides are ~as costly as
            # the remaining per-node arithmetic): (1-r)/ex folded into one
            # quotient via ex^2 in the numerator
            num = aa * ((1.0 + rr) * (ex * ex) + (1.0 - rr)) * (1.0 + em)
            pa = num / (ex * (2.0 * em * (2.0 + em)))
        elif angular == "tabular":
            kmu = mu_knots.shape[0]
            je = _panel_index_rows(e_knots, xm)  # (T, NW*SY)
            mum = (
                (w[:, :, None] ** 2 - (s2[..., None]) ** 2 - ymid * ymid)
                / jnp.maximum(2.0 * s2[..., None] * ymid, 1e-30)
            ).reshape(tt, nw * sy)
            mum = jnp.clip(mum, -1.0, 1.0)
            jm = _panel_index_rows(jnp.broadcast_to(jnp.asarray(mu_knots, dtype=dtype)[None, :], (tt, kmu)), mum)
            flat = mu_pdf.reshape(tt, ke * kmu)
            f00 = je * kmu + jm
            c00 = jnp.take_along_axis(flat, f00, axis=1).reshape(tt, nw, sy)
            c01 = jnp.take_along_axis(flat, f00 + 1, axis=1).reshape(tt, nw, sy)
            c10 = jnp.take_along_axis(flat, f00 + kmu, axis=1).reshape(tt, nw, sy)
            c11 = jnp.take_along_axis(flat, f00 + kmu + 1, axis=1).reshape(tt, nw, sy)
            ek0 = jnp.take_along_axis(e_knots, je, axis=1).reshape(tt, nw, sy)
            ek1 = jnp.take_along_axis(e_knots, je + 1, axis=1).reshape(tt, nw, sy)
            mk0 = jnp.take(jnp.asarray(mu_knots, dtype=dtype), jm).reshape(tt, nw, sy)
            mk1 = jnp.take(jnp.asarray(mu_knots, dtype=dtype), jm + 1).reshape(tt, nw, sy)
            t_e = jnp.clip(
                (x - ek0[..., None]) / jnp.maximum(ek1[..., None] - ek0[..., None], 1e-30), 0.0, 1.0
            )
            t_m = jnp.clip(
                (mu - mk0[..., None]) / jnp.maximum(mk1[..., None] - mk0[..., None], 1e-30), 0.0, 1.0
            )
            lo_mix = c00[..., None] + t_m * (c01[..., None] - c00[..., None])
            hi_mix = c10[..., None] + t_m * (c11[..., None] - c10[..., None])
            pa = lo_mix + t_e * (hi_mix - lo_mix)
        else:  # isotropic
            pa = 0.5

        wgt = pe * pa * wgt_y  # (T, NW, SY, QY)
        p_prev = jnp.ones_like(mu_lab)
        m_list = [jnp.sum(wgt, axis=(2, 3))]  # (T, NW)
        if order >= 1:
            p_cur = mu_lab
            m_list.append(jnp.sum(wgt * p_cur, axis=(2, 3)))
            for l in range(1, order):
                p_next = ((2 * l + 1) * mu_lab * p_cur - l * p_prev) / (l + 1)
                p_prev, p_cur = p_cur, p_next
                m_list.append(jnp.sum(wgt * p_cur, axis=(2, 3)))
        if group_split == "lagrange":
            # node values of the DENSITY g(w) = dF/dw (2w from dE' = 2w dw,
            # 1/s Jacobian) — panel half-widths and GL weights are applied
            # by lagrange_cumulants, NOT here
            mnode = jnp.stack(m_list, axis=-1) * (2.0 * w * inv_s[:, None])[..., None]
            vals = mnode.reshape(tt, chunk, nq_w, order + 1)
            acc = jax.lax.dynamic_update_slice(carry, vals, (0, c0, 0, 0))
        else:
            mnode = jnp.stack(m_list, axis=-1) * (w_wt * inv_s[:, None])[..., None]  # (T, NW, L+1)
            vals = mnode.reshape(tt, chunk, nq_w, order + 1).sum(axis=2)  # (T, PC, L+1)
            acc = jax.lax.dynamic_update_slice_in_dim(
                carry, jax.lax.dynamic_slice_in_dim(carry, c0, chunk, axis=1) + vals, c0, axis=1
            )
        return acc, None

    if group_split == "lagrange":
        from ndpp_tpu.ops.panelsplit import lagrange_cumulants

        init = jnp.zeros((tt, pad_p, nq_w, order + 1), dtype=dtype) + (0.0 * e)[:, None, None, None]
        gvals, _ = jax.lax.scan(body, init, chunk_ids)
        # effective boundaries: with clamping the edge groups absorb the
        # below-/above-window mass, so the outermost boundaries are the
        # DOMAIN ends (w_min, w_max); without clamping the domain was
        # already clipped to [sb_0, sb_G] above
        inner = sb[:, 1:-1] if sb.ndim == 2 else jnp.broadcast_to(sb[1:-1][None, :], (tt, ng - 1))
        if clamp:
            b_arr = jnp.concatenate(
                [w_min[:, None], inner, jnp.maximum(w_max, w_min)[:, None]], axis=1
            )
        else:
            b_arr = sb if sb.ndim == 2 else jnp.broadcast_to(sb[None, :], (tt, ng + 1))
        cumul = lagrange_cumulants(
            w_edges, pmid_p, phalf_p, gvals, ww_, b_arr, npan, nq_w
        )  # (T, G+1, L+1)
        out = cumul[:, 1:, :] - cumul[:, :-1, :]
        return jnp.swapaxes(out, 1, 2)

    init = jnp.zeros((tt, pad_p, order + 1), dtype=dtype) + (0.0 * e)[:, None, None]
    panel_vals, _ = jax.lax.scan(body, init, chunk_ids)

    gpad = jnp.pad(gidx_pan, ((0, 0), (0, pad_p - npan)))

    def row_scatter(vals_row, g_row):
        return jnp.zeros((ng, order + 1), dtype=vals_row.dtype).at[g_row].add(vals_row)

    out = jax.vmap(row_scatter)(panel_vals, gpad)  # (T, G, L+1)
    return jnp.swapaxes(out, 1, 2)
