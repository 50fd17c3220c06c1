"""Bound-thermal S(alpha,beta) transfer-moment kernels.

Three device paths, one per thermal ACE representation (host/ace/thermal.py;
the counterpart of the reference's thermal scattering branch — per-claim
citations impossible with the mount empty, SURVEY.md section 0):

- continuous (IFENG=2): per incident energy a tabulated E' pdf whose knots
  carry discrete-cosine sets. pdf and the per-knot Legendre factors are
  both lin-lin in E', so each (panel x group) overlap integrand is a
  QUADRATIC polynomial — 2-point Gauss-Legendre integrates it exactly.
  No quadrature error anywhere in this kernel.
- discrete (IFENG=0/1): weighted outgoing lines with equiprobable cosine
  sets — an exact scatter-add over group indices.
- coherent elastic: Bragg edges; mu_k(E) = 1 - 2 E_k / E with weights from
  the cumulative structure sums. Exact closed form at every E.

All kernels are jit-compiled with static (order,) and respect the package
f64 default. Shapes: rows axis T is the (padded) incident-energy tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ndpp_tpu.ops.legendre import legendre_all

_INV_SQRT3 = 0.5773502691896257645091488


@partial(jax.jit, static_argnames=("order",))
def thermal_continuous_moments(e_knots, pdf, am, bounds, order: int):
    """Exact group moments of a lin-lin (E' pdf x per-knot Legendre factor).

    e_knots: (T, P) ascending (pad by repeating the last knot with pdf 0);
    pdf: (T, P) 1/eV; am: (T, P, L+1) per-knot angular Legendre factors;
    bounds: (G+1,). Returns (T, L+1, G).
    """
    e0, e1 = e_knots[:, :-1], e_knots[:, 1:]  # (T, Pm1)
    p0, p1 = pdf[:, :-1], pdf[:, 1:]
    a0, a1 = am[:, :-1, :], am[:, 1:, :]
    de = jnp.maximum(e1 - e0, 1e-30)

    lo = jnp.maximum(e0[:, :, None], bounds[None, None, :-1])  # (T, Pm1, G)
    hi = jnp.minimum(e1[:, :, None], bounds[None, None, 1:])
    half = jnp.maximum(0.5 * (hi - lo), 0.0)
    mid = 0.5 * (hi + lo)

    out = 0.0
    for xq in (-_INV_SQRT3, _INV_SQRT3):  # 2-pt GL: exact for quadratics
        x = mid + half * xq
        frac = (x - e0[:, :, None]) / de[:, :, None]
        p = p0[:, :, None] + frac * (p1 - p0)[:, :, None]
        a = a0[:, :, None, :] + frac[..., None] * (a1 - a0)[:, :, None, :]
        out = out + half[..., None] * p[..., None] * a  # (T, Pm1, G, L+1)
    return jnp.transpose(jnp.sum(out, axis=1), (0, 2, 1))  # (T, L+1, G)


@partial(jax.jit, static_argnames=("clamp",))
def thermal_discrete_moments(e_out, w, am, bounds, clamp: bool = True):
    """Exact moments of weighted discrete outgoing lines (IFENG < 2).

    e_out: (T, J) eV; w: (J,) shared line probabilities; am: (T, J, L+1)
    cosine-set Legendre factors; bounds: (G+1,). Returns (T, L+1, G).
    Delegates to the shared discrete-lines engine (ops/continuum.py).
    """
    from ndpp_tpu.ops.continuum import discrete_lines_moments

    return discrete_lines_moments(
        e_out, jnp.broadcast_to(w[None, :], e_out.shape), am, bounds, clamp
    )


@partial(jax.jit, static_argnames=("order",))
def coherent_elastic_moments(e, edges, s, bounds, order: int):
    """Coherent (Bragg) elastic moments placed in the incident group.

    e: (T,) eV; edges: (B,) ascending Bragg energies; s: (B,) per-edge
    structure weights (b*eV increments of the cumulative sums); bounds:
    (G+1,). Returns (T, L+1, G); rows with E below the first edge are zero
    (their cross section is zero too).
    """
    ng = bounds.shape[0] - 1
    act = (edges[None, :] <= e[:, None]).astype(e.dtype)  # (T, B)
    mu = jnp.clip(1.0 - 2.0 * edges[None, :] / jnp.maximum(e[:, None], 1e-30), -1.0, 1.0)
    wgt = s[None, :] * act
    tot = jnp.sum(wgt, axis=1)  # (T,)
    pl = legendre_all(mu, order)  # (T, B, L+1)
    f = jnp.einsum("tb,tbl->tl", wgt, pl) / jnp.maximum(tot, 1e-30)[:, None]
    f = jnp.where(tot[:, None] > 0, f, 0.0)
    g = jnp.clip(jnp.searchsorted(bounds, e, side="right") - 1, 0, ng - 1)
    onehot = (g[:, None] == jnp.arange(ng)[None, :]).astype(e.dtype)
    return f[:, :, None] * onehot[:, None, :]


@jax.jit
def incoherent_elastic_placement(f, e, bounds):
    """Place per-row elastic moment vectors f (T, L+1) into the group of E."""
    ng = bounds.shape[0] - 1
    g = jnp.clip(jnp.searchsorted(bounds, e, side="right") - 1, 0, ng - 1)
    onehot = (g[:, None] == jnp.arange(ng)[None, :]).astype(f.dtype)
    return f[:, :, None] * onehot[:, None, :]
