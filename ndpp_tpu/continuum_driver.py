"""Continuum-law scattering-moment driver (config 4, BASELINE.json:10).

Maps each law of a continuum reaction onto the matching device kernel
(ops.continuum / ops.chi), weights by the law applicability p(E), and sums.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ndpp_tpu.host import unionize
from ndpp_tpu.host.prep_continuum import ContinuumPrepared, prepare_continuum
from ndpp_tpu.ops.chi import analytic_group_fractions
from ndpp_tpu.ops.continuum import cm_moments, lab_tabular_moments
from ndpp_tpu.utils.errors import AceFormatError, NdppError

_CONTINUUM_TILE = 256  # CM kernel materializes (T, S, QE, L+1); keep tiles modest

# Outer-mu panel base edges for CM kernels: uniform panels plus geometric
# clustering toward mu = -1, where the CM->lab fold (E'_lab -> small for
# backward emission) creates a boundary layer that defeats uniform GL.
_MU_GRADED = np.sort(np.unique(np.concatenate([np.linspace(-1.0, 1.0, 9), -1.0 + 2.0 * 0.25 ** np.arange(1, 11)])))


def _mu_panel_edges(
    e_rows: np.ndarray, awr: float, bounds: np.ndarray, data_knots: np.ndarray | None
) -> np.ndarray:
    """Per-row outer-mu panel edges (T, PM+1), sorted, padded with +1.

    Includes the closed-form fold kink angles mu*_g = -sqrt(1 - E_b/s^2)
    (s^2 = E/(A+1)^2) for every group boundary below s^2 — the outer-mu
    integrand has a sqrt-type kink there (a lab group becomes reachable
    through the backward fold), which would otherwise cap GL convergence.
    """
    base = _MU_GRADED
    if data_knots is not None:
        base = np.union1d(base, np.asarray(data_knots, dtype=np.float64))
    ne = e_rows.size
    # For fine structures the per-boundary fold kinks are individually tiny;
    # cap the inserted set (decimate uniformly) so the outer scan length does
    # not scale with G (the uncapped version scales O(G) panels and
    # overwhelmed the worker at 361 groups; exactness is retained for
    # structures below the cap).
    if bounds.size > 49:
        idx = np.unique(np.linspace(0, bounds.size - 1, 49).astype(int))
        bounds = bounds[idx]
    s2 = e_rows / (awr + 1.0) ** 2  # (T,)
    ratio = bounds[None, :] / np.maximum(s2[:, None], 1e-300)  # (T, <=49)
    with np.errstate(invalid="ignore"):
        mustar = -np.sqrt(np.clip(1.0 - ratio, 0.0, None))  # 0 where unreachable
    mustar = np.where((ratio > 0.0) & (ratio < 1.0), mustar, 1.0)  # park dead entries at +1
    edges = np.concatenate([np.broadcast_to(base, (ne, base.size)), mustar], axis=1)
    return np.sort(edges, axis=1)


def _tiles(ne: int, cap: int):
    tile = 1
    while tile < ne and tile < cap:
        tile *= 2
    tile = min(tile, cap)
    return tile, unionize.tile_indices(ne, tile)


def _law_moments(prep: ContinuumPrepared, gs, order, cfg, awr: float) -> np.ndarray:
    """(NE, L+1, G) for one law (unweighted)."""
    ne = prep.e.size
    ng = gs.ng
    bounds = jnp.asarray(gs.bounds)
    clamp = cfg.clamp_outside
    out = np.zeros((ne, order + 1, ng))

    if prep.kind == "lab-analytic":
        law = prep.extra["law"]
        tile, spans = _tiles(ne, 4096)
        pending = []
        for start, length in spans:
            e_t = unionize.pad_to(prep.e[start : start + length], tile)
            th_t = unionize.pad_to(prep.extra["theta"][start : start + length], tile)
            b_t = unionize.pad_to(prep.extra["b"][start : start + length], tile)
            frac = analytic_group_fractions(
                jnp.asarray(e_t), jnp.asarray(th_t), jnp.asarray(b_t), prep.extra["u"], bounds, law, clamp
            )
            pending.append((start, length, frac))
        for start, length, frac in pending:
            out[start : start + length, 0, :] = np.asarray(frac)[:length]
        return out  # isotropic lab: moments l >= 1 vanish

    if prep.kind == "lab-tabular":
        k16 = -(-prep.e_knots.shape[1] // 16) * 16
        kn = unionize.pad_to(prep.e_knots, k16, axis=1)
        pd = unionize.pad_to(prep.pdf, k16, axis=1)
        mm = unionize.pad_to(prep.mom_knots, k16, axis=1)
        tile, spans = _tiles(ne, 1024)
        pending = []
        for start, length in spans:
            res = lab_tabular_moments(
                jnp.asarray(unionize.pad_to(kn[start : start + length], tile)),
                jnp.asarray(unionize.pad_to(pd[start : start + length], tile)),
                jnp.asarray(unionize.pad_to(mm[start : start + length], tile)),
                bounds,
                order,
                8,
                clamp,
            )
            pending.append((start, length, res))
        for start, length, res in pending:
            out[start : start + length] = np.asarray(res)[:length]
        return out

    if prep.kind in ("cm-kalbach", "cm-tabular", "cm-nbody"):
        angular = {"cm-kalbach": "kalbach", "cm-tabular": "tabular", "cm-nbody": "isotropic"}[prep.kind]
        energy = "nbody" if prep.kind == "cm-nbody" else "tabular"
        data_mu = prep.mu_knots if prep.kind == "cm-tabular" else None
        mu_edges = _mu_panel_edges(prep.e, awr, gs.bounds, data_mu)
        if energy == "nbody":
            kn = pd = np.zeros((ne, 2))
            rr = aa = np.zeros((ne, 2))
            muk = np.array([-1.0, 1.0])
            mup = np.zeros((ne, 2, 2))
            emax = prep.nbody_emax
        else:
            k16 = -(-prep.e_knots.shape[1] // 16) * 16
            kn = unionize.pad_to(prep.e_knots, k16, axis=1)
            pd = unionize.pad_to(prep.pdf, k16, axis=1)
            if prep.kind == "cm-kalbach":
                rr = unionize.pad_to(prep.r_rows, k16, axis=1)
                aa = unionize.pad_to(prep.a_rows, k16, axis=1)
                muk = np.array([-1.0, 1.0])
                mup = np.zeros((ne, kn.shape[1], 2))
            else:
                rr = aa = np.zeros_like(kn)
                muk = prep.mu_knots
                mup = unionize.pad_to(prep.mu_pdf, k16, axis=1)
            emax = np.zeros(ne)
        # fine structures: smaller tiles keep the scanned program within the
        # worker's appetite (tile-256 x 361-group cm programs faulted it)
        tile, spans = _tiles(ne, _CONTINUUM_TILE if gs.ng <= 64 else 64)
        pending = []
        for start, length in spans:
            sl = slice(start, start + length)
            res = cm_moments(
                jnp.asarray(unionize.pad_to(prep.e[sl], tile)),
                jnp.asarray(unionize.pad_to(kn[sl], tile)),
                jnp.asarray(unionize.pad_to(pd[sl], tile)),
                jnp.asarray(unionize.pad_to(rr[sl], tile)),
                jnp.asarray(unionize.pad_to(aa[sl], tile)),
                jnp.asarray(unionize.pad_to(mu_edges[sl], tile)),
                jnp.asarray(muk),
                jnp.asarray(unionize.pad_to(mup[sl], tile)),
                jnp.asarray(unionize.pad_to(emax[sl], tile)),
                float(prep.nbody_expo or 0.0),
                bounds,
                awr,
                order,
                max(cfg.device.quad_points, 16),
                # outer-mu order: the nbody energy-ladder knots sweep many
                # C^1 kinks through mu (convergence study in tests), so that
                # path needs a higher outer order than the tabular laws.
                # Fine group structures halve the order to bound the scan
                # length (panel count already grows with the mu-kink cap).
                (64 if energy == "nbody" else 24) if gs.ng <= 64 else (32 if energy == "nbody" else 12),
                angular,
                energy,
                clamp,
            )
            pending.append((sl, length, res))
        for sl, length, res in pending:
            out[sl] = np.asarray(res)[:length]
        return out

    raise NdppError(f"unknown continuum preparation kind {prep.kind!r}")


def continuum_reaction_moments(nuc, rxn, e_grid, gs, order, cfg, metrics=None) -> np.ndarray:
    """Applicability-weighted sum over the reaction's law chain: (NE, L+1, G)."""
    if not rxn.energy_dists:
        raise AceFormatError(f"MT={rxn.mt}: no energy distribution")
    total = np.zeros((e_grid.size, order + 1, gs.ng))
    for ed in rxn.energy_dists:
        prep = prepare_continuum(nuc, rxn, ed, e_grid, order)
        if metrics is not None and prep.padded_elements:
            metrics.record_padding(prep.real_elements, prep.padded_elements)
        mom = _law_moments(prep, gs, order, cfg, nuc.awr)
        total += prep.applicability[:, None, None] * mom
    return total
