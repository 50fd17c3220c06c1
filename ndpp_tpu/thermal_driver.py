"""Bound-thermal S(alpha,beta) replacement driver.

For nuclides with an S(alpha,beta) assignment (cfg.sab), the 0K elastic
channel below the thermal table's validity range is replaced by the bound
thermal channels (chemical binding + lattice coherence — physics the
free-gas model cannot represent):

    f_new = [ f_0K * sigma_s - sigma_el * f_el_0K
              + sigma_inel_th * f_inel_th + sigma_el_th * f_el_th ]
            / (sigma_s - sigma_el + sigma_inel_th + sigma_el_th)

Free-gas replacement then applies only ABOVE the table range (standard
practice: S(alpha,beta) supersedes free-gas where tabulated; the driver
passes e_min to apply_freegas).

Moment conventions (documented; unverifiable against the reference with
the mount empty, SURVEY.md section 0):
- inelastic moments are computed exactly at the table's incident energies
  (the only energies where the table defines data) and lin-log-interpolated
  onto union-grid rows — the shapes are smooth in E;
- elastic moments are E'-preserving deltas, so their GROUP PLACEMENT is
  evaluated exactly at every union-grid row (interpolating placed matrices
  across group boundaries would smear the delta); coherent (Bragg) rows
  are closed-form per row, discontinuities included.
"""

from __future__ import annotations

import numpy as np

from ndpp_tpu.config import BOLTZMANN_EV_PER_K
from ndpp_tpu.host.ace.thermal import ThermalTable
from ndpp_tpu.host.prep_thermal import _pad_pow2, prepare_thermal
from ndpp_tpu.utils import log as log_mod


def resolve_tables(names: list[str], idx=None) -> list[ThermalTable]:
    """Resolve thermal table names: library index first, then built-in fixtures."""
    from ndpp_tpu.host.ace.thermal import read_thermal_ace
    from ndpp_tpu.utils.errors import ConfigError

    out = []
    for name in names:
        path = None
        if idx is not None:
            try:
                path = idx.path_for(name)
            except Exception:
                path = None
        if path is not None:
            out.append(read_thermal_ace(path))
            continue
        from ndpp_tpu.host.ace import synth

        base = name.split(".")[0]
        if base in synth.THERMAL_FIXTURES:
            out.append(synth.build_thermal(base))
        else:
            raise ConfigError(f"thermal S(alpha,beta) table {name!r} not found in library or fixtures")
    return out


def match_tables(tables: list[ThermalTable], temps_k: list[float]):
    """Match each requested temperature to the nearest-kT table (or None)."""
    out = []
    for t_k in temps_k:
        kt = BOLTZMANN_EV_PER_K * t_k
        best = None
        for tab in tables:
            if best is None or abs(tab.kT - kt) < abs(best.kT - kt):
                best = tab
        if best is not None and abs(best.kT - kt) > 0.25 * kt:
            log_mod.get().warning(
                "sab: nearest table %s (kT=%.4g eV) is far from requested T=%.6g K", best.name, best.kT, t_k
            )
        out.append(best)
    return out


def _interp_rows(e_rows: np.ndarray, e_tab: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Lin-log-E interpolation of (NEtab, ...) onto (NR, ...)."""
    from ndpp_tpu.host.unionize import interp_rows_loglin

    return interp_rows_loglin(e_rows, e_tab, vals)


def apply_sab(scatter: np.ndarray, nuc, gs, cfg, e_grid: np.ndarray, tables, metrics=None) -> np.ndarray:
    """scatter: (NT, NE, L+1, G) 0K combined moments; returns corrected array.

    tables: per-temperature ThermalTable (from match_tables); None entries skip.
    """
    import jax.numpy as jnp

    from ndpp_tpu import driver as driver_mod
    from ndpp_tpu.host import unionize
    from ndpp_tpu.ops.thermal import (
        coherent_elastic_moments,
        incoherent_elastic_placement,
        thermal_continuous_moments,
        thermal_discrete_moments,
    )

    log = log_mod.get()
    order = scatter.shape[2] - 1

    # 0K per-reaction weights on the union grid (same convention as the combine)
    rxns = nuc.scattering_reactions(include_fission=False)
    sigma_el = nuc.sigma_el
    if not np.array_equal(e_grid, nuc.energy):
        sigma_el = np.interp(e_grid, nuc.energy, sigma_el)
    sigma_s = np.zeros_like(e_grid)
    for rxn in rxns:
        sig = nuc.sigma_on_grid(rxn)
        if not np.array_equal(e_grid, nuc.energy):
            sig = np.interp(e_grid, nuc.energy, sig)
        sigma_s += sig

    bounds_cl = gs.bounds.copy()
    if cfg.clamp_outside:
        # both edges must swallow out-of-range outgoing energies (same
        # semantics as every other kernel's clamp): thermal E' can exceed
        # the top boundary of a coarse user structure
        bounds_cl[0] = 0.0
        bounds_cl[-1] = np.inf
    bounds_d = jnp.asarray(bounds_cl)

    prep_cache: dict[str, object] = {}
    for k, tab in enumerate(tables):
        if tab is None:
            continue
        n_rows = int(np.searchsorted(e_grid, tab.e_max, side="right"))
        if n_rows == 0:
            continue
        rows = slice(0, n_rows)
        e_rows = e_grid[rows]
        prep = prep_cache.get(tab.name)
        if prep is None:
            prep = prep_cache[tab.name] = prepare_thermal(tab, order)

        # --- inelastic channel at the table's incident energies
        ne_t = prep.e_in.size
        pad_t = _pad_pow2(ne_t)
        if prep.kind == "continuous":
            ek = np.concatenate([prep.e_knots, np.repeat(prep.e_knots[-1:], pad_t - ne_t, 0)])
            pf = np.concatenate([prep.pdf, np.zeros((pad_t - ne_t,) + prep.pdf.shape[1:])])
            am = np.concatenate([prep.am, np.repeat(prep.am[-1:], pad_t - ne_t, 0)])
            f_tab = np.asarray(
                thermal_continuous_moments(
                    jnp.asarray(ek), jnp.asarray(pf), jnp.asarray(am), bounds_d, order
                )
            )[:ne_t]
            f_inel = _interp_rows(e_rows, prep.e_in, f_tab)  # (NR, L+1, G)
        else:
            # discrete lines are deltas: interpolating PLACED (L+1, G)
            # matrices across incident energy would smear each line over
            # two groups near its crossing. Instead interpolate the line
            # ENERGIES and angular factors onto every union row and place
            # exactly per row (same policy as prep_continuum ND>0 lines).
            if ne_t > 1:
                ii = np.clip(np.searchsorted(prep.e_in, e_rows, side="right") - 1, 0, ne_t - 2)
                tf = np.clip(
                    (e_rows - prep.e_in[ii]) / (prep.e_in[ii + 1] - prep.e_in[ii]), 0.0, 1.0
                )
                e_lines = (1 - tf)[:, None] * prep.e_out[ii] + tf[:, None] * prep.e_out[ii + 1]
                am_lines = (
                    (1 - tf)[:, None, None] * prep.am_lines[ii]
                    + tf[:, None, None] * prep.am_lines[ii + 1]
                )
            else:
                e_lines = np.broadcast_to(prep.e_out[0], (n_rows,) + prep.e_out.shape[1:])
                am_lines = np.broadcast_to(prep.am_lines[0], (n_rows,) + prep.am_lines.shape[1:])
            pad_rr = _pad_pow2(n_rows, lo=64)
            e_pad_l = unionize.pad_to(np.ascontiguousarray(e_lines), pad_rr)
            am_pad_l = unionize.pad_to(np.ascontiguousarray(am_lines), pad_rr)
            f_inel = np.asarray(
                thermal_discrete_moments(
                    jnp.asarray(e_pad_l), jnp.asarray(prep.w_lines), jnp.asarray(am_pad_l),
                    bounds_d, clamp=cfg.clamp_outside,
                )
            )[:n_rows]
        sig_i = np.interp(e_rows, prep.e_in, prep.sigma_in, left=0.0, right=0.0)

        # --- elastic channel, exact placement per row
        sig_e = np.zeros_like(e_rows)
        f_el = np.zeros_like(f_inel)
        pad_r = _pad_pow2(n_rows, lo=64)
        e_pad = unionize.pad_to(e_rows, pad_r)
        if prep.elastic_kind == "coherent":
            sig_e = tab.elastic.sigma_at(e_rows)
            f_el = np.asarray(
                coherent_elastic_moments(
                    jnp.asarray(e_pad), jnp.asarray(prep.e_el), jnp.asarray(prep.bragg_s),
                    bounds_d, order,
                )
            )[:n_rows]
        elif prep.elastic_kind == "incoherent":
            sig_e = np.interp(e_rows, prep.e_el, prep.sigma_el, left=0.0, right=0.0)
            fvec = _interp_rows(e_rows, prep.e_el, prep.am_el)  # (NR, L+1)
            fvec = np.concatenate([fvec, np.zeros((pad_r - n_rows, order + 1))])
            f_el = np.asarray(
                incoherent_elastic_placement(jnp.asarray(fvec), jnp.asarray(e_pad), bounds_d)
            )[:n_rows]

        # --- 0K elastic moments to subtract (same machinery as the combine).
        # The tile argument is a CAP (resolved by rows.tile_for inside);
        # passing cfg.device.e_tile keeps compiled shapes canonical — a
        # data-dependent pow2(n_rows) cap here was a per-nuclide compile
        # churn source (round-5 fix of the round-4 tile-cap rule).
        f_el0k = driver_mod._tiled_twobody(
            nuc, nuc.elastic, e_rows, gs.bounds, order, cfg.device.quad_points,
            cfg.device.e_tile, None, cfg.clamp_outside,
        )

        num = (
            scatter[k, rows] * sigma_s[rows, None, None]
            - sigma_el[rows, None, None] * f_el0k
            + sig_i[:, None, None] * f_inel
            + sig_e[:, None, None] * f_el
        )
        den = sigma_s[rows] - sigma_el[rows] + sig_i + sig_e
        ok = den > 0
        scatter[k, rows] = np.where(ok[:, None, None], num / np.where(ok, den, 1.0)[:, None, None], scatter[k, rows])
        if metrics is not None:
            metrics.moments_computed += f_inel.size + f_el.size
        log.debug(
            "sab: %s <- %s replaced %d rows below %.4g eV (%s inelastic, %s elastic)",
            nuc.name, tab.name, n_rows, tab.e_max, prep.kind, prep.elastic_kind,
        )
    return scatter


def sab_e_max(tables) -> list[float]:
    """Per-temperature free-gas lower limits implied by the sab tables."""
    return [0.0 if t is None else t.e_max for t in tables]
