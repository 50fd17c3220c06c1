"""Fission chi collapse (config 4, BASELINE.json:10; SURVEY.md section 3.4).

chi_g'(E) = integral over g' of p(E'|E) from the fission MT's law chain
(prompt), plus precursor-weighted delayed spectra:

    chi_prompt_g(E)  = sum_laws p_law(E) * frac_law(E, g)
    chi_delayed_g(E) = sum_k P_k(E) * frac_k(E, g)   (P_k from the BDD block)
    chi_total_g(E)   = [nu_p chi_p + nu_d chi_d] / nu_t

Fission secondary energies are lab-frame in ACE; the energy pdf is collapsed
directly. nu-bar curves are evaluated on the same incident grid and stored.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ndpp_tpu import banding
from ndpp_tpu.host import unionize
from ndpp_tpu.host.prep_continuum import prepare_continuum
from ndpp_tpu.ops.chi import analytic_group_fractions, tabular_group_fractions
from ndpp_tpu.utils import log as log_mod
from ndpp_tpu.utils.errors import AceFormatError
from ndpp_tpu.utils.metrics import RunMetrics

FISSION_MTS = (18, 19, 20, 21, 38)


def _law_fractions(prep, gs, cfg, metrics=None) -> np.ndarray:
    """(NE, G) group fractions of one law's energy pdf (row-sharded dispatch)."""
    from ndpp_tpu.parallel import rows as rows_mod

    ne = prep.e.size
    bounds = rows_mod.put_replicated(gs.bounds)
    clamp = cfg.clamp_outside
    out = np.zeros((ne, gs.ng))
    if prep.kind == "lab-analytic":
        tile = rows_mod.tile_for(ne, 4096, cfg.device.e_tile)
        pending = []
        with RunMetrics.span_or_null(metrics, "dispatch.chi"):
          for start, length in unionize.tile_indices(ne, tile):
            frac = analytic_group_fractions(
                rows_mod.put_rows(unionize.pad_to(prep.e[start : start + length], tile)),
                rows_mod.put_rows(unionize.pad_to(prep.extra["theta"][start : start + length], tile)),
                rows_mod.put_rows(unionize.pad_to(prep.extra["b"][start : start + length], tile)),
                prep.extra["u"],
                bounds,
                prep.extra["law"],
                clamp,
            )
            pending.append((start, length, frac))
        with RunMetrics.span_or_null(metrics, "wait.chi"):
            for start, length, frac in pending:
                out[start : start + length] = np.asarray(frac)[:length]
        return out
    if prep.e_knots is None:
        raise AceFormatError(f"chi: unsupported spectrum kind {prep.kind!r}")
    k16 = unionize.bucket_pow2(prep.e_knots.shape[1])
    kn = unionize.pad_to(prep.e_knots, k16, axis=1)
    pd = unionize.pad_to(prep.pdf, k16, axis=1)
    # per-row group-band windows (round 5): a spectrum's support is its
    # knot range; narrow rows fetch (T, B) instead of dense G-wide
    # fraction rows, wide rows keep the dense dispatch (banding.partition)
    from ndpp_tpu.continuum_driver import _band_subsets

    subsets = _band_subsets(
        banding.partition(kn[:, 0], kn[:, -1], gs.bounds) if clamp else None, ne, gs.ng, gs
    )
    pending = []
    finals = []
    with RunMetrics.span_or_null(metrics, "dispatch.chi"):
      for idx, gw, g0s, b_rows in subsets:
        kn_s, pd_s = kn[idx], pd[idx]
        buf = np.empty((idx.size, gw))
        finals.append((idx, g0s, buf))
        tile_s = rows_mod.tile_for(idx.size, 1024, cfg.device.e_tile)
        for start, length in unionize.tile_indices(idx.size, tile_s):
            sl = slice(start, start + length)
            b_arg = bounds if b_rows is None else rows_mod.put_rows(
                unionize.pad_to(b_rows[sl], tile_s)
            )
            frac = tabular_group_fractions(
                rows_mod.put_rows(unionize.pad_to(kn_s[sl], tile_s)),
                rows_mod.put_rows(unionize.pad_to(pd_s[sl], tile_s)),
                b_arg,
                clamp,
            )
            pending.append((buf, start, length, frac))
    with RunMetrics.span_or_null(metrics, "wait.chi"):
        for buf, start, length, frac in pending:
            buf[start : start + length] = np.asarray(frac)[:length]
    for idx, g0s, buf in finals:
        out[idx] = banding.densify(buf[:, None, :], g0s, gs.ng)[:, 0, :]
    disc = prep.extra.get("disc")
    if disc is not None:
        # ND > 0 delta lines: their l=0 contribution is the line probability
        # in the containing group (ops.continuum.discrete_lines_moments l=0)
        from ndpp_tpu.continuum_driver import _add_discrete_lines

        out3 = out[:, None, :]
        _add_discrete_lines(out3, prep, gs, cfg)
        out = out3[:, 0, :]
    return out


def _batched_law_fractions(preps, gs, cfg, metrics=None) -> list[np.ndarray]:
    """One (NE_i, G) per law, with tabular laws POOLED by knot bucket into
    one tiled dispatch set (round 4): a fissionable nuclide's prompt laws
    plus its ~6 delayed precursor spectra previously each paid their own
    dispatch latency — the dominant chi cost on the warm profile."""
    from ndpp_tpu.continuum_driver import _add_discrete_lines
    from ndpp_tpu.host.prep_continuum import ContinuumPrepared

    out: list = [None] * len(preps)
    pools: dict[int, list[int]] = {}
    for i, prep in enumerate(preps):
        if prep.kind == "lab-analytic" or prep.e_knots is None:
            out[i] = _law_fractions(prep, gs, cfg, metrics)
        else:
            pools.setdefault(unionize.bucket_pow2(prep.e_knots.shape[1]), []).append(i)
    for k16, idxs in sorted(pools.items()):
        if len(idxs) == 1:
            out[idxs[0]] = _law_fractions(preps[idxs[0]], gs, cfg, metrics)
            continue
        e_all = np.concatenate([preps[i].e for i in idxs])
        pooled = ContinuumPrepared(
            kind="lab-tabular",
            e=e_all,
            applicability=np.ones_like(e_all),  # weighting happens at the caller
            e_knots=np.concatenate([unionize.pad_to(preps[i].e_knots, k16, axis=1) for i in idxs]),
            pdf=np.concatenate([unionize.pad_to(preps[i].pdf, k16, axis=1) for i in idxs]),
        )
        frac_all = _law_fractions(pooled, gs, cfg, metrics)
        off = 0
        for i in idxs:
            n = preps[i].e.size
            f = frac_all[off : off + n]
            if preps[i].extra.get("disc") is not None:
                f = f.copy()  # the pooled buffer slice is shared
                f3 = f[:, None, :]
                _add_discrete_lines(f3, preps[i], gs, cfg)
                f = f3[:, 0, :]
            out[i] = f
            off += n
    return out


def chi_collapse(res, nuc, gs, cfg, metrics=None) -> None:
    """Fill res.chi_* / res.nu_* in place."""
    log = log_mod.get()
    fission = None
    for mt in FISSION_MTS:
        if mt in nuc.reactions:
            fission = nuc.reactions[mt]
            break
    if fission is None or not fission.energy_dists:
        log.warning("chi: %s is fissionable but has no usable fission spectrum", nuc.name)
        return

    e_grid = res.energy
    ng = gs.ng

    # collect EVERY law (prompt + delayed) first, then dispatch with pooling
    prompt_items = []
    for ed in fission.energy_dists:
        with RunMetrics.span_or_null(metrics, "prep.chi"):
            prep = prepare_continuum(nuc, fission, ed, e_grid, order=0)
        if metrics is not None and prep.padded_elements:
            metrics.record_padding(prep.real_elements, prep.padded_elements)
        prompt_items.append((prep.applicability, prep))

    delayed_items = []
    if nuc.precursors and nuc.delayed_spectra:
        for prec, spec in zip(nuc.precursors, nuc.delayed_spectra):
            with RunMetrics.span_or_null(metrics, "prep.chi"):
                prep = prepare_continuum(nuc, fission, spec, e_grid, order=0)
            pk = np.clip(prec.probability(e_grid), 0.0, None)
            delayed_items.append((pk * prep.applicability, prep))

    fracs = _batched_law_fractions(
        [p for _, p in prompt_items + delayed_items], gs, cfg, metrics
    )
    prompt = np.zeros((e_grid.size, ng))
    for (w, _), f in zip(prompt_items, fracs[: len(prompt_items)]):
        prompt += w[:, None] * f

    delayed = None
    if delayed_items:
        delayed = np.zeros((e_grid.size, ng))
        for (w, _), f in zip(delayed_items, fracs[len(prompt_items) :]):
            delayed += w[:, None] * f
        # normalize delayed fractions if precursor probabilities don't sum to 1
        psum = np.sum([np.clip(p.probability(e_grid), 0.0, None) for p in nuc.precursors], axis=0)
        with np.errstate(invalid="ignore"):
            delayed = np.where(psum[:, None] > 0, delayed / np.where(psum[:, None] > 0, psum[:, None], 1.0), 0.0)

    nu_t = nuc.nu_total(e_grid) if nuc.nu_total is not None else None
    nu_d = nuc.nu_delayed(e_grid) if nuc.nu_delayed is not None else None
    nu_p = nuc.nu_prompt(e_grid) if nuc.nu_prompt is not None else None
    if nu_p is None and nu_t is not None and nu_d is not None:
        nu_p = nu_t - nu_d
    if nu_t is None and nu_p is not None:
        nu_t = nu_p + (nu_d if nu_d is not None else 0.0)

    res.chi_energy = e_grid
    res.chi_prompt = prompt
    if delayed is not None:
        res.chi_delayed = delayed
    if nu_p is not None:
        res.nu_prompt = nu_p
    if nu_d is not None:
        res.nu_delayed = nu_d
    if nu_t is not None:
        res.nu_total = nu_t
    if delayed is not None and nu_p is not None and nu_d is not None and nu_t is not None:
        with np.errstate(invalid="ignore", divide="ignore"):
            res.chi_total = (nu_p[:, None] * prompt + nu_d[:, None] * delayed) / nu_t[:, None]
    else:
        res.chi_total = prompt
