"""Host-side preparation of thermal S(alpha,beta) tables for the device kernels.

Converts the ragged per-incident-energy representations in
host/ace/thermal.py into the padded, batched tensors the ops/thermal.py
kernels consume (the host/device layout contract, SURVEY.md sections 1/2:
parsing and irregular-shape handling stay on host; f64 Legendre factors are
precomputed here, never inside jit).

Discrete-cosine sets become per-knot/per-line Legendre factors
m_l = mean_k P_l(mu_k) — the exact moment of the equiprobable discrete
angular distribution they encode.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ndpp_tpu.host.ace.thermal import (
    ThermalElastic,
    ThermalInelasticContinuous,
    ThermalInelasticDiscrete,
    ThermalTable,
)
from ndpp_tpu.ops.legendre import legendre_all_np


@dataclass
class ThermalPrepared:
    """Device-ready thermal data (all numpy f64, padded rectangular)."""

    e_in: np.ndarray  # (NEin,) inelastic incident grid, eV
    sigma_in: np.ndarray  # (NEin,) inelastic xs, barns
    kind: str  # 'continuous' | 'discrete'
    # continuous
    e_knots: np.ndarray | None = None  # (NEin, P)
    pdf: np.ndarray | None = None  # (NEin, P)
    am: np.ndarray | None = None  # (NEin, P, L+1)
    # discrete
    e_out: np.ndarray | None = None  # (NEin, J)
    w_lines: np.ndarray | None = None  # (J,)
    am_lines: np.ndarray | None = None  # (NEin, J, L+1)
    # elastic
    elastic_kind: str = "none"  # 'none' | 'incoherent' | 'coherent'
    e_el: np.ndarray | None = None  # (NEel,) grid or Bragg edges
    sigma_el: np.ndarray | None = None  # (NEel,) xs (incoherent)
    am_el: np.ndarray | None = None  # (NEel, L+1) (incoherent)
    bragg_s: np.ndarray | None = None  # (B,) per-edge structure increments (coherent)


def _pad_pow2(n: int, lo: int = 8) -> int:
    """Canonical pow2 shape bucket (see unionize.bucket_pow2 for rationale)."""
    from ndpp_tpu.host.unionize import bucket_pow2

    return bucket_pow2(n, lo)


def prepare_thermal(tab: ThermalTable, order: int) -> ThermalPrepared:
    inel = tab.inelastic
    prep = ThermalPrepared(e_in=tab.inelastic_energy, sigma_in=tab.inelastic_sigma, kind="")
    if isinstance(inel, ThermalInelasticContinuous):
        prep.kind = "continuous"
        ne = len(inel.e_out)
        pmax = _pad_pow2(max(e.size for e in inel.e_out))
        e_knots = np.empty((ne, pmax))
        pdf = np.zeros((ne, pmax))
        am = np.zeros((ne, pmax, order + 1))
        for i in range(ne):
            n = inel.e_out[i].size
            e_knots[i, :n] = inel.e_out[i]
            e_knots[i, n:] = inel.e_out[i][-1]  # zero-width pad panels
            pdf[i, :n] = inel.pdf[i]
            am[i, :n] = legendre_all_np(inel.mu[i], order).mean(axis=1)
            am[i, n:] = am[i, n - 1]
        prep.e_knots, prep.pdf, prep.am = e_knots, pdf, am
    elif isinstance(inel, ThermalInelasticDiscrete):
        prep.kind = "discrete"
        prep.e_out = inel.e_out
        prep.w_lines = inel.weights()
        prep.am_lines = legendre_all_np(inel.mu, order).mean(axis=2)
    else:
        raise TypeError(f"unsupported thermal inelastic payload: {type(inel)}")

    el = tab.elastic
    if isinstance(el, ThermalElastic):
        prep.e_el = el.energy
        if el.coherent:
            prep.elastic_kind = "coherent"
            prep.bragg_s = np.diff(np.concatenate([[0.0], el.sigma]))
        else:
            prep.elastic_kind = "incoherent"
            prep.sigma_el = el.sigma
            assert el.mu is not None
            prep.am_el = legendre_all_np(el.mu, order).mean(axis=1)
    return prep
