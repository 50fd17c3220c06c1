"""Continuum-law (4/44/61/66 + analytic 7/9/11) scattering-moment driver.

Lands with config 4 (BASELINE.json:10). Until then a continuum scattering
reaction is a hard, typed error so the nuclide is quarantined — never a
silent approximation.
"""

from __future__ import annotations

from ndpp_tpu.utils.errors import NdppError


def continuum_reaction_moments(nuc, rxn, e_grid, gs, order, cfg, metrics=None):
    laws = [ed.law for ed in rxn.energy_dists]
    raise NdppError(
        f"{nuc.name} MT={rxn.mt}: continuum secondary-energy laws {laws} not yet supported "
        f"by the moment engine (coming with config 4)"
    )
