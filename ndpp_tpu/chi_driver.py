"""Fission chi collapse driver (config 4, BASELINE.json:10).

chi_g'(E) = integral over g' of p(E'|E) for the fission MT's secondary-energy
laws (prompt), plus precursor-group-weighted delayed spectra (SURVEY.md
section 3.4). Lands with the continuum-law engine; until then fissionable
nuclides get an explicit, logged gap rather than silent zeros.
"""

from __future__ import annotations

from ndpp_tpu.utils import log as log_mod

_CHI_READY = False


def chi_collapse(res, nuc, gs, cfg, metrics=None) -> None:
    if not _CHI_READY:
        log_mod.get().warning("chi collapse not yet wired: %s written without chi datasets", nuc.name)
        return
    raise AssertionError("unreachable")
