"""Free-gas thermal replacement driver (config 3, BASELINE.json:9).

Below the thermal cutoff (cfg.thermal_cutoff_kt * kT), the 0K elastic
transfer moments are replaced by target-in-motion free-gas moments with
up-scatter (SURVEY.md section 3.3). Kernel lands with config 3; until then
this is an explicit, logged no-op so 0K results are never silently wrong.
"""

from __future__ import annotations

import numpy as np

from ndpp_tpu.utils import log as log_mod

_FREEGAS_READY = False


def apply_freegas(scatter: np.ndarray, nuc, gs, cfg, e_grid: np.ndarray, metrics=None) -> np.ndarray:
    if not _FREEGAS_READY:
        log_mod.get().warning(
            "free-gas kernel not yet wired: %s keeps 0K elastic moments at all %d temperature(s)",
            nuc.name,
            len(cfg.temperatures),
        )
        return scatter
    raise AssertionError("unreachable")
