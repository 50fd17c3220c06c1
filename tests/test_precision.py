"""device.precision='f32' fast path: the rows layer casts every device
input, kernels compute in f32 (they derive dtype from their inputs), and
moments stay within the documented ~1e-6..1e-4 band of the f64 production
path (SURVEY.md section 7 'hard parts' item 1)."""

import numpy as np
import pytest

from ndpp_tpu import config as config_mod
from ndpp_tpu import driver, groups
from ndpp_tpu.host.ace import synth
from ndpp_tpu.parallel import rows as rows_mod


@pytest.fixture
def f32_rows():
    rows_mod.configure(precision="f32")
    yield
    rows_mod.configure(precision="f64")


def test_put_rows_casts(f32_rows):
    arr = rows_mod.put_rows(np.ones((8, 2)))  # row count divisible by the 8-device test mesh
    assert arr.dtype == np.float32
    ints = rows_mod.put_replicated(np.arange(3))
    assert ints.dtype != np.float32  # integers pass through


def test_f32_driver_matches_f64(f32_rows):
    """Full two-body + continuum driver path in f32 vs f64 on a small h1-like
    fixture (thermal stages disabled via a tiny cutoff to keep the test
    cheap; the freegas kernel itself derives dtype the same way)."""
    nuc = synth.h1_like(n_energy=64)
    gs = groups.get("uniform-lethargy-47")
    cfg = config_mod.RunConfig(legendre_order=3, temperatures=[293.6], thermal_cutoff_kt=1e-9)
    res32 = driver.process_nuclide(nuc, gs, cfg)
    rows_mod.configure(precision="f64")
    res64 = driver.process_nuclide(nuc, gs, cfg)
    assert res32.scatter.shape == res64.scatter.shape
    scale = np.abs(res64.scatter).max()
    err = np.abs(res32.scatter - res64.scatter).max() / scale
    assert err < 5e-4, err
    # f32 really ran: it cannot reproduce f64 beyond its own epsilon
    assert err > 1e-12
