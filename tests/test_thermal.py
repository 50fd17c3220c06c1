"""Bound-thermal S(alpha,beta): codec round-trip, kernel-vs-oracle, driver.

Strategy per SURVEY.md section 4: synthetic thermal ACE fixtures exercise the
writer+parser round-trip and feed the kernels; independent numpy/scipy
oracles anchor every device path; the driver test checks the replacement
algebra (normalization preserved, free-gas superseded below the table).
"""

import jax.numpy as jnp
import numpy as np

from ndpp_tpu import config as config_mod
from ndpp_tpu import driver, groups
from ndpp_tpu.host.ace import synth
from ndpp_tpu.host.ace.thermal import format_thermal_ascii, parse_thermal_ascii
from ndpp_tpu.host.prep_thermal import prepare_thermal
from ndpp_tpu.ops.thermal import (
    coherent_elastic_moments,
    thermal_continuous_moments,
    thermal_discrete_moments,
)
from ndpp_tpu.oracle.thermal import (
    coherent_elastic_oracle,
    continuous_moments_oracle,
    discrete_moments_oracle,
)

BOUNDS = np.concatenate([[0.0], np.geomspace(1e-4, 10.0, 25)])


def test_thermal_roundtrip():
    for name in ("lwtr", "grph"):
        tab = synth.build_thermal(name)
        tab2 = parse_thermal_ascii(format_thermal_ascii(tab))
        assert tab2.name == tab.name and tab2.zaids == tab.zaids
        assert abs(tab2.awr - tab.awr) < 1e-5 and abs(tab2.kT - tab.kT) < 1e-6
        np.testing.assert_allclose(tab2.inelastic_energy, tab.inelastic_energy, rtol=1e-11)
        np.testing.assert_allclose(tab2.inelastic_sigma, tab.inelastic_sigma, rtol=1e-11)
        assert tab2.ifeng == tab.ifeng
        if name == "lwtr":
            for a, b in zip(tab2.inelastic.pdf, tab.inelastic.pdf):
                np.testing.assert_allclose(a, b, rtol=1e-11)
            for a, b in zip(tab2.inelastic.mu, tab.inelastic.mu):
                np.testing.assert_allclose(a, b, rtol=1e-11, atol=1e-13)
            assert not tab2.elastic.coherent
            np.testing.assert_allclose(tab2.elastic.mu, tab.elastic.mu, rtol=1e-11, atol=1e-13)
        else:
            np.testing.assert_allclose(tab2.inelastic.e_out, tab.inelastic.e_out, rtol=1e-11)
            np.testing.assert_allclose(tab2.inelastic.mu, tab.inelastic.mu, rtol=1e-11, atol=1e-13)
            assert tab2.elastic.coherent
            np.testing.assert_allclose(tab2.elastic.sigma, tab.elastic.sigma, rtol=1e-11)


def test_continuous_moments_vs_oracle():
    tab = synth.build_thermal("lwtr")
    prep = prepare_thermal(tab, order=3)
    dev = np.asarray(
        thermal_continuous_moments(
            jnp.asarray(prep.e_knots), jnp.asarray(prep.pdf), jnp.asarray(prep.am),
            jnp.asarray(BOUNDS), 3,
        )
    )
    for i in (0, 10, len(tab.inelastic.e_out) - 1):
        ora = continuous_moments_oracle(tab, i, BOUNDS, 3)
        scale = np.abs(ora).max()
        np.testing.assert_allclose(dev[i], ora, rtol=5e-9, atol=5e-9 * scale, err_msg=f"i={i}")
    # pdfs are normalized and BOUNDS covers the support -> exact row sums
    np.testing.assert_allclose(dev[:, 0, :].sum(axis=1), 1.0, rtol=1e-9)
    assert np.abs(dev[:, 1, :]).max() > 1e-3  # anisotropy genuinely exercised


def test_discrete_moments_vs_oracle():
    tab = synth.build_thermal("grph")
    prep = prepare_thermal(tab, order=3)
    dev = np.asarray(
        thermal_discrete_moments(
            jnp.asarray(prep.e_out), jnp.asarray(prep.w_lines), jnp.asarray(prep.am_lines),
            jnp.asarray(BOUNDS), clamp=True,
        )
    )
    for i in (0, 7, prep.e_in.size - 1):
        ora = discrete_moments_oracle(tab, i, BOUNDS, 3)
        np.testing.assert_allclose(dev[i], ora, rtol=1e-12, atol=1e-14, err_msg=f"i={i}")
    np.testing.assert_allclose(dev[:, 0, :].sum(axis=1), 1.0, rtol=1e-12)


def test_coherent_elastic_vs_oracle():
    tab = synth.build_thermal("grph")
    prep = prepare_thermal(tab, order=4)
    edges, cum = tab.elastic.energy, tab.elastic.sigma
    e = np.array([edges[0] * 0.5, edges[0] * 1.01, edges[3] * 1.2, 0.5, 1.9])
    dev = np.asarray(
        coherent_elastic_moments(
            jnp.asarray(e), jnp.asarray(prep.e_el), jnp.asarray(prep.bragg_s),
            jnp.asarray(BOUNDS), 4,
        )
    )
    # below the first Bragg edge: no channel (zero moments, zero sigma)
    assert np.all(dev[0] == 0.0)
    assert tab.elastic.sigma_at(np.array([e[0]]))[0] == 0.0
    for i in range(1, e.size):
        ora = coherent_elastic_oracle(float(e[i]), edges, cum, 4)
        g = int(np.searchsorted(BOUNDS, e[i], side="right") - 1)
        np.testing.assert_allclose(dev[i, :, g], ora, rtol=1e-12, atol=1e-14)
        off = dev[i].copy()
        off[:, g] = 0.0
        assert np.all(off == 0.0)  # elastic: everything lands in the incident group


def test_driver_sab_replaces_thermal_rows():
    """process_nuclide with an S(alpha,beta) assignment: rows below the table
    range are bound-thermal (normalized, anisotropic), rows above keep the
    free-gas treatment, and the two temperatures share the single table."""
    nuc = synth.build("h1")
    tab = synth.build_thermal("lwtr")
    gs = groups.get("uniform-lethargy-47")
    cfg = config_mod.RunConfig(legendre_order=2, temperatures=[293.6])
    res_plain = driver.process_nuclide(nuc, gs, cfg, sab_tables=None)
    res_sab = driver.process_nuclide(nuc, gs, cfg, sab_tables=[tab])
    e_grid = res_sab.energy
    n_sab = int(np.searchsorted(e_grid, tab.e_max, side="right"))
    cut = 400 * config_mod.BOLTZMANN_EV_PER_K * 293.6
    n_cut = int(np.searchsorted(e_grid, cut))
    assert 0 < n_sab < n_cut < e_grid.size
    # sab rows differ from the plain (free-gas) treatment...
    assert np.abs(res_sab.scatter[0, :n_sab] - res_plain.scatter[0, :n_sab]).max() > 1e-3
    # ...free-gas rows above the table and fast rows are identical
    np.testing.assert_allclose(res_sab.scatter[0, n_sab:], res_plain.scatter[0, n_sab:], rtol=1e-12)
    # normalization: every component is a normalized kernel -> f0 rows sum to 1
    np.testing.assert_allclose(res_sab.scatter[0, :n_sab, 0, :].sum(axis=1), 1.0, rtol=1e-6)
    assert np.all(np.isfinite(res_sab.scatter))
