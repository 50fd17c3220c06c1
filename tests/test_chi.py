"""Chi collapse: device closed forms vs raw-pdf adaptive oracle (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ndpp_tpu import config as config_mod
from ndpp_tpu import groups
from ndpp_tpu.chi_driver import chi_collapse
from ndpp_tpu.host.ace import synth
from ndpp_tpu.host.prep_continuum import prepare_continuum, tabular_rows
from ndpp_tpu.ops.chi import analytic_group_fractions, tabular_group_fractions
from ndpp_tpu.oracle.chi import analytic_group_fractions_oracle, tabular_group_fractions_oracle

G47 = groups.get("uniform-lethargy-47")
RTOL = 1e-8


@pytest.mark.parametrize(
    "law,fixture", [(7, "maxwell"), (9, "evap"), (11, "watt")]
)
def test_analytic_laws_vs_oracle(law, fixture):
    nuc = synth.build(fixture)
    ed = nuc.reactions[18].energy_dists[0]
    d = ed.data
    e_sel = np.array([1e3, 1e6, 1.5e7])
    theta = (d.theta(e_sel) if d.theta is not None else d.a_tab(e_sel))
    b = d.b_tab(e_sel) if d.b_tab is not None else np.zeros_like(e_sel)
    u = float(d.restriction_u or 0.0)
    dev = np.asarray(
        analytic_group_fractions(jnp.asarray(e_sel), jnp.asarray(theta), jnp.asarray(b), u, jnp.asarray(G47.bounds), law)
    )
    for i, e in enumerate(e_sel):
        ora = analytic_group_fractions_oracle(float(e), float(theta[i]), float(b[i]), u, G47.bounds, law)
        np.testing.assert_allclose(dev[i], ora, rtol=1e-7, atol=1e-12, err_msg=f"law {law} E={e}")
        assert dev[i].sum() == pytest.approx(1.0, rel=1e-9)


def test_restriction_u_truncates():
    e = np.array([2e6])
    theta = np.array([1.3e6])
    frac = np.asarray(
        analytic_group_fractions(jnp.asarray(e), jnp.asarray(theta), jnp.zeros(1), 1.5e6, jnp.asarray(G47.bounds), 7)
    )[0]
    assert frac.sum() == pytest.approx(1.0, rel=1e-9)
    # nothing above E - U = 0.5 MeV
    top = G47.group_of(0.5e6)
    assert np.all(frac[top + 1 :] == 0.0)


def test_tabular_fractions_vs_oracle():
    nuc = synth.build("u235")
    ed = nuc.reactions[18].energy_dists[0]
    e_sel = np.array([1e2, 5e5, 1.8e7])
    kn, pdf, _, _, _ = tabular_rows(ed.data, e_sel)
    dev = np.asarray(tabular_group_fractions(jnp.asarray(kn), jnp.asarray(pdf), jnp.asarray(G47.bounds)))
    for i in range(e_sel.size):
        ora = tabular_group_fractions_oracle(kn[i], pdf[i], G47.bounds)
        np.testing.assert_allclose(dev[i], ora, rtol=RTOL, atol=1e-13, err_msg=f"E={e_sel[i]}")
        assert dev[i].sum() == pytest.approx(1.0, rel=1e-8)


def test_chi_collapse_end_to_end():
    from ndpp_tpu.io.library import NuclideResult

    nuc = synth.build("u235")
    cfg = config_mod.RunConfig(legendre_order=1)
    res = NuclideResult(
        name=nuc.name,
        zaid=nuc.zaid,
        awr=nuc.awr,
        kT=nuc.kT,
        energy=nuc.energy,
        temperatures=np.array([293.6]),
        scatter=np.zeros((1, nuc.energy.size, 2, G47.ng)),
        sigma_scatter=np.zeros(nuc.energy.size),
    )
    chi_collapse(res, nuc, G47, cfg)
    assert res.chi_prompt is not None and res.chi_delayed is not None and res.chi_total is not None
    np.testing.assert_allclose(res.chi_prompt.sum(axis=1), 1.0, rtol=1e-9)
    np.testing.assert_allclose(res.chi_delayed.sum(axis=1), 1.0, rtol=1e-9)
    np.testing.assert_allclose(res.chi_total.sum(axis=1), 1.0, rtol=1e-9)
    assert np.all(res.chi_prompt >= 0) and np.all(res.chi_delayed >= 0)
    # delayed spectra are softer: mean outgoing group below prompt's
    gmid = np.arange(G47.ng)
    mean_p = (res.chi_prompt[0] * gmid).sum()
    mean_d = (res.chi_delayed[0] * gmid).sum()
    assert mean_d < mean_p
    # nu consistency: total = prompt + delayed
    np.testing.assert_allclose(res.nu_total, res.nu_prompt + res.nu_delayed, rtol=1e-12)
