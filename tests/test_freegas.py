"""Free-gas kernel: analytic sigma_eff, oracle match, detailed balance,
T->0 limit, upscatter, and driver integration (config 3; SURVEY.md 4.4)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import erf

from ndpp_tpu import config as config_mod
from ndpp_tpu import groups
from ndpp_tpu.freegas_driver import apply_freegas
from ndpp_tpu.host.ace import synth
from ndpp_tpu.host.prep import prepare_twobody
from ndpp_tpu.ops.freegas import (
    freegas_moments,
    freegas_moments_pointwise,
    freegas_sigma_eff_ratio,
)
from ndpp_tpu.oracle.freegas_exact import f0_groups_exact, moments_dense
from ndpp_tpu.ops.twobody import twobody_moments
from ndpp_tpu.oracle.freegas import freegas_moments_oracle

KT = 0.0253  # ~293.6 K


def _analytic_ratio(e, a, kt):
    x = np.sqrt(a * e / kt)
    return (1 + 1 / (2 * x**2)) * erf(x) + np.exp(-(x**2)) / (np.sqrt(np.pi) * x)


@pytest.mark.parametrize("awr", [0.999167, 15.858, 238.0])
def test_sigma_eff_vs_analytic(awr):
    """The kernel's own quadrature must reproduce the Doppler sigma_eff to ~1e-10
    over the free-gas application domain (E <= 400 kT)."""
    e = np.array([1e-4, KT / 10, KT, 1.0, 10.0, 400 * KT])
    dev = np.asarray(freegas_sigma_eff_ratio(jnp.asarray(e), awr, KT))
    np.testing.assert_allclose(dev, _analytic_ratio(e, awr, KT), rtol=2e-9)


def test_moments_vs_oracle():
    g = groups.uniform_lethargy("fg12", 12, 1e-6, 1000.0)
    awr = 0.999167
    for e in (KT / 4.0, 2.0):
        dev = np.asarray(freegas_moments(jnp.asarray([e]), awr, KT, jnp.asarray(g.bounds), 2))[0]
        ora = freegas_moments_oracle(e, awr, KT, g.bounds, 2)
        scale = np.abs(ora).max()
        np.testing.assert_allclose(dev, ora, rtol=1e-7, atol=1e-8 * scale, err_msg=f"E={e}")


def test_moments_vs_oracle_heavy():
    g = groups.uniform_lethargy("fg12h", 12, 1e-6, 1000.0)
    awr = 238.0
    e = KT
    dev = np.asarray(freegas_moments(jnp.asarray([e]), awr, KT, jnp.asarray(g.bounds), 2))[0]
    ora = freegas_moments_oracle(e, awr, KT, g.bounds, 2)
    scale = np.abs(ora).max()
    np.testing.assert_allclose(dev, ora, rtol=1e-7, atol=1e-8 * scale)


def test_normalization_and_upscatter():
    g = groups.uniform_lethargy("fg30", 30, 1e-7, 5000.0)
    bounds = g.bounds.copy()
    bounds[0] = 0.0  # covering window: the pointwise kernel normalizes over it
    e = np.array([KT / 100, KT, 10 * KT, 400 * KT])
    f = np.asarray(freegas_moments_pointwise(jnp.asarray(e), 0.999167, KT, jnp.asarray(bounds), 3))
    np.testing.assert_allclose(f[:, 0, :].sum(axis=1), 1.0, rtol=1e-9)
    # cold neutron at kT/100 overwhelmingly up-scatters
    gi = g.group_of(float(e[0]))
    assert f[0, 0, gi + 1 :].sum() > 0.9
    # at 400 kT, up-scatter is nearly gone
    gi3 = g.group_of(float(e[3]))
    assert f[3, 0, gi3 + 1 :].sum() < 0.02


def test_detailed_balance():
    """Maxwellian equilibrium: E e^{-E/kT} sig(E) p(E->E') symmetric in E<->E'.

    Checked with narrow groups (midpoint approximation => loose tolerance)."""
    awr = 1.0
    # narrow groups centered on two energies
    e1, e2 = KT * 0.7, KT * 1.9
    width = 0.004
    bounds = np.sort(
        np.unique(
            np.concatenate(
                [[1e-8, 50 * KT], [e1 * (1 - width), e1 * (1 + width)], [e2 * (1 - width), e2 * (1 + width)]]
            )
        )
    )
    bounds[0] = 0.0
    gs_b = jnp.asarray(bounds)
    f1 = np.asarray(freegas_moments_pointwise(jnp.asarray([e1]), awr, KT, gs_b, 0))[0, 0]
    f2 = np.asarray(freegas_moments_pointwise(jnp.asarray([e2]), awr, KT, gs_b, 0))[0, 0]
    g1 = int(np.searchsorted(bounds, e1) - 1)
    g2 = int(np.searchsorted(bounds, e2) - 1)
    d1 = bounds[g1 + 1] - bounds[g1]
    d2 = bounds[g2 + 1] - bounds[g2]
    r1 = float(np.asarray(freegas_sigma_eff_ratio(jnp.asarray([e1]), awr, KT))[0])
    r2 = float(np.asarray(freegas_sigma_eff_ratio(jnp.asarray([e2]), awr, KT))[0])
    lhs = e1 * np.exp(-e1 / KT) * r1 * f1[g2] / d2
    rhs = e2 * np.exp(-e2 / KT) * r2 * f2[g1] / d1
    assert lhs == pytest.approx(rhs, rel=2e-3)


def test_t_to_zero_matches_0k_elastic():
    """At E >> kT the free-gas kernel approaches the 0K isotropic-CM kernel."""
    nuc = synth.build("h1_iso")
    g = groups.get("uniform-lethargy-47")
    e = np.array([5e3])  # 2e5 x kT
    kt_tiny = KT / 1000.0
    bounds = g.bounds.copy()
    bounds[0] = 0.0
    ffg = np.asarray(
        freegas_moments_pointwise(jnp.asarray(e), nuc.awr, kt_tiny, jnp.asarray(bounds), 3)
    )[0]
    prep = prepare_twobody(nuc, nuc.elastic, e)
    f0k = np.asarray(
        twobody_moments(
            jnp.asarray(prep.e), jnp.asarray(prep.knots), jnp.asarray(prep.pdf),
            jnp.asarray(g.bounds), prep.c1, prep.c2, prep.awr, 3,
        )
    )[0]
    np.testing.assert_allclose(ffg, f0k, atol=2e-4 * np.abs(f0k).max())


def test_driver_applies_freegas():
    nuc = synth.build("h1")
    g = groups.get("uniform-lethargy-47")
    cfg = config_mod.RunConfig(legendre_order=2, temperatures=[293.6, 600.0])
    e_grid = nuc.energy
    nt = 2
    base = np.zeros((nt, e_grid.size, 3, g.ng))
    scatter = apply_freegas(base.copy(), nuc, g, cfg, e_grid)
    cut1 = 400 * config_mod.BOLTZMANN_EV_PER_K * 293.6
    n1 = int(np.searchsorted(e_grid, cut1))
    # thermal rows changed, fast rows untouched
    assert np.any(scatter[0, :n1] != 0)
    assert np.all(scatter[:, n1 + 50 :] == 0)
    # the two temperatures differ on thermal rows
    assert np.any(scatter[0, :n1] != scatter[1, :n1])


def test_pointwise_f0_vs_exact_anchor():
    """Production (pointwise) kernel f0 rows vs the erf-closed-form anchor on a
    thermal-fine structure — the regime where the grouped kernel's Laurent
    closed form cancels catastrophically (round-1 gap 1, closed)."""
    bounds = np.concatenate([[0.0], np.geomspace(1e-4, 4.0, 24), [50.0]])
    for awr, e in [(0.999167, KT), (1.0, KT / 10), (238.0, KT), (15.858, KT)]:
        anchor = f0_groups_exact(e, awr, KT, bounds, clamp=True)
        dev = np.asarray(
            freegas_moments_pointwise(jnp.asarray([e]), awr, KT, jnp.asarray(bounds), 2)
        )[0, 0]
        scale = np.abs(anchor).max()
        np.testing.assert_allclose(dev, anchor, rtol=3e-8, atol=3e-8 * scale, err_msg=f"A={awr} E={e}")


def test_pointwise_higher_moments_vs_dense_reference():
    """l >= 1 spot groups vs the refinement-verified dense reference (A=1 at
    the thermal peak: the hardest corner probed)."""
    bounds = np.concatenate([[0.0], np.geomspace(1e-4, 4.0, 24), [50.0]])
    awr, e = 1.0, KT
    sel = [12, 13]
    ref = moments_dense(e, awr, KT, bounds, 4, sel, nq_y=16, n_c=8, self_tol=3e-8)
    dev = np.asarray(freegas_moments_pointwise(jnp.asarray([e]), awr, KT, jnp.asarray(bounds), 4))[0]
    for g in sel:
        scale = max(abs(ref[g][0]), 1e-300)
        assert np.abs(dev[:, g] - ref[g]).max() / scale < 1e-7, g


def test_doppler_xs_weighting():
    """freegas_xs_weighting: at the table temperature the sigma_eff ratio is
    ~1 (unchanged result); at a hotter temperature the elastic channel is
    re-weighted (result differs) while f0 normalization is preserved."""
    from ndpp_tpu.freegas_driver import doppler_sigma_ratio

    nuc = synth.h1_like(n_energy=80)
    g = groups.get("uniform-lethargy-47")
    e_grid = nuc.energy
    base = np.zeros((1, e_grid.size, 3, g.ng))
    base[:, :, 0, :] = 1.0 / g.ng  # normalized dummy rows

    # analytic ratio sanity: monotone rise to 1 as x -> inf, large at small x
    r = doppler_sigma_ratio(np.array([1e-6, 1e-3, 1.0, 1e3]), 0.999167, KT)
    assert r[0] > r[1] > r[2] > r[3] >= 1.0 - 1e-9

    cfg_on = config_mod.RunConfig(legendre_order=2, temperatures=[600.0])
    cfg_off = config_mod.RunConfig(
        legendre_order=2, temperatures=[600.0], freegas_xs_weighting=False
    )
    s_on = apply_freegas(base.copy(), nuc, g, cfg_on, e_grid)
    s_off = apply_freegas(base.copy(), nuc, g, cfg_off, e_grid)
    cut = 400 * config_mod.BOLTZMANN_EV_PER_K * 600.0
    n1 = int(np.searchsorted(e_grid, cut))
    assert np.abs(s_on[0, :n1] - s_off[0, :n1]).max() > 1e-4  # re-weighting bites at 600K
    np.testing.assert_allclose(s_on[0, :n1, 0, :].sum(axis=1), 1.0, rtol=1e-6)

    # at the table temperature the ratio is ~1: both forms agree closely
    cfg_tab = config_mod.RunConfig(legendre_order=2, temperatures=[293.6])
    cfg_tab_off = config_mod.RunConfig(
        legendre_order=2, temperatures=[293.6], freegas_xs_weighting=False
    )
    t_on = apply_freegas(base.copy(), nuc, g, cfg_tab, e_grid)
    t_off = apply_freegas(base.copy(), nuc, g, cfg_tab_off, e_grid)
    assert np.abs(t_on - t_off).max() < 5e-4


def test_sab_kernel_matches_quadrature_and_anchor():
    """freegas_moments_sab — the production path since round 2: the
    (v_r, V_cm) double quadrature collapses to ONE smooth Gaussian
    integral via the free-gas scattering law (derivation + 2.6e-11 oracle
    validation in scripts/freegas_sab_closed.py) — must agree with the
    independent quadrature kernel at its high-quadrature reference
    setting, stay exactly normalized, and hit the erf f0 closed-form
    anchor."""
    from ndpp_tpu.ops.freegas import freegas_moments_sab

    bw = np.concatenate([[0.0], np.geomspace(1e-4, 4.0, 24), [50.0]])
    e = jnp.asarray([KT / 10, KT, 1.0, 9.9])
    for awr in (0.999167, 15.858, 238.0):
        truth = np.asarray(
            freegas_moments_pointwise(e, awr, KT, jnp.asarray(bw), 5, 12, 16, 16)
        )
        got = np.asarray(freegas_moments_sab(e, awr, KT, jnp.asarray(bw), 5))
        np.testing.assert_allclose(got, truth, atol=3e-8, err_msg=f"A={awr}")
        np.testing.assert_allclose(got[:, 0, :].sum(-1), 1.0, rtol=1e-12)
        anchor = f0_groups_exact(KT, awr, KT, bw, clamp=True)
        g0 = np.asarray(
            freegas_moments_sab(jnp.asarray([KT]), awr, KT, jnp.asarray(bw), 2)
        )[0, 0]
        scale = np.abs(anchor).max()
        np.testing.assert_allclose(g0, anchor, rtol=3e-8, atol=3e-8 * scale, err_msg=f"A={awr}")


def test_panelsplit_matches_pointwise_and_anchor():
    """The panel-split kernel (the production free-gas path since round 2:
    outgoing-y panels at the integrand's own structure only, group splits
    via the GL-node Lagrange interpolant, per-row cost independent of G)
    must agree with the round-1 pointwise kernel — same inner quadrature,
    independent outgoing-axis scheme — and hit the erf-closed-form f0
    anchor on a thermal-fine window. Rows stay exactly normalized by
    construction (the interpolant's full-panel integral IS the GL sum)."""
    from ndpp_tpu.ops.freegas import freegas_moments_panelsplit

    bw = np.concatenate([[0.0], np.geomspace(1e-4, 4.0, 24), [50.0]])
    e = jnp.asarray([KT / 10, KT, 1.0, 9.9])
    for awr in (0.999167, 15.858, 238.0):
        old = np.asarray(
            freegas_moments_pointwise(e, awr, KT, jnp.asarray(bw), 5, 8, 8, 8)
        )
        new = np.asarray(
            freegas_moments_panelsplit(e, awr, KT, jnp.asarray(bw), 5, 10, 8, 6)
        )
        np.testing.assert_allclose(new, old, atol=3e-7, err_msg=f"A={awr}")
        np.testing.assert_allclose(new[:, 0, :].sum(-1), 1.0, rtol=1e-12)
        # independent anchor: closed-form f0 at one thermal row
        anchor = f0_groups_exact(KT, awr, KT, bw, clamp=True)
        got = np.asarray(
            freegas_moments_panelsplit(jnp.asarray([KT]), awr, KT, jnp.asarray(bw), 2, 10, 8, 6)
        )[0, 0]
        scale = np.abs(anchor).max()
        np.testing.assert_allclose(got, anchor, rtol=3e-8, atol=3e-8 * scale, err_msg=f"A={awr}")


def test_subgrid_envelope_and_exact_default():
    """Round-1 verdict, Weak #2: the subgrid interpolation of the free-gas
    correction was untested at the 1e-8 bar. MEASURED here on a >2000-row
    thermal grid: the 256-node subgrid errs by up to ~7e-3 — the per-group
    moment curves carry group-boundary-crossing structure on the scale of
    a group width (a 0K-term kink at every E = E_b plus a kT-smeared
    thermal ramp), which no coarse subgrid can interpolate to 1e-8.
    Consequence (round 2): the DEFAULT is exact per-row evaluation
    (freegas_max_rows = 0); the subgrid is an opt-in speed knob whose
    documented ~1e-2 envelope this test pins, including the rows adjacent
    to an S(alpha,beta)-style handoff (e_min_by_temp) and the 400 kT
    cutoff. Probe-row trick: rows are independent in the kernel, so the
    exact reference at probe rows is a direct evaluation there."""
    assert config_mod.DeviceConfig().freegas_max_rows == 0  # exact by default

    nuc = synth.h1_like(n_energy=6300)
    g = groups.get("uniform-lethargy-47")
    e_grid = nuc.energy
    cut = 400 * config_mod.BOLTZMANN_EV_PER_K * 293.6
    e_min = 1e-3  # emulated S(alpha,beta) handoff: rows below are skipped
    n_lo = int(np.searchsorted(e_grid, e_min, side="right"))
    n_hi = int(np.searchsorted(e_grid, cut))
    assert n_hi - n_lo > 2000, (n_lo, n_hi)  # the bar: a genuinely dense grid

    kw = dict(legendre_order=1, temperatures=[293.6], freegas_xs_weighting=False)

    # opt-in subgrid path over the full dense grid
    cfg_sub = config_mod.RunConfig(**kw)
    cfg_sub.device.freegas_max_rows = 256
    base = np.zeros((1, e_grid.size, 2, g.ng))
    sub = apply_freegas(base.copy(), nuc, g, cfg_sub, e_grid, e_min_by_temp=[e_min])
    assert np.all(sub[0, :n_lo] == 0)  # handoff rows untouched

    # exact reference at probe rows: edges of both boundaries + interior
    # samples chosen OFF the 256 subgrid nodes (the interpolated rows)
    nr = n_hi - n_lo
    sub_idx = np.unique(np.round(np.linspace(0, nr - 1, 256)).astype(int))
    interior = np.setdiff1d(np.round(np.linspace(0, nr - 1, 61)).astype(int), sub_idx)
    probe_rel = np.unique(np.concatenate([[0, 1, nr - 2, nr - 1], interior]))
    probe = probe_rel + n_lo
    cfg_exact = config_mod.RunConfig(**kw)  # default: exact
    base_p = np.zeros((1, probe.size, 2, g.ng))
    exact_p = apply_freegas(
        base_p.copy(), nuc, g, cfg_exact, e_grid[probe], e_min_by_temp=[e_min]
    )
    err = np.abs(sub[0, probe] - exact_p[0]).max()
    assert err < 2e-2, err  # the documented opt-in envelope
    # at subgrid NODES the subgrid path evaluates the kernel directly: the
    # edge rows (always nodes) must agree with the exact path to f64 noise
    for rp, rd in [(0, n_lo), (-1, n_hi - 1)]:
        np.testing.assert_allclose(sub[0, rd], exact_p[0, rp], atol=1e-13, rtol=1e-12)


def test_driver_clamp_false_drops_out_of_range_mass():
    """clamp_outside=False regression fix: the driver feeds the kernel a
    COVERING window with a leading [0, bounds_0) catch group, so the
    self-normalization stays exact and the below-range mass is an explicit
    group — folded into the edge group under clamping, dropped otherwise
    (previously a truncated window silently renormalized retained mass
    to 1)."""
    awr, b0 = 0.999167, 1e-2
    g = groups.uniform_lethargy("fg-noclamp", 20, b0, 2e7)
    bw = np.concatenate([[0.0], g.bounds[:12]])  # the driver's covering recipe
    part = np.asarray(
        freegas_moments_pointwise(jnp.asarray([KT / 2]), awr, KT, jnp.asarray(bw), 0)
    )[0, 0]
    # covering window -> exact normalization INCLUDING the catch group
    np.testing.assert_allclose(part.sum(), 1.0, rtol=1e-8)
    # a cold H row genuinely scatters below 1e-2 eV: the catch group holds
    # real mass, so dropping it (clamp=False) must NOT be a no-op
    assert part[0] > 0.02, part[0]

    # driver level: clamp True vs False differ exactly on thermal rows
    nuc = synth.h1_like(n_energy=60)
    e_grid = nuc.energy
    base = np.zeros((1, e_grid.size, 2, g.ng))
    kw = dict(legendre_order=1, temperatures=[293.6], freegas_xs_weighting=False)
    s_t = apply_freegas(base.copy(), nuc, g, config_mod.RunConfig(clamp_outside=True, **kw), e_grid)
    s_f = apply_freegas(base.copy(), nuc, g, config_mod.RunConfig(clamp_outside=False, **kw), e_grid)
    cut = 400 * config_mod.BOLTZMANN_EV_PER_K * 293.6
    n1 = int(np.searchsorted(e_grid, cut))
    d = np.abs(s_t[0, :n1, 0, :].sum(axis=1) - s_f[0, :n1, 0, :].sum(axis=1))
    assert d.max() > 1e-3  # the catch-group mass is really dropped vs folded
    assert np.all(np.isfinite(s_t)) and np.all(np.isfinite(s_f))
