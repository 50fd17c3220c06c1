"""Pallas fused two-body inner kernel vs the XLA reference math (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ndpp_tpu.ops.legendre import gl_nodes_weights, legendre_all
from ndpp_tpu.ops.twobody_pallas import twobody_inner_pallas


def _reference(mid, half, a_s, b_s, kin, order, nq):
    xq, wq = gl_nodes_weights(nq)
    base, slope, sqecm, sqap = (kin[:, i : i + 1, None] for i in range(4))
    mu = mid[:, None, :] + half[:, None, :] * xq.astype(np.float64)[None, :, None]
    pdf = a_s[:, None, :] + b_s[:, None, :] * mu
    elab = base + slope * mu
    mul = np.clip((mu * sqecm + sqap) / np.sqrt(np.maximum(elab, 1e-30)), -1, 1)
    pl_ = np.asarray(legendre_all(jnp.asarray(mul), order))
    w = pdf * wq[None, :, None] * half[:, None, :]
    return np.einsum("tqs,tqsl->tls", w, pl_)


def test_pallas_inner_matches_reference(rng):
    t, s, order, nq = 16, 256, 5, 8
    mid = rng.uniform(-0.9, 0.9, (t, s))
    half = rng.uniform(0.0, 0.05, (t, s))
    a_s = rng.uniform(0.1, 1.0, (t, s))
    b_s = rng.uniform(-0.3, 0.3, (t, s))
    kin = np.stack(
        [
            rng.uniform(0.5, 1.0, t),  # base
            rng.uniform(0.05, 0.3, t),  # slope
            rng.uniform(0.3, 1.0, t),  # sqrt(ecm)
            rng.uniform(0.01, 0.2, t),  # sqrt(e)/(A+1)
        ],
        axis=1,
    )
    ref = _reference(mid, half, a_s, b_s, kin, order, nq)
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    out = np.asarray(
        twobody_inner_pallas(f32(mid), f32(half), f32(a_s), f32(b_s), f32(kin), order, nq, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6 * np.abs(ref).max())


def test_pallas_full_path_matches_xla_f64():
    """twobody_moments_pallas (the f32 preview path) vs the XLA f64 kernel
    on identical inputs. Round 3: the prologue/epilogue now run in f64
    like the dd path (f32 edge-sorting both capped accuracy at ~4e-2 and
    made the path slower than dd), so only the f32 inner stage differs —
    the output is f64 and agrees with the f64 kernel to ~f32 roundoff."""
    from ndpp_tpu.host.ace import synth
    from ndpp_tpu.host.prep import prepare_twobody
    from ndpp_tpu.ops.twobody import twobody_moments
    from ndpp_tpu.ops.twobody_pallas import twobody_moments_pallas
    from ndpp_tpu import groups

    nuc = synth.h1_like(n_energy=16)
    gs = groups.get("uniform-lethargy-47")
    prep = prepare_twobody(nuc, nuc.elastic, nuc.energy[:16])
    args = (prep.e, prep.knots, prep.pdf, gs.bounds)
    args = tuple(jnp.asarray(a) for a in args)
    tail = (prep.c1, prep.c2, prep.awr, 3, 8, True)
    ref = np.asarray(twobody_moments(*args, *tail))
    out = np.asarray(twobody_moments_pallas(*args, *tail, interpret=True))
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(out[:, 0, :].sum(axis=1), 1.0, rtol=1e-5)


def test_pallas_dd_full_path_matches_f64():
    """twobody_moments_dd (the accuracy-compliant Pallas path) vs the XLA
    f64 kernel on identical inputs: prologue/epilogue shared in f64, so the
    comparison isolates the dd inner stage. Bar: 1e-11 relative — three
    orders tighter than the 1e-8 product bar."""
    from ndpp_tpu.host.ace import synth
    from ndpp_tpu.host.prep import prepare_twobody
    from ndpp_tpu.ops.twobody import twobody_moments
    from ndpp_tpu.ops.twobody_pallas_dd import twobody_moments_dd
    from ndpp_tpu import groups

    # interpret mode executes every unrolled dd op in Python — keep the
    # static op count (order x nq) and element count small or this test
    # alone takes >15 min on the 1-core box
    nuc = synth.h1_like(n_energy=8)
    gs = groups.uniform_lethargy("ul-12", 12)
    prep = prepare_twobody(nuc, nuc.elastic, nuc.energy[:8])
    args = (jnp.asarray(prep.e), jnp.asarray(prep.knots), jnp.asarray(prep.pdf), jnp.asarray(gs.bounds))
    tail = (prep.c1, prep.c2, prep.awr, 3, 6, True)
    ref = np.asarray(twobody_moments(*args, *tail))
    out = np.asarray(twobody_moments_dd(*args, *tail, interpret=True))
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, ref, rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(out[:, 0, :].sum(axis=1), 1.0, rtol=1e-11)


def test_pallas_shape_guards():
    z = jnp.zeros((8, 100), jnp.float32)  # 100 not lane-aligned
    with pytest.raises(AssertionError):
        twobody_inner_pallas(z, z, z, z, jnp.zeros((8, 4), jnp.float32), 3, 8, interpret=True)
