"""Multi-device sharding tests on the 8-virtual-device CPU mesh (SURVEY.md section 4.5)."""

import numpy as np
import pytest

import jax


def test_eight_virtual_devices_present():
    assert jax.device_count() == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_single_device():
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ndpp_tpu.ops.twobody import twobody_moments
    from ndpp_tpu.parallel.mesh import auto_mesh, place_batch, sharded_twobody_moments

    mesh = auto_mesh(jax.devices())
    pn, pe = mesh.devices.shape
    n_nuc, t = 2 * pn, 4 * pe
    e, knots, pdf, bounds, c1, c2, awr = ge._example_batch(n_nuc, t)
    placed = place_batch(mesh, {"e": e, "knots": knots, "pdf": pdf, "c1": c1, "c2": c2, "awr": awr})
    sharded = np.asarray(
        sharded_twobody_moments(
            mesh, placed["e"], placed["knots"], placed["pdf"], jnp.asarray(bounds),
            placed["c1"], placed["c2"], placed["awr"], order=3, nq=8,
        )
    )
    # single-device reference: flatten rows
    rows = n_nuc * t
    ref = np.asarray(
        twobody_moments(
            jnp.asarray(e.reshape(rows)),
            jnp.asarray(knots.reshape(rows, -1)),
            jnp.asarray(pdf.reshape(rows, -1)),
            jnp.asarray(bounds),
            jnp.asarray(np.repeat(c1, t)),
            jnp.asarray(np.repeat(c2, t)),
            jnp.asarray(np.repeat(awr, t)),
            3,
            8,
        )
    ).reshape(n_nuc, t, 4, -1)
    np.testing.assert_allclose(sharded, ref, rtol=1e-14, atol=1e-15)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
