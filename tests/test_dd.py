"""Double-double (f32-pair) arithmetic: accuracy vs f64 ground truth.

SURVEY.md section 7 hard part 1: the dd layer must itself be verified to
~1e-13 before any kernel builds on it. Ground truth: numpy f64 on inputs
that are exactly representable as dd (hi + lo with hi, lo f32), so the
f64 computation is exact to ~1e-16 and the comparison isolates dd error.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ndpp_tpu.ops import dd


def _rand_dd(rng, n, scale_lo=-6.0, scale_hi=6.0, signed=True):
    """Random dd-exact values spanning |x| in 10^[scale_lo, scale_hi]."""
    mag = 10.0 ** rng.uniform(scale_lo, scale_hi, n)
    if signed:
        mag = mag * rng.choice([-1.0, 1.0], n)
    hi = mag.astype(np.float32)
    lo = ((mag - hi.astype(np.float64)) * (1.0 + rng.uniform(-0.5, 0.5, n))).astype(
        np.float32
    )
    # renormalize so (hi, lo) is a valid dd pair
    s = hi.astype(np.float64) + lo.astype(np.float64)
    hi = s.astype(np.float32)
    lo = (s - hi.astype(np.float64)).astype(np.float32)
    return (jnp.asarray(hi), jnp.asarray(lo)), hi.astype(np.float64) + lo.astype(np.float64)


def _rel(got, want):
    denom = np.maximum(np.abs(want), 1e-30)
    return np.max(np.abs(got - want) / denom)


@pytest.fixture(scope="module")
def vals(rng):
    return _rand_dd(rng, 4096)


def test_two_sum_exact(rng):
    a = (10.0 ** rng.uniform(-6, 6, 2048) * rng.choice([-1, 1], 2048)).astype(np.float32)
    b = (10.0 ** rng.uniform(-6, 6, 2048) * rng.choice([-1, 1], 2048)).astype(np.float32)
    s, e = jax.jit(dd.two_sum)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    want = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(got, want)  # error-free: EXACT


def test_two_prod_exact(rng):
    a = (10.0 ** rng.uniform(-6, 6, 2048) * rng.choice([-1, 1], 2048)).astype(np.float32)
    b = (10.0 ** rng.uniform(-6, 6, 2048) * rng.choice([-1, 1], 2048)).astype(np.float32)
    p, e = jax.jit(dd.two_prod)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    want = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_array_equal(got, want)  # 12x12-bit partials: EXACT


def test_add_mul(rng):
    (x, xf), (y, yf) = _rand_dd(rng, 4096), _rand_dd(rng, 4096)
    s = jax.jit(dd.add)(x, y)
    assert _rel(np.asarray(dd.to_f64(s)), xf + yf) < 2e-13 or np.allclose(
        np.asarray(dd.to_f64(s)), xf + yf, atol=1e-20
    )
    # addition cancellation: |x + (-x + tiny)| stays accurate in dd
    p = jax.jit(dd.mul)(x, y)
    assert _rel(np.asarray(dd.to_f64(p)), xf * yf) < 2e-13


def test_mul_f_and_presplit(rng):
    (x, xf), _ = _rand_dd(rng, 4096), None
    b = (10.0 ** rng.uniform(-3, 3, 4096)).astype(np.float32)
    got = jax.jit(dd.mul_f)(x, jnp.asarray(b))
    want = xf * b.astype(np.float64)
    assert _rel(np.asarray(dd.to_f64(got)), want) < 2e-13
    # hoisted splits must give bit-identical results
    sp = jax.jit(dd.split)(x[0])
    got2 = jax.jit(lambda x, b, sp: dd.mul_f(x, b, x_sp=sp))(x, jnp.asarray(b), sp)
    np.testing.assert_array_equal(np.asarray(got2[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(got2[1]), np.asarray(got[1]))


def test_rsqrt(rng):
    x, xf = _rand_dd(rng, 4096, scale_lo=-8.0, scale_hi=8.0, signed=False)
    got = jax.jit(dd.rsqrt)(x)
    want = 1.0 / np.sqrt(xf)
    assert _rel(np.asarray(dd.to_f64(got)), want) < 5e-13


def test_clip1_and_max(rng):
    hi = np.array([1.0, 1.0, -1.0, -1.0, 0.5, 2.0, -3.0], np.float32)
    lo = np.array([1e-8, -1e-8, -1e-8, 1e-8, 1e-9, 0.0, 0.0], np.float32)
    chi, clo = jax.jit(dd.clip1)((jnp.asarray(hi), jnp.asarray(lo)))
    want = np.clip(hi.astype(np.float64) + lo.astype(np.float64), -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(chi, np.float64) + np.asarray(clo, np.float64), want, rtol=0, atol=0)
    m = jax.jit(lambda x: dd.max_f(x, np.float32(1e-30)))((jnp.asarray(hi), jnp.asarray(lo)))
    assert np.all(np.asarray(m[0]) >= np.float32(1e-30) - 3.0 * np.abs(hi))  # floor applied on hi


def test_roundtrip_f64(rng):
    x = 10.0 ** rng.uniform(-10, 7, 4096) * rng.choice([-1, 1], 4096)
    pair = dd.from_f64(jnp.asarray(x))
    back = np.asarray(dd.to_f64(pair))
    assert _rel(back, x) < 1e-13


def test_dot_product_cancellation(rng):
    """A length-64 compensated dot with heavy cancellation: dd must hold
    ~1e-13 where plain f32 loses everything."""
    n, k = 256, 64
    a = rng.standard_normal((n, k))
    b = rng.standard_normal((n, k))
    a64, b64 = a.astype(np.float64), b.astype(np.float64)

    def dot_dd(a_hi, a_lo, b_hi, b_lo):
        acc = (jnp.zeros_like(a_hi[:, 0]), jnp.zeros_like(a_hi[:, 0]))
        for j in range(k):
            xa = (a_hi[:, j], a_lo[:, j])
            xb = (b_hi[:, j], b_lo[:, j])
            acc = dd.add(acc, dd.mul(xa, xb))
        return acc

    pa, pb = dd.from_f64(jnp.asarray(a64)), dd.from_f64(jnp.asarray(b64))
    got = np.asarray(dd.to_f64(jax.jit(dot_dd)(pa[0], pa[1], pb[0], pb[1])))
    want = np.sum(a64 * b64, axis=1)
    assert np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-3)) < 1e-12
