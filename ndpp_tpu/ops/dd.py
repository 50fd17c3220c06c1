"""Double-double (f32-pair) arithmetic for Pallas TPU kernels.

Pallas on TPU has no native f64 (SURVEY.md section 7, hard part 1); the
accuracy bar is 1e-8 relative per moment. This module implements
error-free-transformation arithmetic on pairs of f32 (``hi + lo`` with
``|lo| <= ulp(hi)/2``), giving ~2^-46 ~ 1.4e-14 relative precision with
f32 vector throughput — usable both inside Pallas kernels and in plain
XLA.

Algorithms are the classical Dekker/Knuth error-free transforms (TwoSum,
Split, TwoProd) as consolidated in Hida-Li-Bailey's QD library; Dekker's
split is used for products (no reliance on an FMA primitive — JAX does
not expose one, and the transforms below are correct whether or not the
compiler contracts to FMA, since every intermediate difference is exact
by construction).

Representation: a plain ``(hi, lo)`` tuple of same-shape f32 arrays.
All functions are elementwise and broadcast like jnp.

Range caveat (documented in docs/design.md): exponent range is f32's, so
magnitudes must stay within ~1e-35..1e35. Dekker's split multiplies by
2^12+1, so operands must stay below ~3e34. The moment kernels keep all
quantities in eV-scale ranges (1e-11..2e7) where this is safe; guard
divisions with the repo-wide 1e-30 floor (never 1e-300: it flushes to
zero in f32 range).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

# Dekker split factor for binary32: 2^ceil(24/2) + 1.
_SPLIT = np.float32(4097.0)


# ---------------------------------------------------------------------------
# error-free transforms (f32 in, f32 pair out)
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """s + e == a + b exactly, s = fl(a + b). 6 flops, no ordering req."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (or a == 0). 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a == hi + lo with hi, lo having <= 12 mantissa bits."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b, a_sp=None, b_sp=None):
    """p + e == a * b exactly. Pass precomputed ``split`` results to hoist
    loop-invariant splits out of hot loops (the split is 4 of the 17
    flops per product, per operand)."""
    p = a * b
    ah, al = split(a) if a_sp is None else a_sp
    bh, bl = split(b) if b_sp is None else b_sp
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# double-double ops ((hi, lo) pairs)
# ---------------------------------------------------------------------------

def add(x, y):
    """dd + dd, accurate variant (~2 ulp_dd)."""
    s1, s2 = two_sum(x[0], y[0])
    t1, t2 = two_sum(x[1], y[1])
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def add_f(x, b):
    """dd + f32."""
    s1, s2 = two_sum(x[0], b)
    s2 = s2 + x[1]
    return quick_two_sum(s1, s2)


def neg(x):
    return -x[0], -x[1]


def sub(x, y):
    return add(x, neg(y))


def mul(x, y, x_sp=None, y_sp=None):
    """dd * dd. Optional precomputed splits of the hi words."""
    p1, p2 = two_prod(x[0], y[0], x_sp, y_sp)
    p2 = p2 + x[0] * y[1] + x[1] * y[0]
    return quick_two_sum(p1, p2)


def mul_f(x, b, x_sp=None, b_sp=None):
    """dd * f32."""
    p1, p2 = two_prod(x[0], b, x_sp, b_sp)
    p2 = p2 + x[1] * b
    return quick_two_sum(p1, p2)


def f_mul_f(a, b, a_sp=None, b_sp=None):
    """f32 * f32 -> exact dd."""
    return two_prod(a, b, a_sp, b_sp)


def rsqrt(x):
    """dd 1/sqrt(x), x > 0: f32 seed + one full-dd Newton step.

    Seed error ~1e-7 -> post-Newton relative error ~ (1e-7)^2 plus dd
    rounding, i.e. ~1e-14. Inputs must be pre-floored (jnp.maximum with
    1e-30) by the caller on maskable rows.
    """
    y0 = lax.rsqrt(x[0])
    y0sq = two_prod(y0, y0)
    t = mul(x, y0sq)  # ~ 1 + eps
    r = add_f(neg(t), np.float32(1.0))  # 1 - x*y0^2, exact-ish cancellation
    corr = mul_f(r, np.float32(0.5) * y0)
    return add_f(corr, y0)


def clip1(x):
    """Clamp a dd value into [-1, 1] (dd-exact comparison on the pair)."""
    over = (x[0] > 1.0) | ((x[0] == 1.0) & (x[1] > 0.0))
    under = (x[0] < -1.0) | ((x[0] == -1.0) & (x[1] < 0.0))
    one = jnp.ones_like(x[0])
    zero = jnp.zeros_like(x[0])
    hi = jnp.where(over, one, jnp.where(under, -one, x[0]))
    lo = jnp.where(over | under, zero, x[1])
    return hi, lo


def max_f(x, b):
    """dd max with an f32 constant (compare on hi; ties ignore lo — used
    only as a positivity floor where the constant is far below data)."""
    take = x[0] < b
    return jnp.where(take, b, x[0]), jnp.where(take, jnp.zeros_like(x[1]), x[1])


# ---------------------------------------------------------------------------
# conversions (XLA side; f64 requires jax_enable_x64)
# ---------------------------------------------------------------------------

def from_f64(x):
    """f64 array -> (hi, lo) f32 pair (exact to f64's first 48 bits)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(x):
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def const(v: float):
    """Python float -> static numpy (hi, lo) pair for kernel constants."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return hi, lo


def split_np(a):
    """Dekker split computed in numpy f32 (for static kernel constants)."""
    a = np.float32(a)
    c = np.float32(_SPLIT * a)
    hi = np.float32(c - np.float32(c - a))
    return hi, np.float32(a - hi)
