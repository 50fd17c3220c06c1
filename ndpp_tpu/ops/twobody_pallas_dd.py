"""Pallas TPU kernel: two-body inner stage in double-double (f32 pairs).

The accuracy-compliant fast path (SURVEY.md section 7 step 7 / hard part
1): same fused structure as ops.twobody_pallas (rows in sublanes,
subintervals in lanes, Q and L unrolled), but every in-kernel quantity is
a dd pair (ops.dd), giving ~1e-13 relative agreement with the XLA f64
path — comfortably inside the 1e-8 bar — while all vector arithmetic
stays f32. The prologue (twobody_panels) and epilogue (twobody_scatter)
run in XLA f64 exactly as the reference f64 path; only the quadrature/
Legendre/accumulation stage is replaced.

Grid-free chunked pallas_call (the axon remote compiler rejects gridded
calls; see ops/twobody_pallas.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ndpp_tpu.ops import dd
from ndpp_tpu.ops.legendre import gl_nodes_weights
from ndpp_tpu.ops.twobody import twobody_panels, twobody_scatter

_ROW_TILE = 8


def _inner_kernel_dd(order: int, nq: int, xq64: np.ndarray, wq64: np.ndarray):
    xq_c = [dd.const(float(x)) for x in xq64]
    wq_c = [dd.const(float(w)) for w in wq64]
    xq_sp = [dd.split_np(h) for h, _ in xq_c]
    wq_sp = [dd.split_np(h) for h, _ in wq_c]
    # Legendre recurrence coefficients as exact-dd constants:
    # p_{l+1} = A_l * mu * p_l - B_l * p_{l-1}
    a_c = [dd.const((2 * l + 1) / (l + 1)) for l in range(1, order)]
    b_c = [dd.const(l / (l + 1)) for l in range(1, order)]
    a_sp = [dd.split_np(h) for h, _ in a_c]
    b_sp = [dd.split_np(h) for h, _ in b_c]

    def kernel(mid_h, mid_l, half_h, half_l, a_h, a_l, b_h, b_l, kin_h, kin_l, *out_refs):
        mid = (mid_h[:], mid_l[:])
        half = (half_h[:], half_l[:])
        a = (a_h[:], a_l[:])
        b = (b_h[:], b_l[:])
        base = (kin_h[:, 0:1], kin_l[:, 0:1])
        slope = (kin_h[:, 1:2], kin_l[:, 1:2])
        sqecm = (kin_h[:, 2:3], kin_l[:, 2:3])
        sqe_ap1 = (kin_h[:, 3:4], kin_l[:, 3:4])

        # hoist Dekker splits of every q-loop-invariant hi word
        half_sp = dd.split(half[0])
        b_sp_r = dd.split(b[0])
        slope_sp = dd.split(slope[0])
        sqecm_sp = dd.split(sqecm[0])

        zero = jnp.zeros_like(mid[0])
        acc = [(zero, zero) for _ in range(order + 1)]
        for q in range(nq):
            mu = dd.add(mid, dd.mul(half, xq_c[q], x_sp=half_sp, y_sp=xq_sp[q]))
            mu_sp = dd.split(mu[0])
            pdf = dd.add(a, dd.mul(b, mu, x_sp=b_sp_r, y_sp=mu_sp))
            elab = dd.add(base, dd.mul(slope, mu, x_sp=slope_sp, y_sp=mu_sp))
            elab = dd.max_f(elab, np.float32(1e-30))
            inv = dd.rsqrt(elab)
            num = dd.add(dd.mul(sqecm, mu, x_sp=sqecm_sp, y_sp=mu_sp), sqe_ap1)
            mul_lab = dd.clip1(dd.mul(num, inv))
            w = dd.mul(pdf, wq_c[q], y_sp=wq_sp[q])

            acc[0] = dd.add(acc[0], w)
            if order >= 1:
                ml_sp = dd.split(mul_lab[0])
                p_prev = (jnp.ones_like(mid[0]), zero)
                p_cur = mul_lab
                acc[1] = dd.add(acc[1], dd.mul(w, p_cur))
                for l in range(1, order):
                    t = dd.mul(mul_lab, p_cur, x_sp=ml_sp)
                    t = dd.mul(t, a_c[l - 1], y_sp=a_sp[l - 1])
                    u = dd.mul(p_prev, b_c[l - 1], y_sp=b_sp[l - 1])
                    p_prev, p_cur = p_cur, dd.sub(t, u)
                    acc[l + 1] = dd.add(acc[l + 1], dd.mul(w, p_cur))
        for l in range(order + 1):
            m = dd.mul(acc[l], half, y_sp=half_sp)
            out_refs[2 * l][:] = m[0]
            out_refs[2 * l + 1][:] = m[1]

    return kernel


@partial(jax.jit, static_argnames=("order", "nq", "interpret"))
def twobody_inner_dd(mid, half, a_s, b_s, kin, order: int, nq: int = 16, interpret: bool = False):
    """dd inner stage: inputs are (hi, lo) pairs stacked on a leading axis
    of size 2 — mid/half/a_s/b_s: (2, T, S) f32; kin: (2, T, 4) f32.
    Returns (T, L+1, S) f64 (hi + lo recombined)."""
    _, t, s = mid.shape
    assert s % 128 == 0, "pad the subinterval axis to a multiple of 128"
    assert t % _ROW_TILE == 0, "pad rows to a multiple of the row tile"
    xq, wq = gl_nodes_weights(nq)
    kernel = _inner_kernel_dd(order, nq, np.asarray(xq), np.asarray(wq))

    # VMEM budget: 8 (R,S) inputs + 2(L+1) (R,S) outputs + unrolled dd
    # temporaries; stay conservative.
    chunk = _ROW_TILE
    while (
        chunk * 2 * s * 4 * (10 + 2 * (order + 1) + 24) <= 8 * 1024 * 1024
        and chunk * 2 <= t
        and t % (chunk * 2) == 0
    ):
        chunk *= 2
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_out = 2 * (order + 1)

    def one_chunk(args):
        m_c, h_c, a_c, b_c, k_c = args
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((chunk, s), jnp.float32) for _ in range(n_out)),
            in_specs=[vspec] * 10,
            out_specs=tuple(vspec for _ in range(n_out)),
            interpret=interpret,
        )(m_c[0], m_c[1], h_c[0], h_c[1], a_c[0], a_c[1], b_c[0], b_c[1], k_c[0], k_c[1])
        hi = jnp.stack(outs[0::2], axis=1)  # (chunk, L+1, S) f32
        lo = jnp.stack(outs[1::2], axis=1)
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)

    if t == chunk:
        return one_chunk((mid, half, a_s, b_s, kin))
    if t % chunk:
        raise AssertionError("row count must be a multiple of the chunk size")
    n = t // chunk
    resh = lambda x: x.reshape(2, n, chunk, *x.shape[2:]).swapaxes(0, 1)  # noqa: E731
    out = jax.lax.map(one_chunk, (resh(mid), resh(half), resh(a_s), resh(b_s), resh(kin)))
    return out.reshape(t, order + 1, s)


@partial(jax.jit, static_argnames=("order", "nq", "clamp", "interpret"))
def twobody_moments_dd(
    e, knots, pdf, bounds, c1, c2, awr, order: int, nq: int = 16, clamp: bool = True,
    interpret: bool = False,
):
    """Full two-body moments with the dd Pallas inner stage.

    Drop-in signature match for ops.twobody.twobody_moments (f64 in/out).
    Prologue and epilogue are the f64 XLA stages shared with the reference
    path; the inner quadrature runs in dd on the VPU.
    """
    f64 = jnp.float64
    e = e.astype(f64)
    knots = knots.astype(f64)
    pdf = pdf.astype(f64)
    bounds64 = bounds.astype(f64)
    mid, half, a_s, b_s, base, slope, ecm, e_safe, ap1, valid_e = twobody_panels(
        e, knots, pdf, bounds64, c1, c2, awr, clamp
    )
    t, s = mid.shape
    s_pad = -(-s // 128) * 128
    t_pad = -(-t // _ROW_TILE) * _ROW_TILE

    def pair(x, pad_width):
        h, l = dd.from_f64(x)
        return jnp.stack([jnp.pad(h, pad_width), jnp.pad(l, pad_width)])

    padw = ((0, t_pad - t), (0, s_pad - s))
    kin64 = jnp.stack(
        [base, slope, jnp.sqrt(ecm), jnp.sqrt(e_safe) / ap1], axis=1
    )  # (T, 4)
    m = twobody_inner_dd(
        pair(mid, padw),
        pair(half, padw),
        pair(a_s, padw),
        pair(b_s, padw),
        pair(kin64, ((0, t_pad - t), (0, 0))),
        order,
        nq,
        interpret,
    )[:t, :, :s]  # (T, L+1, S) f64
    return twobody_scatter(m, mid, half, base, slope, valid_e, bounds64, clamp)
