"""Pallas TPU kernel: fused two-body subinterval-moment evaluation (f32 path).

The hot inner stage of ops.twobody.twobody_moments — per (row, subinterval):
GL nodes, affine pdf, kinematics, Legendre recurrence, q-reduction — fused
into VMEM so no (T, Q, S) intermediate ever touches HBM. This is the
throughput path (device.precision = "f32", ~1e-6 moment accuracy); the
accurate path stays XLA f64. Layout: rows in sublanes, subintervals in
lanes (S padded to 128), Q and L unrolled as static loops.

Edges/coefficients are prepared by the same XLA prologue as the reference
kernel (sort + breakpoint algebra are cheap and stay fused upstream).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ndpp_tpu.ops.legendre import gl_nodes_weights
from ndpp_tpu.ops.twobody import twobody_panels, twobody_scatter

_ROW_TILE = 8  # sublane tile


def _inner_kernel(order: int, nq: int, xq: np.ndarray, wq: np.ndarray):
    def kernel(mid_ref, half_ref, a_ref, b_ref, kin_ref, *out_refs):
        mid = mid_ref[:]  # (R, S)
        half = half_ref[:]
        a = a_ref[:]
        b = b_ref[:]
        base = kin_ref[:, 0:1]  # (R, 1) broadcast over lanes
        slope = kin_ref[:, 1:2]
        sqecm = kin_ref[:, 2:3]
        sqe_ap1 = kin_ref[:, 3:4]

        acc = [jnp.zeros_like(mid) for _ in range(order + 1)]
        for q in range(nq):
            mu = mid + half * xq[q]
            pdf = a + b * mu
            elab = base + slope * mu
            inv = jax.lax.rsqrt(jnp.maximum(elab, 1e-30))
            mul = jnp.clip((mu * sqecm + sqe_ap1) * inv, -1.0, 1.0)
            w = pdf * (wq[q])
            p_prev = jnp.ones_like(mul)
            acc[0] = acc[0] + w
            if order >= 1:
                p_cur = mul
                acc[1] = acc[1] + w * p_cur
                for l in range(1, order):
                    p_next = ((2 * l + 1) * mul * p_cur - l * p_prev) / (l + 1)
                    p_prev, p_cur = p_cur, p_next
                    acc[l + 1] = acc[l + 1] + w * p_cur
        for l in range(order + 1):
            out_refs[l][:] = acc[l] * half

    return kernel


@partial(jax.jit, static_argnames=("order", "nq", "interpret"))
def twobody_inner_pallas(mid, half, a_s, b_s, kin, order: int, nq: int = 16, interpret: bool = False):
    """m_{l,s} = sum_q w_q pdf(mu_q) P_l(mu_lab(mu_q)) * half  — (T, L+1, S).

    mid/half/a_s/b_s: (T, S) f32 (S padded to a multiple of 128);
    kin: (T, 4) f32 rows [base, slope, sqrt(ecm), sqrt(e)/(A+1)].
    """
    t, s = mid.shape
    assert s % 128 == 0, "pad the subinterval axis to a multiple of 128"
    assert t % _ROW_TILE == 0, "pad rows to a multiple of the row tile"
    xq, wq = gl_nodes_weights(nq)
    kernel = _inner_kernel(order, nq, xq.astype(np.float32), wq.astype(np.float32))

    # The axon remote compiler rejects GRIDDED pallas_calls (Mosaic
    # 'func.return' legalization — client/terminal version skew), while
    # grid-free programs compile fine. So: one grid-free program per
    # VMEM-sized row chunk, mapped over chunks with lax.map.
    chunk = _ROW_TILE
    while (
        chunk * 2 * s * 4 * (5 + order + 1) <= 8 * 1024 * 1024
        and chunk * 2 <= t
        and t % (chunk * 2) == 0
    ):
        chunk *= 2
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def one_chunk(args):
        m_c, h_c, a_c, b_c, k_c = args
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((chunk, s), mid.dtype) for _ in range(order + 1)),
            in_specs=[vspec] * 5,
            out_specs=tuple(vspec for _ in range(order + 1)),
            interpret=interpret,
        )(m_c, h_c, a_c, b_c, k_c)
        return jnp.stack(outs, axis=1)  # (chunk, L+1, S)

    if t == chunk:
        return one_chunk((mid, half, a_s, b_s, kin))
    n = t // chunk
    if t % chunk:
        raise AssertionError("row count must be a multiple of the chunk size")
    resh = lambda x: x.reshape(n, chunk, *x.shape[1:])  # noqa: E731
    out = jax.lax.map(one_chunk, (resh(mid), resh(half), resh(a_s), resh(b_s), resh(kin)))
    return out.reshape(t, order + 1, s)


@partial(jax.jit, static_argnames=("order", "nq", "clamp", "interpret"))
def twobody_moments_pallas(
    e, knots, pdf, bounds, c1, c2, awr, order: int, nq: int = 16, clamp: bool = True,
    interpret: bool = False,
):
    """Full two-body moments with the fused Pallas inner stage (f32 path).

    Drop-in signature match for ops.twobody.twobody_moments: the XLA
    prologue (twobody_panels) and group scatter (twobody_scatter) run in
    f64 exactly like the dd path — edge sorting and breakpoint algebra in
    f32 both capped accuracy (4e-2 worst rel at the production shape,
    BENCH_r02 selfcheck) and, being XLA-f64-free, bought nothing: the
    round-2 f32 path measured SLOWER than dd (9.0e7 vs 1.18e8) because
    the f32 prologue/epilogue dominated. Only the (row, subinterval,
    quad, order) accumulation runs in the f32 Pallas kernel (~1e-7 rel).
    Production gating lives in driver._tiled_twobody
    (device.precision='f32', single chip, TPU backend).
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
    f32 = jnp.float32
    padw = lambda x: jnp.pad(x.astype(f32), ((0, t_pad - t), (0, s_pad - s)))  # noqa: E731
    kin = jnp.stack(
        [base, slope, jnp.sqrt(ecm), jnp.sqrt(e_safe) / ap1], axis=1
    )  # (T, 4)
    kin = jnp.pad(kin.astype(f32), ((0, t_pad - t), (0, 0)))
    m = twobody_inner_pallas(
        padw(mid), padw(half), padw(a_s), padw(b_s), kin, order, nq, interpret
    )[:t, :, :s]  # (T, L+1, S) f32
    return twobody_scatter(m.astype(f64), mid, half, base, slope, valid_e, bounds64, clamp)
