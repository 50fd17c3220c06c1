#!/usr/bin/env python
"""On-chip stage attribution for the two-body moment path (bench shape).

Methodology (hard-won): the axon remote layer elides repeated identical
executions, and per-iteration host roundtrips are unusable on this 1-core
box — so each stage is timed as ONE device execution of a lax.fori_loop
whose carry chains a data dependency through every iteration (the loop
body perturbs the stage's variable input by a factor derived from the
previous output, preventing both elision and loop-invariant hoisting of
the stage compute).

Stages:
  panels   : twobody_panels prologue (edge sort + affine pdf coeffs)
  sort     : just the concat+sort inside the prologue
  affine   : just _affine_coeffs_rows
  inner    : (T,Q,S) quadrature + Legendre + q-reduction -> (T,L+1,S)
  scatter  : searchsorted + per-row scatter-add -> (T,L+1,G)
  full64   : whole twobody_moments (f64)
  fulldd   : whole twobody_moments_dd (dd Pallas inner, f64 in/out)

Each stage costs one remote axon compile (~60-100 s) cold.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import __graft_entry__ as ge
from ndpp_tpu import groups
from ndpp_tpu.ops.legendre import gl_nodes_weights
from ndpp_tpu.ops import twobody as tb

ORDER = 5
NQ = 16
TILE = 2048
K = 48
NG = 361
ITERS = 20


def timeloop(name, body, x0):
    """body: x -> (x_perturbed, out_scalar_chain). One compile + one timed
    device execution of ITERS chained iterations."""

    @jax.jit
    def run(x):
        return lax.fori_loop(0, ITERS, lambda i, x: body(x), x)

    out = run(x0)
    jax.block_until_ready(out)  # compile + warm
    scale = jnp.asarray(1.0 + 1e-9, x0.dtype)
    t0 = time.perf_counter()
    out = run(x0 * scale)  # different input values -> no elision
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}), flush=True)


def chain(x, out, scale):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return x * (1.0 + scale * leaf.ravel()[0].astype(x.dtype))


def main():
    e_np, knots_np, pdf_np, _, c1, c2, awr = ge._example_batch(1, TILE, k=K, ng=NG)
    bounds = jnp.asarray(groups.get("uniform-lethargy-361").bounds)
    e = jnp.asarray(e_np[0])
    knots = jnp.asarray(knots_np[0])
    pdf = jnp.asarray(pdf_np[0])
    c1 = jnp.asarray(np.repeat(c1, TILE))
    c2 = jnp.asarray(np.repeat(c2, TILE))
    awr = jnp.asarray(np.repeat(awr, TILE))
    print(json.dumps({"device": str(jax.devices()[0]), "dtype": str(e.dtype)}), flush=True)

    pan = jax.jit(partial(tb.twobody_panels, clamp=True))(e, knots, pdf, bounds, c1, c2, awr)
    mid, half, a_s, b_s, base, slope, ecm, e_safe, ap1, valid_e = [jax.device_put(x) for x in pan]

    def panels_body(e_x):
        out = tb.twobody_panels(e_x, knots, pdf, bounds, c1, c2, awr, True)
        return chain(e_x, out, 1e-13)

    timeloop("panels", panels_body, e)

    graded_np = -1.0 + 2.0 * 0.25 ** np.arange(1, 11)
    brk0 = jnp.zeros((TILE, NG + 1), dtype=e.dtype)

    def sort_body(kn):
        graded = jnp.broadcast_to(jnp.asarray(graded_np, kn.dtype), (kn.shape[0], 10))
        out = jnp.sort(jnp.concatenate([kn, brk0, graded], axis=1), axis=1)
        return chain(kn, out, 1e-13)

    timeloop("sort", sort_body, knots)

    def affine_body(mid_x):
        out = tb._affine_coeffs_rows(knots, pdf, mid_x)
        return chain(mid_x, out, 1e-13)

    timeloop("affine", affine_body, mid)

    xq, wq = gl_nodes_weights(NQ)

    def inner_calc(mid_x):
        xqa = jnp.asarray(xq, dtype=mid_x.dtype)
        wqa = jnp.asarray(wq, dtype=mid_x.dtype)
        mu_q = mid_x[:, None, :] + half[:, None, :] * xqa[None, :, None]
        pdf_q = a_s[:, None, :] + b_s[:, None, :] * mu_q
        elab_q = base[:, None, None] + slope[:, None, None] * mu_q
        inv_sqrt_elab = lax.rsqrt(elab_q)
        mu_lab = jnp.clip(
            (mu_q * jnp.sqrt(ecm)[:, None, None] + (jnp.sqrt(e_safe) / ap1)[:, None, None])
            * inv_sqrt_elab,
            -1.0,
            1.0,
        )
        weight = pdf_q * wqa[None, :, None] * half[:, None, :]
        p_prev = jnp.ones_like(mu_lab)
        m_list = [jnp.sum(weight, axis=1)]
        p_cur = mu_lab
        m_list.append(jnp.sum(weight * p_cur, axis=1))
        for l in range(1, ORDER):
            p_next = ((2 * l + 1) * mu_lab * p_cur - l * p_prev) / (l + 1)
            p_prev, p_cur = p_cur, p_next
            m_list.append(jnp.sum(weight * p_cur, axis=1))
        return jnp.stack(m_list, axis=1)

    def inner_body(mid_x):
        return chain(mid_x, inner_calc(mid_x), 1e-13)

    timeloop("inner", inner_body, mid)

    m0 = jax.jit(inner_calc)(mid)

    def scatter_body(m_x):
        out = tb.twobody_scatter(m_x, mid, half, base, slope, valid_e, bounds, True)
        return chain(m_x, out, 1e-13)

    timeloop("scatter", scatter_body, m0)

    def full64_body(e_x):
        out = tb.twobody_moments(e_x, knots, pdf, bounds, c1, c2, awr, ORDER, NQ)
        return chain(e_x, out, 1e-13)

    timeloop("full64", full64_body, e)

    if jax.devices()[0].platform != "cpu":
        from ndpp_tpu.ops.twobody_pallas_dd import twobody_moments_dd

        def fulldd_body(e_x):
            out = twobody_moments_dd(e_x, knots, pdf, bounds, c1, c2, awr, ORDER, NQ)
            return chain(e_x, out, 1e-13)

        timeloop("fulldd", fulldd_body, e)


if __name__ == "__main__":
    main()
