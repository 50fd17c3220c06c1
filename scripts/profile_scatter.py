#!/usr/bin/env python
"""On-chip timing + agreement check: segment-reduction scatter vs the
scatter-add reference epilogue, and the full two-body paths with the new
epilogue. Methodology: chained lax.fori_loop (see profile_twobody.py)."""

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
from ndpp_tpu.ops import twobody as tb

ORDER = 5
NQ = 16
TILE = 2048
K = 48
NG = 361
ITERS = 20


def timeloop(name, body, x0):
    @jax.jit
    def run(x):
        return lax.fori_loop(0, ITERS, lambda i, x: body(x), x)

    out = run(x0)
    jax.block_until_ready(out)
    scale = jnp.asarray(1.0 + 1e-9, x0.dtype)
    t0 = time.perf_counter()
    out = run(x0 * scale)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}), flush=True)


def chain(x, out, scale=1e-13):
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
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    # agreement check: full path with new scatter vs reference scatter
    @jax.jit
    def full_ref(e_x):
        xq, wq = tb.gl_nodes_weights(NQ)
        pan = tb.twobody_panels(e_x, knots, pdf, bounds, c1, c2, awr, True)
        mid, half, a_s, b_s, base, slope, ecm, e_safe, ap1, valid_e = pan
        xqa = jnp.asarray(xq, e_x.dtype)
        wqa = jnp.asarray(wq, e_x.dtype)
        mu_q = mid[:, None, :] + half[:, None, :] * xqa[None, :, None]
        pdf_q = a_s[:, None, :] + b_s[:, None, :] * mu_q
        elab_q = base[:, None, None] + slope[:, None, None] * mu_q
        mu_lab = jnp.clip(
            (mu_q * jnp.sqrt(ecm)[:, None, None] + (jnp.sqrt(e_safe) / ap1)[:, None, None])
            * lax.rsqrt(elab_q),
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
        m = jnp.stack(m_list, axis=1)
        return tb.twobody_scatter_ref(m, mid, half, base, slope, valid_e, bounds, True)

    new = np.asarray(jax.jit(lambda e_x: tb.twobody_moments(e_x, knots, pdf, bounds, c1, c2, awr, ORDER, NQ))(e))
    ref = np.asarray(full_ref(e))
    err = np.max(np.abs(new - ref) / np.maximum(np.abs(ref), 1e-10))
    print(json.dumps({"check": "new_vs_ref_scatter", "max_rel_err": float(err)}), flush=True)

    def full64_body(e_x):
        out = tb.twobody_moments(e_x, knots, pdf, bounds, c1, c2, awr, ORDER, NQ)
        return chain(e_x, out)

    timeloop("full64_segscatter", full64_body, e)

    from ndpp_tpu.ops.twobody_pallas_dd import twobody_moments_dd

    def fulldd_body(e_x):
        out = twobody_moments_dd(e_x, knots, pdf, bounds, c1, c2, awr, ORDER, NQ)
        return chain(e_x, out)

    timeloop("fulldd_segscatter", fulldd_body, e)


if __name__ == "__main__":
    main()
