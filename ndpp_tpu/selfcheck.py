"""On-chip accuracy gate: dd / f32 fast paths vs the f64 kernel at the
production shape (round-1 verdict item 4).

The round-1 evidence for the Pallas double-double path's accuracy on real
silicon was a manual drive recorded only in a commit message; this module
makes it a repeatable, recorded gate: ``ndpp selfcheck`` (CLI) and the
round bench (bench.py) both run it and fail loudly when the dd path
drifts past the 1e-8 accuracy bar (BASELINE.json:5).

Off-TPU the dd/f32 kernels run in Pallas interpret mode, which is
prohibitively slow at the production shape — the gate therefore SKIPS
(reported, not silently) unless the backend is a real TPU.
"""

from __future__ import annotations

import numpy as np

PROD_TILE = 2048
PROD_K = 48
PROD_NG = 361
PROD_ORDER = 5
PROD_NQ = 16


def production_inputs(tile: int = PROD_TILE, k: int = PROD_K, ng: int = PROD_NG):
    """Synthetic device-ready two-body batch at the production shape.

    Returns (e0, args) where args feed ops.twobody.twobody_moments after e.
    """
    import jax.numpy as jnp

    from ndpp_tpu import groups

    rng = np.random.default_rng(7)
    e = np.exp(rng.uniform(np.log(1e2), np.log(1e6), size=tile))
    knots = np.broadcast_to(np.linspace(-1.0, 1.0, k), (tile, k)).copy()
    pdf = np.abs(0.5 + 0.1 * rng.standard_normal((tile, k)))
    widths = np.diff(knots, axis=-1)
    pdf /= np.sum(0.5 * (pdf[:, 1:] + pdf[:, :-1]) * widths, axis=-1, keepdims=True)
    if ng == 361:
        bounds = groups.get("uniform-lethargy-361").bounds
    else:
        bounds = np.exp(np.linspace(np.log(1e-1), np.log(2e7), ng + 1))
    awr = float(rng.uniform(0.999, 240.0))
    c1 = np.zeros(tile)
    c2 = np.full(tile, (awr / (awr + 1.0)) ** 2)
    args = (
        jnp.asarray(knots),
        jnp.asarray(pdf),
        jnp.asarray(bounds),
        jnp.asarray(c1),
        jnp.asarray(c2),
        jnp.asarray(np.full(tile, awr)),
    )
    return jnp.asarray(e), args


def run(
    tile: int = PROD_TILE,
    order: int = PROD_ORDER,
    ng: int = PROD_NG,
    nq: int = PROD_NQ,
    e0=None,
    args=None,
) -> dict:
    """dd + f32 vs f64 max errors at the given shape on the current backend.

    Returns a dict with ``ok`` (dd within 1e-8 rel), per-path max abs/rel
    errors, and the shape. ``skipped`` is set off-TPU (see module docstring).
    """
    import jax
    import jax.numpy as jnp

    from ndpp_tpu.ops.twobody import twobody_moments

    out: dict = {"shape": {"tile": tile, "order": order, "groups": ng, "nq": nq}}
    if jax.devices()[0].platform != "tpu":
        out.update({"ok": True, "skipped": f"backend is {jax.devices()[0].platform}, not tpu"})
        return out

    from ndpp_tpu.ops.twobody_pallas import twobody_moments_pallas
    from ndpp_tpu.ops.twobody_pallas_dd import twobody_moments_dd

    if e0 is None or args is None:
        e0, args = production_inputs(tile, ng=ng)
    ref = np.asarray(twobody_moments(e0, *args, order, nq))

    def err(got):
        got = np.asarray(got)
        a = np.abs(got - ref)
        denom = np.maximum(np.abs(ref), 1e-6)  # moments are O(1); rel below 1e-6 is noise
        return float(a.max()), float((a / denom).max())

    out["dd_max_abs"], out["dd_max_rel"] = err(twobody_moments_dd(e0, *args, order, nq))
    args32 = tuple(jnp.asarray(a, jnp.float32) for a in args)
    out["f32_max_abs"], out["f32_max_rel"] = err(
        twobody_moments_pallas(jnp.asarray(e0, jnp.float32), *args32, order, nq)
    )
    out["ok"] = bool(out["dd_max_rel"] <= 1e-8)
    return out
