"""Legendre recurrence and Gauss-Legendre quadrature tables.

P_l via the Bonnet recurrence (SURVEY.md section 8.3); GL nodes/weights
precomputed on host in float64 with numpy (never inside jit — they are
trace-time constants baked into the kernels).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def gl_nodes_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Legendre nodes/weights on [-1, 1], float64."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


def legendre_all(x, order: int):
    """Stack [P_0(x), ..., P_order(x)] along a new LAST axis.

    Bonnet: (l+1) P_{l+1} = (2l+1) x P_l - l P_{l-1}.
    """
    x = jnp.asarray(x)
    ps = [jnp.ones_like(x)]
    if order >= 1:
        ps.append(x)
    for l in range(1, order):
        ps.append(((2 * l + 1) * x * ps[l] - l * ps[l - 1]) / (l + 1))
    return jnp.stack(ps, axis=-1)


def legendre_all_np(x: np.ndarray, order: int) -> np.ndarray:
    """Numpy twin of legendre_all (oracle/tests)."""
    x = np.asarray(x, dtype=np.float64)
    ps = [np.ones_like(x)]
    if order >= 1:
        ps.append(x)
    for l in range(1, order):
        ps.append(((2 * l + 1) * x * ps[l] - l * ps[l - 1]) / (l + 1))
    return np.stack(ps, axis=-1)
