"""Exact gather-free selection: one-hot f32 matmuls over split-f64 payloads.

XLA:TPU lowers `take_along_axis` on f64 operands to a kCustom scalar
gather per emulated half; at the continuum kernel's production shape the
two window gathers measured 80 ms of a 167 ms dispatch (round-5 profile,
BASELINE.md). A *selection* is a linear map with 0/1 coefficients, so it
can ride the MXU instead: split each f64 payload into three f32 pieces
(hi/mid/lo, each exactly representable and summing to the value below
f64 ulp), multiply each piece by the one-hot selection matrix with
`precision=HIGHEST` (bf16x6 passes — exact for one-hot: every product is
the piece itself or zero, and the pieces occupy disjoint bit ranges so
f32 accumulation is exact), and reconstruct in f64. The result matches
the gather to the last bit for every payload this framework produces
(|x| < 2^103; verified element-exact in tests/test_continuum.py).

Cost: a (T, Q, K) f32 one-hot against a (T, K, C) payload is T*Q*K*C
f32 MACs on the MXU — microseconds at the shapes here, vs milliseconds
for the scalar gather loop, and ~1000x less arithmetic than realizing
the same selection as an f64-emulated one-hot einsum (the round-4
mistake this module does NOT repeat: the one-hot matmul is only a win
when it runs in *native* f32, which selection — uniquely — permits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def split3(x):
    """f64 -> three f32 pieces (a, b, c) with a + b + c == x below f64 ulp.

    Each rounding leaves a residual with ~29 fewer significant bits, so
    three pieces carry ~72 bits — the reconstruction a + b + c, summed
    hi-to-lo in f64, reproduces x exactly (f64 carries 53) whenever the
    third piece (~2^-48 |x|) stays in NORMAL f32 range: |x| in
    ~[3e-24, 1e38]. Below that the flushed piece leaves <= ~2^-49
    relative residual; above, the first piece overflows — callers'
    payloads (eV-scale knots, pdfs, slopes, cumulants) sit comfortably
    inside (tests/test_select.py pins both regimes).
    """
    a = x.astype(jnp.float32)
    r = x - a.astype(x.dtype)
    b = r.astype(jnp.float32)
    r = r - b.astype(x.dtype)
    c = r.astype(jnp.float32)
    return a, b, c


def _onehot(idx, k: int):
    """(..., K) f32 one-hot of int indices (out-of-range rows are all-zero)."""
    return (idx[..., None] == jnp.arange(k, dtype=idx.dtype)).astype(jnp.float32)


def select_rows(payload, idx):
    """out[t, q, ...] = payload[t, idx[t, q], ...] as exact one-hot matmuls.

    payload: (T, K) or (T, K, C) f64; idx: (T, Q) int in [0, K).
    Returns (T, Q) or (T, Q, C) f64, bit-equal to take_along_axis.
    """
    squeeze = payload.ndim == 2
    p = payload[:, :, None] if squeeze else payload
    oh = _onehot(idx, p.shape[1])  # (T, Q, K)
    out = None
    for piece in split3(p):
        part = jnp.einsum("tqk,tkc->tqc", oh, piece, precision=_HI).astype(payload.dtype)
        out = part if out is None else out + part
    return out[..., 0] if squeeze else out


def select_windows(payload, j0, nsel: int):
    """out[t, w, i, ...] = payload[t, min(j0[t, w] + i, K-1), ...], i < nsel.

    Consecutive-window selection (the kernel's windowed-knot pattern):
    ONE one-hot (T, W, K) against a shifted payload stack (T, K, nsel*C)
    — cheaper than nsel independent row selections. payload: (T, K) or
    (T, K, C) f64; j0: (T, W) int. Returns (T, W, nsel[, C]) f64.
    """
    squeeze = payload.ndim == 2
    p = payload[:, :, None] if squeeze else payload
    tt, k, c = p.shape
    # shifted[t, j, i, :] = p[t, min(j + i, K-1), :] by static slices + edge pad
    shifted = jnp.stack(
        [jnp.concatenate([p[:, i:], p[:, -1:].repeat(i, axis=1)], axis=1) for i in range(nsel)],
        axis=2,
    )  # (T, K, nsel, C)
    oh = _onehot(j0, k)  # (T, W, K)
    out = None
    for piece in split3(shifted.reshape(tt, k, nsel * c)):
        part = jnp.einsum("twk,tkc->twc", oh, piece, precision=_HI).astype(payload.dtype)
        out = part if out is None else out + part
    out = out.reshape(tt, j0.shape[1], nsel, c)
    return out[..., 0] if squeeze else out
