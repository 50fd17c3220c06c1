"""Flat row-sharded dispatch: every moment kernel over all visible chips.

The whole workload is embarrassingly parallel across incident-energy rows
(SURVEY.md section 5 'long-context'), so driver-level multi-chip execution
needs no kernel changes at all: tile inputs are device_put with a
NamedSharding over a 1-D 'e' mesh and the ordinary jitted kernels compile
to an SPMD program partitioned along the row axis — XLA inserts no
collectives because no op couples rows. Results are pulled shard-by-shard
to host at write time (no all-gather), per the SURVEY section 5 design.

On a single chip (the benching setup) everything reduces to plain
device_put; on a v5e-8 the same run() sweep spreads each super-tile over 8
chips across ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

_MESH: Mesh | None = None
_NDEV: int = 0
_DTYPE = np.float64  # device compute dtype (cfg.device.precision; f64 default)
_PRECISION = "f64"


def configure(max_devices: int = 0, precision: str = "f64") -> int:
    """(Re)build the flat 'e' mesh over up to max_devices chips (0 = all).

    Returns the device count in use. Called by the driver at run start;
    safe to call repeatedly (tests reconfigure between 1 and 8 devices).

    precision selects the kernel path: 'f64' computes in XLA-emulated
    float64, the 1e-8 production path; 'dd' keeps f64 tensors on the wire
    but lets kernels with a Pallas double-double inner stage
    (ops/twobody_pallas_dd) dispatch it — ~1e-11 agreement with f64
    (test_pallas), docs/design.md. (The f32 preview path was removed in
    round 4: slower than both at every measured shape.)
    """
    global _MESH, _NDEV, _DTYPE, _PRECISION
    devs = jax.devices()
    n = len(devs) if max_devices <= 0 else min(max_devices, len(devs))
    _NDEV = n
    _MESH = Mesh(np.asarray(devs[:n]), ("e",)) if n > 1 else None
    _DTYPE = np.float64
    _PRECISION = precision
    return n


def compute_dtype():
    """The configured device compute dtype (always np.float64 since round 4)."""
    return _DTYPE


def precision() -> str:
    """The configured precision string ('f64' | 'dd')."""
    return _PRECISION


def _cast(arr):
    """Float arrays -> the configured compute dtype (ints/bools untouched)."""
    a = np.asarray(arr)
    if a.dtype.kind == "f" and a.dtype != _DTYPE:
        return a.astype(_DTYPE)
    return arr


def ndev() -> int:
    if _NDEV == 0:
        configure()
    return _NDEV


def put_rows(arr):
    """Host array -> device array sharded along axis 0 (rows) over the mesh."""
    if _NDEV == 0:
        configure()
    arr = _cast(arr)
    if _MESH is None:
        import jax.numpy as jnp

        return jnp.asarray(arr)
    spec = P("e", *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(_MESH, spec))


def put_replicated(arr):
    """Host array -> device array replicated across the mesh (group bounds)."""
    if _NDEV == 0:
        configure()
    arr = _cast(arr)
    if _MESH is None:
        import jax.numpy as jnp

        return jnp.asarray(arr)
    return jax.device_put(arr, NamedSharding(_MESH, P()))


def tile_for(n: int, cap: int, e_tile: int = 512) -> int:
    """Rows per dispatch: one canonical kernel tile (cap-bounded) per device.

    `cap` is each kernel family's default row budget and SCALES with
    cfg.device.e_tile relative to its 512 default, so the driver's
    device-OOM retry (which halves e_tile) shrinks every kernel family's
    dispatch shape, not just the two-body path.

    Tiles come from a THREE-step ladder {cap/16, cap/4, cap} rather than
    every pow2 (round 3): each distinct compiled row shape costs minutes
    on the remote compiler while the padding a coarser ladder wastes is
    microseconds of device time — the round-3 cold sweep measured
    ~3,200 s of its 6,100 s wall in remote compiles across the pow2
    shape spread.
    """
    nd = max(ndev(), 1)
    cap = max(16, cap * e_tile // 512)
    per = -(-n // nd)
    for t in (cap // 16, cap // 4, cap):
        if t >= 16 and per <= t:
            return t * nd
    return cap * nd
