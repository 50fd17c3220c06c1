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


def configure(max_devices: int = 0) -> int:
    """(Re)build the flat 'e' mesh over up to max_devices chips (0 = all).

    Returns the device count in use. Called by the driver at run start;
    safe to call repeatedly (tests reconfigure between 1 and 8 devices).
    """
    global _MESH, _NDEV
    devs = jax.devices()
    n = len(devs) if max_devices <= 0 else min(max_devices, len(devs))
    _NDEV = n
    _MESH = Mesh(np.asarray(devs[:n]), ("e",)) if n > 1 else None
    return n


def ndev() -> int:
    if _NDEV == 0:
        configure()
    return _NDEV


def put_rows(arr):
    """Host array -> device array sharded along axis 0 (rows) over the mesh."""
    if _NDEV == 0:
        configure()
    if _MESH is None:
        import jax.numpy as jnp

        return jnp.asarray(arr)
    spec = P("e", *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(_MESH, spec))


def put_replicated(arr):
    """Host array -> device array replicated across the mesh (group bounds)."""
    if _NDEV == 0:
        configure()
    if _MESH is None:
        import jax.numpy as jnp

        return jnp.asarray(arr)
    return jax.device_put(arr, NamedSharding(_MESH, P()))


def super_tile(tile: int) -> int:
    """Rows per dispatch: one kernel-tile per device."""
    return tile * max(ndev(), 1)
