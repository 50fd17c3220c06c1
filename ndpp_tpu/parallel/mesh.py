"""Device mesh + sharded moment evaluation.

The distribution design fixed by the north star (BASELINE.json:5;
SURVEY.md sections 2 and 5):

  - mesh axis 'nuclide': blocks of nuclides, embarrassingly parallel
    (the analog of data parallelism for this workload);
  - mesh axis 'e': incident-energy tiles (the 'sequence' axis analog) —
    every incident energy is independent, so plain block sharding with NO
    collectives in the compute path is the correct TPU design; results are
    gathered only at output time (prefer per-device host pulls over an
    all-gather).

Communication rides ICI inside a slice via jax collectives if ever needed;
there is no NCCL/MPI anywhere.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ndpp_tpu.ops.twobody import twobody_moments


def auto_mesh(devices=None, n_nuclide: int | None = None) -> Mesh:
    """Build a ('nuclide', 'e') mesh over the available devices.

    Default split: nuclide axis gets the largest divisor of the device count
    <= sqrt(count) (nuclide blocks are coarser-grained than E-tiles).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_nuclide is None:
        n_nuclide = 1
        for d in range(1, int(np.sqrt(n)) + 1):
            if n % d == 0:
                n_nuclide = d
    if n % n_nuclide != 0:
        raise ValueError(f"n_nuclide={n_nuclide} does not divide device count {n}")
    arr = np.array(devices).reshape(n_nuclide, n // n_nuclide)
    return Mesh(arr, ("nuclide", "e"))


def sharded_twobody_moments(
    mesh: Mesh, e, knots, pdf, bounds, c1, c2, awr, order: int, nq: int = 16, clamp: bool = True
):
    """Two-body moments for a (nuclide x E-tile) batch, sharded over the mesh.

    Args:
      e: (N, T); knots/pdf: (N, T, K); c1/c2/awr: (N,); bounds replicated.
    Returns:
      (N, T, L+1, G) with sharding P('nuclide', 'e') — no collective is
      involved; the caller pulls shards to host for writing.
    """

    def local(e_b, kn_b, pd_b, bounds_b, c1_b, c2_b, awr_b):
        n_loc, t_loc = e_b.shape
        k = kn_b.shape[-1]
        rows = n_loc * t_loc
        c1_r = jnp.repeat(c1_b, t_loc)
        c2_r = jnp.repeat(c2_b, t_loc)
        awr_r = jnp.repeat(awr_b, t_loc)
        out = twobody_moments(
            e_b.reshape(rows),
            kn_b.reshape(rows, k),
            pd_b.reshape(rows, k),
            bounds_b,
            c1_r,
            c2_r,
            awr_r,
            order,
            nq,
            clamp,
        )
        return out.reshape(n_loc, t_loc, order + 1, bounds_b.shape[0] - 1)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("nuclide", "e"),
            P("nuclide", "e", None),
            P("nuclide", "e", None),
            P(),
            P("nuclide"),
            P("nuclide"),
            P("nuclide"),
        ),
        out_specs=P("nuclide", "e", None, None),
    )
    return fn(e, knots, pdf, bounds, c1, c2, awr)


def sharded_freegas_moments(mesh: Mesh, e, awr, kt, bounds, order: int, **kw):
    """Free-gas moments for an (N, T) energy batch sharded over the mesh.

    e: (N, T); awr: (N,); kt scalar; bounds replicated (must be FINITE —
    the production pointwise kernel windows them). No collectives.
    """
    from ndpp_tpu.ops.freegas import freegas_moments_sab

    def local(e_b, awr_b, bounds_b):
        n_loc, t_loc = e_b.shape
        rows = n_loc * t_loc
        out = freegas_moments_sab(
            e_b.reshape(rows), jnp.repeat(awr_b, t_loc), kt, bounds_b, order, **kw
        )
        return out.reshape(n_loc, t_loc, order + 1, bounds_b.shape[0] - 1)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("nuclide", "e"), P("nuclide"), P()),
        out_specs=P("nuclide", "e", None, None),
    )
    return fn(e, awr, bounds)


def sharded_chi_fractions(mesh: Mesh, e_knots, pdf, bounds, clamp: bool = True):
    """Tabular spectrum group fractions for an (N, T, K) batch, sharded."""
    from ndpp_tpu.ops.chi import tabular_group_fractions

    def local(kn_b, pd_b, bounds_b):
        n_loc, t_loc, k = kn_b.shape
        rows = n_loc * t_loc
        out = tabular_group_fractions(kn_b.reshape(rows, k), pd_b.reshape(rows, k), bounds_b, clamp)
        return out.reshape(n_loc, t_loc, bounds_b.shape[0] - 1)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("nuclide", "e", None), P("nuclide", "e", None), P()),
        out_specs=P("nuclide", "e", None),
    )
    return fn(e_knots, pdf, bounds)


def place_batch(mesh: Mesh, arrays: dict[str, np.ndarray]) -> dict[str, jax.Array]:
    """device_put host arrays with the canonical (nuclide, e, ...) sharding."""
    out = {}
    for name, arr in arrays.items():
        if arr.ndim >= 2:
            spec = P("nuclide", "e", *([None] * (arr.ndim - 2)))
        elif arr.ndim == 1:
            spec = P("nuclide")
        else:
            spec = P()
        out[name] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out
