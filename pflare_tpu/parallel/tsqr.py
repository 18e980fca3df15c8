"""Distributed tall-skinny QR over the row mesh.

Reference: src/TSQR.F90 -- the reference reduces per-rank R factors with a
custom non-commutative MPI op so the power-basis GMRES coefficients cost a
single reduction.  The mesh-native equivalent: each shard QRs its local
rows, the small R factors are all-gathered (deterministically ordered, so
the combine is reproducible like the reference's deliberately
non-commutative op), stacked and QR'd again.  Usable as the ``qr_reduce``
hook of ``coefficients_power``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import ROW_AXIS


def tsqr_r(K, mesh: Mesh):
    """R factor of the QR of row-sharded K [n, m] via local QR + combine.

    Runs as one jitted shard_map program; the gathered R factors are tiny
    (m x m per shard)."""
    n_dev = mesh.devices.size
    m = K.shape[1]

    def local_qr(block):
        # block: [n/n_dev, m]
        r = jnp.linalg.qr(block, mode="r")
        # pad to [m, m] in case the local block is skinny-deficient
        return r[:m]

    def body(block):
        r_local = local_qr(block)
        # all-gather the R factors in axis order (deterministic combine)
        rs = jax.lax.all_gather(r_local, ROW_AXIS)  # [n_dev, m, m]
        stacked = rs.reshape(n_dev * m, m)
        return jnp.linalg.qr(stacked, mode="r")

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=P(ROW_AXIS, None),
        out_specs=P(None, None),
        check_vma=False,
    )
    return fn(K)


def make_qr_reduce(mesh: Mesh):
    """A ``qr_reduce`` callable for coefficients_power over the mesh
    (zero rows pad non-divisible K -- R is unchanged by zero rows)."""
    n_dev = mesh.devices.size

    def qr_reduce(K):
        K = jnp.asarray(K)
        pad = (-K.shape[0]) % n_dev
        if pad:
            K = jnp.pad(K, ((0, pad), (0, 0)))
        return np.asarray(tsqr_r(K, mesh), dtype=np.float64)

    return qr_reduce
