"""Distributed tall-skinny QR over the row mesh.

Reference: src/TSQR.F90 -- the reference reduces per-rank R factors with a
custom non-commutative MPI op (a log-depth reduction tree,
src/TSQR.F90:40-63) so the power-basis GMRES coefficients cost a single
reduction.  The mesh-native equivalent: each shard QRs its local rows,
then the m x m R factors combine through a LOG-DEPTH ppermute butterfly
-- at round d, shard i absorbs shard i^d's factor with a [2m, m] QR --
so work and memory per shard stay O(m^2 log P) instead of the O(P m^2)
of an all-gather restack.  The pairing order is fixed by the shard
indices, so the combine is deterministic and reproducible like the
reference's deliberately non-commutative op.  Usable as the
``qr_reduce`` hook of ``coefficients_power``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import ROW_AXIS


def tsqr_r(K, mesh: Mesh):
    """R factor of the QR of row-sharded K [n, m]: local QR + log-depth
    butterfly combine (one jitted shard_map program; each round moves one
    m x m factor per shard over ICI)."""
    n_dev = mesh.devices.size
    m = K.shape[1]

    def local_qr(block):
        # block: [n/n_dev, m]
        r = jnp.linalg.qr(block, mode="r")
        # pad to [m, m] in case the local block is skinny-deficient
        return r[:m]

    pow2 = n_dev & (n_dev - 1) == 0

    def body(block):
        r = local_qr(block)
        if not pow2:
            # non-power-of-two meshes: index-ordered all-gather restack.
            # r is [min(local_rows, m), m] -- fewer than m rows when the
            # local block is short, so stack at r's ACTUAL row count
            rs = jax.lax.all_gather(r, ROW_AXIS)   # [n_dev, r_rows, m]
            return jnp.linalg.qr(
                rs.reshape(n_dev * r.shape[0], m), mode="r")
        # butterfly: after round d every shard holds the R of its
        # 2^(d+1)-wide group, ALWAYS stacking the lower-index factor on
        # top (deterministic, index-ordered like the all-gather combine)
        d = 1
        while d < n_dev:
            perm = [(i, i ^ d) for i in range(n_dev)]
            r_other = jax.lax.ppermute(r, ROW_AXIS, perm)
            idx = jax.lax.axis_index(ROW_AXIS)
            lower_first = (idx & d) == 0
            top = jnp.where(lower_first, r, r_other)
            bot = jnp.where(lower_first, r_other, r)
            r = jnp.linalg.qr(jnp.concatenate([top, bot]), mode="r")[:m]
            d *= 2
        return r

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
