"""Explicit neighbour halo-exchange SpMV over the row mesh.

The reference's SpMV communication is a PetscSF halo exchange: each rank
scatters the x entries its off-diagonal block needs to/from neighbours
(reference: SURVEY.md §2.4, src/PMISR_Module.F90:174-180 Ad/Ao split).
The default path here lets GSPMD insert the collectives; this module is
the hand-scheduled TPU-native equivalent for BANDED row partitions (every
structured level and most RCM-ordered unstructured ones): each shard's
column support fits inside its own block plus one neighbour block on each
side, so the exchange is two ``ppermute`` shifts over ICI -- point-to-point
neighbour traffic like the reference's SF, instead of an all-gather.

    y_local = A_local @ concat(recv_left, x_local, recv_right)

Column indices are rewritten to the 3w-wide extended window at plan time
(the analogue of PETSc's global-to-local colmap for the off-diag block).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import ROW_AXIS, make_mesh, row_sharding


@jax.tree_util.register_pytree_node_class
class HaloELL:
    """jit-composable banded halo-exchange SpMV (pytree).

    The production form of HaloSpMV: data/lcols are leaves (shardable,
    passed as jit arguments), the mesh/widths are static aux, and
    ``matvec`` opens a ``shard_map`` region at trace time -- so it composes
    inside the jitted Krylov loop (PCAIR.solve_device) exactly where the
    reference calls MatMult with its PetscSF halo exchange."""

    def __init__(self, data, lcols, mesh, n: int, w: int):
        self.data = data
        self.lcols = lcols
        self.mesh = mesh
        self.n = int(n)
        self.w = int(w)

    def tree_flatten(self):
        return (self.data, self.lcols), (self.mesh, self.n, self.w)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        data, lcols = leaves
        mesh, n, w = aux
        return cls(data, lcols, mesh, n, w)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.data.dtype

    @staticmethod
    def from_scipy(A, mesh, dtype=None) -> "HaloELL":
        """Build from a host CSR; raises ValueError when the partition is
        not banded (caller falls back to the GSPMD ELL path)."""
        A = sp.csr_matrix(A)
        A.sort_indices()
        S = mesh.devices.size
        n = A.shape[0]
        w = -(-n // S)
        n_pad = S * w
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
        shard_of_row = rows // w
        shard_of_col = A.indices // w
        if np.any(np.abs(shard_of_row - shard_of_col) > 1):
            raise ValueError("matrix is not banded for this partition")
        K = max(1, int(np.diff(A.indptr).max()))
        data = np.zeros((n_pad, K), dtype=np.dtype(dtype) if dtype else
                        A.data.dtype)
        lcols = np.zeros((n_pad, K), dtype=np.int32)
        counts = np.diff(A.indptr)
        slot = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
        ext_base = (shard_of_row * w) - w
        lcols[rows, slot] = (A.indices - ext_base).astype(np.int32)
        data[rows, slot] = A.data
        sh = row_sharding(mesh)
        return HaloELL(jax.device_put(jnp.asarray(data), sh),
                       jax.device_put(jnp.asarray(lcols), sh),
                       mesh, n, w)

    @staticmethod
    def from_ell(op, mesh, n_pad: int | None = None) -> "HaloELL":
        """Lift a device ELL operator onto the banded halo-exchange path
        WITHOUT a d2h of its values: the band check and the local-window
        column rewrite run on the host pattern, and the device value
        array is resharded in place.  ``n_pad`` is the (padded) row space
        the caller's level uses -- S equal blocks of width n_pad/S.
        Raises ValueError when the partition is not banded (caller falls
        back to the GSPMD row-sharded path).  This is how shard_hierarchy
        gives COARSE levels neighbour-only collectives after the
        graph-aware repartition (reference: the repartitioned coarse
        grids of src/Repartition.F90)."""
        pat = op.pattern
        n = pat.shape[0]
        S = mesh.devices.size
        if n_pad is None:
            n_pad = S * (-(-n // S))
        if n_pad % S != 0:
            raise ValueError("n_pad must divide the mesh")
        w = n_pad // S
        if w == 0:
            raise ValueError("empty shards")
        row_len = np.diff(pat.indptr)
        rows = np.repeat(np.arange(n, dtype=np.int64), row_len)
        sr = rows // w
        sc = pat.indices // w
        if pat.nnz and np.any(np.abs(sr - sc) > 1):
            raise ValueError("matrix is not banded for this partition")
        K = pat.K
        # pad slots point at the row's own window start (their data is 0)
        lcols = np.full((n_pad, K), w, dtype=np.int32)
        offs = (np.arange(pat.nnz, dtype=np.int64)
                - np.repeat(pat.indptr[:-1], row_len))
        ext_base = sr * w - w
        lcols[rows, offs] = (pat.indices - ext_base).astype(np.int32)
        data = op.data
        if data.shape[0] < n_pad:
            data = jnp.pad(data, ((0, n_pad - data.shape[0]), (0, 0)))
        sh = row_sharding(mesh)
        return HaloELL(jax.device_put(data, sh),
                       jax.device_put(jnp.asarray(lcols), sh),
                       mesh, n, w)

    def matvec(self, x):
        """y = A @ x on padded [S*w] vectors (trace-friendly: call inside
        jit with x sharded P(rows))."""
        mesh = self.mesh
        S = mesh.devices.size
        fwd = [(i, (i + 1) % S) for i in range(S)]
        bwd = [(i, (i - 1) % S) for i in range(S)]

        def body(data_s, lcols_s, x_s):
            from_left = jax.lax.ppermute(x_s, ROW_AXIS, fwd)
            from_right = jax.lax.ppermute(x_s, ROW_AXIS, bwd)
            ext = jnp.concatenate([from_left, x_s, from_right])
            return jnp.sum(data_s * ext[lcols_s], axis=1)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS, None), P(ROW_AXIS)),
            out_specs=P(ROW_AXIS),
            check_vma=False,
        )(self.data, self.lcols, x)

    def __matmul__(self, x):
        return self.matvec(x)


class HaloSpMV:
    """Banded-partition SpMV with explicit neighbour exchange.

    Built host-side from a scipy CSR matrix; ``matvec`` runs as one jitted
    shard_map program over the mesh's row axis.
    """

    def __init__(self, A, mesh=None, n_shards: int | None = None):
        A = sp.csr_matrix(A)
        A.sort_indices()
        if mesh is None:
            mesh = make_mesh(n_shards)
        self.mesh = mesh
        S = mesh.devices.size
        n = A.shape[0]
        w = -(-n // S)                       # shard width (ceil)
        n_pad = S * w
        self.n = n
        self.w = w

        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
        shard_of_row = rows // w
        shard_of_col = A.indices // w
        if np.any(np.abs(shard_of_row - shard_of_col) > 1):
            raise ValueError(
                "matrix is not banded for this partition: a row needs "
                "columns beyond the neighbouring shards (use the GSPMD "
                "path or fewer shards)")

        # per-row ELL with column indices local to the extended window
        # [s*w - w, s*w + 2w) of the owning shard
        K = max(1, int(np.diff(A.indptr).max()))
        data = np.zeros((n_pad, K))
        lcols = np.zeros((n_pad, K), dtype=np.int32)
        counts = np.diff(A.indptr)
        slot = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
        ext_base = (shard_of_row * w) - w
        lcols[rows, slot] = (A.indices - ext_base).astype(np.int32)
        data[rows, slot] = A.data

        sh = row_sharding(mesh)
        self.data = jax.device_put(jnp.asarray(data), sh)
        self.lcols = jax.device_put(jnp.asarray(lcols), sh)

        S_axis = ROW_AXIS
        fwd = [(i, (i + 1) % S) for i in range(S)]
        bwd = [(i, (i - 1) % S) for i in range(S)]

        def body(data_s, lcols_s, x_s):
            # neighbour slabs over ICI (wraparound slabs are never
            # referenced by construction: shard 0 has no columns < 0)
            from_left = jax.lax.ppermute(x_s, S_axis, fwd)
            from_right = jax.lax.ppermute(x_s, S_axis, bwd)
            ext = jnp.concatenate([from_left, x_s, from_right])
            return jnp.sum(data_s * ext[lcols_s], axis=1)

        self._fn = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(S_axis, None), P(S_axis, None), P(S_axis)),
            out_specs=P(S_axis),
            check_vma=False,
        ))

    def matvec(self, x):
        """y = A @ x.  ``x`` may be unpadded [n]; returns [n]."""
        x = jnp.asarray(x)
        n_pad = self.data.shape[0]
        if x.shape[0] != n_pad:
            x = jnp.pad(x, (0, n_pad - self.n))
        x = jax.device_put(x, row_sharding(self.mesh))
        y = self._fn(self.data, self.lcols, x)
        return y[: self.n]

    def __matmul__(self, x):
        return self.matvec(x)
