"""Device sparse matrix in padded ELL form + SpMV.

TPU-native replacement for PETSc Mat/MatMult (reference: L0 of the layer map,
SURVEY.md §1).  The structure is static (a host ``SparsityPattern``); the
values live on device as a rectangular ``[n_rows, K]`` array so a SpMV is a
gather + row reduction -- fully vectorised, static-shaped, fusable by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .pattern import SparsityPattern


@jax.tree_util.register_pytree_node_class
class ELL:
    """Sparse matrix: static pattern + device values.

    ``data``/``cols`` are ``[n_rows, K]``; padded slots have ``data == 0`` and
    ``cols == 0`` so they contribute nothing to products.
    """

    def __init__(self, pattern: SparsityPattern, data, cols):
        self.pattern = pattern
        self.data = data
        self.cols = cols

    # ~~~~~~~~~~ pytree protocol ~~~~~~~~~~
    def tree_flatten(self):
        return (self.data, self.cols), self.pattern

    @classmethod
    def tree_unflatten(cls, pattern, leaves):
        data, cols = leaves
        return cls(pattern, data, cols)

    # ~~~~~~~~~~ properties ~~~~~~~~~~
    @property
    def shape(self):
        return self.pattern.shape

    @property
    def nnz(self):
        return self.pattern.nnz

    @property
    def dtype(self):
        return self.data.dtype

    # ~~~~~~~~~~ constructors ~~~~~~~~~~
    @staticmethod
    def from_scipy(mat, dtype=None, pattern: SparsityPattern | None = None) -> "ELL":
        """Build from a scipy sparse matrix.

        If ``pattern`` is given, the matrix values are laid out against that
        existing pattern (they must share structure) -- this is the reuse
        path where only numbers changed.
        """
        csr = sp.csr_matrix(mat)
        csr.sort_indices()
        if pattern is None:
            pattern = SparsityPattern(csr.indptr, csr.indices, csr.shape)
        dtype = dtype or csr.data.dtype
        flat = np.zeros(pattern.shape[0] * pattern.K, dtype=dtype)
        flat[pattern.slot_of_pos] = csr.data.astype(dtype)
        data = jnp.asarray(flat.reshape(pattern.shape[0], pattern.K))
        cols = jnp.asarray(pattern.ell_cols)
        return ELL(pattern, data, cols)

    @staticmethod
    def from_flat(pattern: SparsityPattern, flat_csr_data) -> "ELL":
        """Build from device values in CSR entry order (jit-friendly)."""
        n, K = pattern.shape[0], pattern.K
        dense = jnp.zeros((n * K,), dtype=flat_csr_data.dtype)
        dense = dense.at[jnp.asarray(pattern.slot_of_pos)].set(flat_csr_data)
        return ELL(pattern, dense.reshape(n, K), jnp.asarray(pattern.ell_cols))

    def to_scipy(self) -> sp.csr_matrix:
        flat = np.asarray(self.data).reshape(-1)
        vals = flat[self.pattern.slot_of_pos]
        return sp.csr_matrix(
            (vals, self.pattern.indices.astype(np.int64), self.pattern.indptr),
            shape=self.pattern.shape,
        )

    def flat_values(self):
        """Device values in CSR entry order ``[nnz]``."""
        return self.data.reshape(-1)[jnp.asarray(self.pattern.slot_of_pos)]

    def with_data(self, data) -> "ELL":
        return ELL(self.pattern, data, self.cols)

    # ~~~~~~~~~~ compute ~~~~~~~~~~
    def matvec(self, x):
        """y = A @ x.  Gather + row-sum; padded slots are exact zeros."""
        gathered = jnp.take(x, self.cols, axis=0)
        return jnp.sum(self.data * gathered, axis=1)

    def matvec_t(self, x):
        """y = A.T @ x via scatter-add (used rarely; prefer assembled T)."""
        contrib = (self.data * x[:, None]).reshape(-1)
        return jnp.zeros(self.shape[1], dtype=self.data.dtype).at[
            self.cols.reshape(-1)
        ].add(contrib)

    def diagonal(self):
        """Diagonal as a device vector (0 where absent)."""
        mask = self.cols == jnp.arange(self.shape[0], dtype=self.cols.dtype)[:, None]
        # padded slots have cols==0; mask row 0 pad correctly because its
        # data is 0 anyway
        return jnp.sum(jnp.where(mask, self.data, 0), axis=1)

    def __matmul__(self, x):
        return self.matvec(x)


@jax.tree_util.register_pytree_node_class
class TELL:
    """K-transposed padded ELL: ``data``/``cols`` are ``[K, n_rows]``.

    THE device-resident layout for solve-phase operators.  TPU arrays
    tile as (8 sublanes, 128 lanes) on the last two dims, so the plain
    ``[n, K]`` ELL pads its K-minor dim to 128 lanes -- measured 8-16x
    memory expansion (an [1.8M, 11] f32 block costs 890 MB instead of
    76 MB) and the gather streams the padding too.  Transposed, n is the
    lane dim: no padding, and the SpMV is K full-length gathers + FMAs.
    Pattern/CSR addressing is unchanged (``slot_of_pos_t`` maps entry
    positions into the transposed flat array).
    """

    def __init__(self, pattern: SparsityPattern, data, cols):
        self.pattern = pattern
        self.data = data
        self.cols = cols

    def tree_flatten(self):
        return (self.data, self.cols), self.pattern

    @classmethod
    def tree_unflatten(cls, pattern, leaves):
        data, cols = leaves
        return cls(pattern, data, cols)

    @property
    def shape(self):
        return self.pattern.shape

    @property
    def nnz(self):
        return self.pattern.nnz

    @property
    def dtype(self):
        return self.data.dtype

    @staticmethod
    def _slot_t(pattern) -> np.ndarray:
        """Transposed flat position of each CSR entry: offs*n + rows."""
        sop = pattern.slot_of_pos
        K = pattern.K
        rows = sop // K
        offs = sop % K
        return offs * pattern.shape[0] + rows

    @staticmethod
    def from_scipy(mat, dtype=None,
                   pattern: SparsityPattern | None = None) -> "TELL":
        csr = sp.csr_matrix(mat)
        csr.sort_indices()
        if pattern is None:
            pattern = SparsityPattern(csr.indptr, csr.indices, csr.shape)
        dtype = dtype or csr.data.dtype
        n, K = pattern.shape[0], pattern.K
        slot_t = TELL._slot_t(pattern)
        flat = np.zeros(K * n, dtype=dtype)
        flat[slot_t] = csr.data.astype(dtype)
        cols = np.zeros(K * n, dtype=np.int32)
        cols[slot_t] = pattern.indices.astype(np.int32)
        return TELL(pattern, jnp.asarray(flat.reshape(K, n)),
                    jnp.asarray(cols.reshape(K, n)))

    @staticmethod
    def from_flat(pattern: SparsityPattern, flat_csr_data) -> "TELL":
        """Build from device values in CSR entry order (jit-friendly)."""
        n, K = pattern.shape[0], pattern.K
        dense = jnp.zeros((K * n,), dtype=flat_csr_data.dtype)
        dense = dense.at[jnp.asarray(TELL._slot_t(pattern))].set(
            flat_csr_data)
        cols = np.zeros(K * n, dtype=np.int32)
        cols[TELL._slot_t(pattern)] = pattern.indices.astype(np.int32)
        return TELL(pattern, dense.reshape(K, n),
                    jnp.asarray(cols.reshape(K, n)))

    def to_scipy(self) -> sp.csr_matrix:
        flat = np.asarray(self.data).reshape(-1)
        vals = flat[TELL._slot_t(self.pattern)]
        return sp.csr_matrix(
            (vals, self.pattern.indices.astype(np.int64),
             self.pattern.indptr), shape=self.pattern.shape)

    def flat_values(self):
        """Device values in CSR entry order ``[nnz]``."""
        return self.data.reshape(-1)[jnp.asarray(TELL._slot_t(self.pattern))]

    def with_data(self, data) -> "TELL":
        return TELL(self.pattern, data, self.cols)

    def to_ell(self) -> "ELL":
        """[n, K]-layout view (device transpose; one-time conversions
        like the HaloELL lift)."""
        return ELL(self.pattern, self.data.T, self.cols.T)

    def matvec(self, x):
        """y = A @ x: K full-length gathers + FMAs, lane dim = n."""
        y = None
        for k in range(self.data.shape[0]):
            term = self.data[k] * jnp.take(x, self.cols[k], axis=0)
            y = term if y is None else y + term
        return y

    def diagonal(self):
        idx = jnp.arange(self.shape[0], dtype=self.cols.dtype)
        acc = None
        for k in range(self.data.shape[0]):
            t = jnp.where(self.cols[k] == idx, self.data[k], 0)
            acc = t if acc is None else acc + t
        return acc

    def __matmul__(self, x):
        return self.matvec(x)


def spmv(A: ELL, x):
    return A.matvec(x)
