"""Static sparsity patterns.

A ``SparsityPattern`` is the host-side, hashable description of a sparse
matrix's structure.  It is the TPU-native replacement for the reference's
dynamically-assembled PETSc AIJ structure: on TPU every shape must be static
under ``jit``, so the pattern (computed once on host during setup, or reused
across re-setups) is the compile-time "symbolic" half of every sparse object,
and the numeric half is a flat device array indexed against it.

This realises the reference's setup-reuse design (reference:
docs/reuse.md:11, src/PETSc_Helper.F90:490): a re-setup with the same pattern
re-runs only jitted numeric code.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


class SparsityPattern:
    """CSR structure + derived padded-ELL layout, hashable by identity.

    The ELL layout pads every row to ``K = max_row_nnz`` entries (TPU wants
    rectangular arrays).  ``ell_cols`` holds column indices with 0 in padded
    slots; padded value slots are 0 so they contribute nothing to a SpMV.
    ``slot_of_pos`` maps CSR entry position -> flat ELL position (row*K+slot),
    letting fixed-sparsity product plans address ELL value arrays directly.
    """

    __slots__ = (
        "shape",
        "nnz",
        "K",
        "indptr",
        "indices",
        "_ell_cols",
        "_slot_of_pos",
        "_csr_bool",
        "_keys",
    )

    def __init__(self, indptr: np.ndarray, indices: np.ndarray, shape):
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.indices = np.asarray(indices, dtype=np.int64)
        self.shape = (int(shape[0]), int(shape[1]))
        self.nnz = int(self.indices.shape[0])
        n_rows = self.shape[0]
        row_len = np.diff(self.indptr) if n_rows > 0 else np.zeros(0)
        self.K = int(row_len.max()) if n_rows > 0 and self.nnz > 0 else 1
        if self.K == 0:
            self.K = 1
        # The ELL layout (ell_cols / slot_of_pos) is built LAZILY: many
        # patterns exist only as plan descriptors and never touch it, and
        # the repeat/arange sweeps were ~20% of a reuse-enabled 512^2
        # setup when built eagerly.
        self._ell_cols = None
        self._slot_of_pos = None
        self._csr_bool = None
        self._keys = None

    def _build_ell(self):
        n_rows = self.shape[0]
        if self.nnz:
            from ..native import csr_to_ell_native

            out = csr_to_ell_native(self.indptr, self.indices, n_rows,
                                    self.K)
            if out is not None:
                self._ell_cols, self._slot_of_pos = out
                return
            row_len = np.diff(self.indptr)
            rows = np.repeat(np.arange(n_rows), row_len)
            offs = np.arange(self.nnz) - np.repeat(self.indptr[:-1], row_len)
            ell_cols = np.zeros((n_rows, self.K), dtype=np.int32)
            ell_cols[rows, offs] = self.indices.astype(np.int32)
            slot_of_pos = rows * self.K + offs
        else:
            ell_cols = np.zeros((n_rows, self.K), dtype=np.int32)
            slot_of_pos = np.zeros(0, dtype=np.int64)
        self._ell_cols = ell_cols
        self._slot_of_pos = slot_of_pos

    @property
    def ell_cols(self):
        if self._ell_cols is None:
            self._build_ell()
        return self._ell_cols

    @property
    def slot_of_pos(self):
        if self._slot_of_pos is None:
            self._build_ell()
        return self._slot_of_pos

    # Hash by identity: two identical patterns built separately will retrace,
    # which is correct (just mildly wasteful) under jit.
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # ~~~~~~~~~~ constructors ~~~~~~~~~~

    @staticmethod
    def from_scipy(mat) -> "SparsityPattern":
        csr = sp.csr_matrix(mat)
        csr.sort_indices()
        return SparsityPattern(csr.indptr, csr.indices, csr.shape)

    # ~~~~~~~~~~ helpers ~~~~~~~~~~

    def csr_bool(self) -> sp.csr_matrix:
        """Boolean scipy CSR with this pattern (cached)."""
        if self._csr_bool is None:
            self._csr_bool = sp.csr_matrix(
                (np.ones(self.nnz, dtype=bool), self.indices, self.indptr),
                shape=self.shape,
            )
        return self._csr_bool

    def keys(self) -> np.ndarray:
        """Global sorted entry keys row*n_cols+col (cached)."""
        if self._keys is None:
            rows = np.repeat(
                np.arange(self.shape[0], dtype=np.int64), np.diff(self.indptr)
            )
            self._keys = rows * np.int64(self.shape[1]) + self.indices
        return self._keys

    def find(self, rows, cols):
        """Positions of (rows, cols) entries; -1 where absent."""
        keys = self.keys()
        q = np.asarray(rows, dtype=np.int64) * np.int64(self.shape[1]) + np.asarray(
            cols, dtype=np.int64
        )
        if self.nnz == 0:
            return np.full(np.shape(q), -1, dtype=np.int64)
        pos = np.searchsorted(keys, q)
        pos = np.minimum(pos, self.nnz - 1)
        good = keys[pos] == q
        return np.where(good, pos, -1)

    def diag_positions(self) -> np.ndarray:
        """CSR position of the diagonal entry per row; -1 if absent."""
        n = min(self.shape)
        idx = np.arange(n, dtype=np.int64)
        out = np.full(self.shape[0], -1, dtype=np.int64)
        out[:n] = self.find(idx, idx)
        return out

    def row_of_pos(self) -> np.ndarray:
        return np.repeat(
            np.arange(self.shape[0], dtype=np.int64), np.diff(self.indptr)
        )
