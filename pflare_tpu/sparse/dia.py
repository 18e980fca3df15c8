"""DIA (offset-diagonal) sparse matrices: the TPU fast path for SpMV.

XLA's TPU gather carries a multi-millisecond fixed cost per op, making
gather-based ELL SpMV latency-bound.  Matrices whose entries live on a small
set of column offsets (structured stencils, and every full-space masked
operator derived from them -- see air/smooth.py) admit the DIA form

    y[i] = sum_k data[k, i] * x[i + offset_k]

which compiles to static padded slices + FMAs: pure VPU work at memory
bandwidth, no gathers at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_pytree_node_class
class DIA:
    """offsets: static tuple of ints; data: [n_offsets, n_rows]."""

    def __init__(self, offsets, data, shape):
        self.offsets = tuple(int(o) for o in offsets)
        self.data = data
        self.shape = (int(shape[0]), int(shape[1]))

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        offsets, shape = aux
        return cls(offsets, leaves[0], shape)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        return int(np.count_nonzero(np.asarray(self.data)))

    @staticmethod
    def from_scipy(M, dtype=None) -> "DIA":
        M = sp.csr_matrix(M)
        M.sort_indices()
        n_rows, n_cols = M.shape
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(M.indptr))
        offs = M.indices - rows
        uniq = np.unique(offs)
        dtype = dtype or M.data.dtype
        data = np.zeros((len(uniq), n_rows), dtype=dtype)
        slot = np.searchsorted(uniq, offs)
        data[slot, rows] = M.data.astype(dtype)
        return DIA(uniq.tolist(), jnp.asarray(data), M.shape)

    @staticmethod
    def viable(M, max_offsets: int = 8, max_fill_ratio: float = 3.0) -> bool:
        """Is the DIA form worth it for this matrix?"""
        M = sp.csr_matrix(M)
        if M.nnz == 0:
            return False
        rows = np.repeat(np.arange(M.shape[0], dtype=np.int64),
                         np.diff(M.indptr))
        n_off = len(np.unique(M.indices - rows))
        return (n_off <= max_offsets
                and n_off * M.shape[0] <= max_fill_ratio * M.nnz)

    def matvec(self, x):
        n_rows, n_cols = self.shape
        offsets = self.offsets
        if not offsets:
            return jnp.zeros(n_rows, dtype=self.data.dtype)
        pad_lo = max(0, -min(offsets))
        pad_hi = max(0, max(offsets) + n_rows - n_cols)
        xp = jnp.pad(x, (pad_lo, pad_hi))
        y = None
        for k, off in enumerate(offsets):
            seg = jax.lax.dynamic_slice(xp, (pad_lo + off,), (n_rows,))
            term = self.data[k] * seg
            y = term if y is None else y + term
        return y

    def __matmul__(self, x):
        return self.matvec(x)

    def astype(self, dtype):
        return DIA(self.offsets, self.data.astype(dtype), self.shape)

    def to_scipy(self) -> sp.csr_matrix:
        n_rows, n_cols = self.shape
        data = np.asarray(self.data)
        rows_l, cols_l, vals_l = [], [], []
        for k, off in enumerate(self.offsets):
            i = np.arange(n_rows)
            j = i + off
            ok = (j >= 0) & (j < n_cols) & (data[k] != 0)
            rows_l.append(i[ok])
            cols_l.append(j[ok])
            vals_l.append(data[k][ok])
        M = sp.csr_matrix(
            (np.concatenate(vals_l), (np.concatenate(rows_l),
                                      np.concatenate(cols_l))),
            shape=self.shape,
        )
        M.sort_indices()
        return M
