"""Near-nullspace constraints on Z / W.

Reference: src/Constrain_Z_or_W.F90.  ``smooth_near_nullspace`` refines the
candidate vectors with 15 damped-Jacobi Richardson sweeps on Ax=0 (transpose
solves for left vectors); ``constrain_grid_transfer`` applies the one-step
orthogonal-projector correction (Olson 2011 eq 3.2 / PyAMG filter_operator)
so W interpolates the right vectors (W B_c = B_f) and Z^T restricts the left
ones (Z^T B_c = B_f after transposing).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..params import tolerances

SMOOTH_ITS = 15


def _pinv_abs_batched(G: np.ndarray, tol: float) -> np.ndarray:
    """Batched pseudo-inverse with the reference's ABSOLUTE singular-value
    cutoff (reference: src/PETSc_Helper.F90:1583 pseudo_inv +
    PFLARE_TOL_SIGMA_DROP): sigma <= tol contributes nothing -- numpy's
    relative rcond would instead invert uniformly-tiny Gram matrices and
    blow the correction up on decayed nullspace candidates."""
    U, S, Vt = np.linalg.svd(G)
    Sinv = np.where(np.abs(S) > tol, 1.0 / np.where(S != 0, S, 1.0), 0.0)
    return np.einsum("rij,rj,rkj->rik", Vt.transpose(0, 2, 1), Sinv, U)


def _richardson_smooth(A: sp.csr_matrix, v: np.ndarray,
                       transpose: bool) -> np.ndarray:
    """Self-scaled Richardson + Jacobi on Ax=0 from initial guess v
    (reference: src/Constrain_Z_or_W.F90:118-218)."""
    M = A.T.tocsr() if transpose else A
    d = M.diagonal()
    dinv = np.where(d != 0, 1.0 / d, 0.0)
    x = v.copy()
    for _ in range(SMOOTH_ITS):
        r = -(M @ x)
        z = dinv * r
        Az = M @ z
        denom = float(Az @ Az)
        if denom == 0.0:
            break
        alpha = float(Az @ r) / denom
        x = x + alpha * z
    return x


def smooth_near_nullspace(A, left_nulls, right_nulls):
    """In-place smoothing of the candidate near-nullspace vectors."""
    A = sp.csr_matrix(A)
    if left_nulls is not None:
        for i, v in enumerate(left_nulls):
            left_nulls[i] = _richardson_smooth(A, v, transpose=True)
    if right_nulls is not None:
        for i, v in enumerate(right_nulls):
            right_nulls[i] = _richardson_smooth(A, v, transpose=False)


def constrain_grid_transfer(z_or_w: sp.csr_matrix, nulls_row, nulls_col,
                            is_z: bool) -> sp.csr_matrix:
    """Row-wise least-squares correction keeping the sparsity fixed:
      M_i <- M_i - (M_i B_J - b_i) pinv(B_J^T B_J) B_J^T
    over each row's support J.  For Z the constraint acts on columns, so we
    transpose first (reference: src/Constrain_Z_or_W.F90:223-330).

    nulls_row: target values on the row space (B_f for W, B_f for Z^T);
    nulls_col: values on the column space (B_c).
    """
    M = sp.csr_matrix(z_or_w)
    if is_z:
        M = sp.csr_matrix(M.T)
        nulls_row, nulls_col = nulls_row, nulls_col  # caller passes f/c split
    M.sort_indices()
    B_col = np.stack(nulls_col, axis=1)  # [n_cols, k]
    B_row = np.stack(nulls_row, axis=1)  # [n_rows, k]

    indptr, indices, data = M.indptr, M.indices, M.data.copy()
    # batched by support size: rows with equal |J| correct together with
    # one batched pseudo-inverse (the same bucketing trick as the SAI
    # solves, inverse/sai.py) -- no per-row Python loop
    row_len = np.diff(indptr)
    for m in np.unique(row_len):
        if m == 0:
            continue
        rows = np.nonzero(row_len == m)[0]
        idx = indptr[rows][:, None] + np.arange(m)[None, :]
        J = indices[idx]                        # [R, m]
        Bj = B_col[J]                           # [R, m, k]
        G = np.einsum("rmk,rml->rkl", Bj, Bj)   # [R, k, k]
        vals = data[idx]                        # [R, m]
        diff = np.einsum("rm,rmk->rk", vals, Bj) - B_row[rows]
        piv = _pinv_abs_batched(G, tolerances(data.dtype).sigma_drop)
        corr = np.einsum("rkl,rl->rk", piv, diff)
        data[idx] = vals - np.einsum("rmk,rk->rm", Bj, corr)
    out = sp.csr_matrix((data, indices.copy(), indptr.copy()), shape=M.shape)
    if is_z:
        out = sp.csr_matrix(out.T)
    out.sort_indices()
    return out
