"""AIR operator construction: W, Z, P, R, RAP.

Host "symbolic+numeric" setup phase (reference: src/AIR_Operators_Setup.F90,
src/Grid_Transfer.F90, src/Grid_Transfer_Improve.F90).  All products run in
scipy float64 on first setup; the resulting patterns become the static
structure for jitted numeric re-setup (reuse).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..params import ZType
from ..sparse.ops import (
    one_point_strongest,
    remove_from_sparse_match,
    remove_small_from_sparse,
)
from ..inverse.sai import sai_z
from ..sparse.ops import symbolic_matmat


def _matmat(A, B) -> sp.csr_matrix:
    """Host SpGEMM for the RAP triple products.

    scipy's csr_matmat (SMMP dense-accumulator) measures ~1.5-2x faster
    than the ctypes kernel in native/kernels.cpp on these shapes, so it is
    the default; the native kernel remains for the debug-compare lever
    (tests/test_native.py)."""
    C = sp.csr_matrix(A @ B)
    C.sort_indices()
    return C


def ap_product(A: sp.csr_matrix, P: sp.csr_matrix) -> sp.csr_matrix:
    """AP = A @ P, specialised when every row of P holds at most one entry
    (one-point classical prolongator, the default): a single O(nnz(A))
    relabel-and-merge native sweep replaces the general SpGEMM, whose
    dense-accumulator stamping over n_c columns dominated host-setup RAP
    time (the MatMatMult this specialises:
    src/AIR_Operators_Setup.F90:1006-1033)."""
    if np.diff(P.indptr).max(initial=0) <= 1:
        from ..native import ap_onepoint_native

        AP = ap_onepoint_native(A, P)
        if AP is not None:
            return AP
    return _matmat(A, P)


# test hook: when set to a list, mesh_matmat_drop appends
# (name, inputs_row_sharded) per product so tests can assert the
# distributed setup never multiplies unsharded operators
MESH_PRODUCT_LOG: list | None = None

_WARNED_F32 = False


def mesh_matmat_drop(Amat, Bmat, tol: float, lump: bool, mesh,
                     name: str = "") -> sp.csr_matrix:
    """C = drop(A @ B) as a row-SHARDED device product over the mesh.

    The distributed-SpGEMM analogue of the reference's MPI
    MatMatMult/MatPtAP with communicated halo rows (reference:
    src/AIR_Operators_Setup.F90:993-1033): both operands upload row-
    sharded (rows padded to equal blocks, the 'simple' partition), the
    expand -> sort -> segsum -> fused-drop pipeline compiles SPMD under
    GSPMD -- the B-row gather at A's columns becomes the neighbour
    halo exchange -- and only the compacted result returns to the host.
    Numerically identical to the host product + relative drop up to two
    caveats: (a) tol 0 drops EXACT-cancellation zeros that scipy's
    product keeps in the pattern (visible only through stored reuse-plan
    patterns); (b) without jax x64 the product values round through
    f32 -- a one-line notice is printed, since the serial host setup is
    f64 (on real multi-chip TPU deployments f64 is unavailable anyway;
    enable x64 for bitwise-f64 distributed setup on CPU meshes)."""
    import sys

    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import row_sharding
    from ..sparse.dell import DELL, PADCOL, spgemm_drop_dell

    n_dev = mesh.devices.size
    sh = row_sharding(mesh)
    if jax.config.jax_enable_x64:
        dtype = jnp.float64
    else:
        dtype = jnp.float32
        global _WARNED_F32
        if not _WARNED_F32:
            _WARNED_F32 = True
            print("# pflare_tpu: distributed setup products run in f32 "
                  "(jax x64 disabled); drop decisions are f32-rounded",
                  file=sys.stderr)

    def _up(M):
        d = DELL.from_scipy(M, dtype=dtype)
        p = (-d.data.shape[0]) % n_dev
        data, cols = d.data, d.cols
        if p:
            data = jnp.pad(data, ((0, p), (0, 0)))
            cols = jnp.pad(cols, ((0, p), (0, 0)), constant_values=PADCOL)
        return DELL(jax.device_put(data, sh), jax.device_put(cols, sh),
                    d.n_cols)

    Ad, Bd = _up(Amat), _up(Bmat)
    if MESH_PRODUCT_LOG is not None:
        from ..sparse.dell import _row_sharded

        MESH_PRODUCT_LOG.append(
            (name, _row_sharded(Ad.data) and _row_sharded(Bd.data)))
    C = spgemm_drop_dell(Ad, Bd, float(tol), relative=True, lump=lump)
    out = C.to_scipy()[: Amat.shape[0]].astype(np.float64)
    out.sort_indices()
    return sp.csr_matrix(out)


def extract_submatrices(A: sp.csr_matrix, fine, coarse, need_acc=False):
    """A_ff, A_fc, A_cf (and A_cc) by CF masks (reference:
    src/AIR_Operators_Setup.F90:196-227).  One streaming native pass
    (native split_cf) when available; scipy double-slicing otherwise."""
    from ..native import split_cf_native

    out = split_cf_native(A, fine, coarse, need_acc)
    if out is not None:
        return out
    Af = A[fine]
    Ac = A[coarse]
    A_ff = sp.csr_matrix(Af[:, fine])
    A_fc = sp.csr_matrix(Af[:, coarse])
    A_cf = sp.csr_matrix(Ac[:, fine])
    A_cc = sp.csr_matrix(Ac[:, coarse]) if need_acc else None
    for M in (A_ff, A_fc, A_cf) + ((A_cc,) if need_acc else ()):
        M.sort_indices()
    return A_ff, A_fc, A_cf, A_cc


def strong_r_drop(A: sp.csr_matrix, fine, coarse, strong_r_threshold: float,
                  need_afc: bool):
    """Strong-R dropping of A then re-extraction of the dropped submatrices
    (reference: src/AIR_Operators_Setup.F90:56-287).  Returns
    (A_ff_drop, A_cf_drop, A_fc_drop)."""
    if strong_r_threshold == 0.0:
        return None, None, None
    A_drop = remove_small_from_sparse(A, strong_r_threshold,
                                      relative_max_row_tol=1,
                                      drop_diagonal=0)
    from ..native import split_cf_native

    out = split_cf_native(A_drop, fine, coarse, False)
    if out is not None:
        A_ff_drop, A_fc_drop, A_cf_drop, _ = out
        return A_ff_drop, A_cf_drop, (A_fc_drop if need_afc else None)
    Ad_f = A_drop[fine]
    Ad_c = A_drop[coarse]
    A_ff_drop = sp.csr_matrix(Ad_f[:, fine])
    A_cf_drop = sp.csr_matrix(Ad_c[:, fine])
    A_fc_drop = sp.csr_matrix(Ad_f[:, coarse]) if need_afc else None
    return A_ff_drop, A_cf_drop, A_fc_drop


def compute_z_airg(A_cf_drop: sp.csr_matrix, inv_Aff: sp.csr_matrix):
    """AIRG: Z = -A_cf_drop @ inv(A_ff_drop) (reference:
    src/AIR_Operators_Setup.F90:784-795)."""
    Z = _matmat(A_cf_drop, inv_Aff)
    Z.data *= -1.0
    return Z


def lair_sparsity(A_ff_drop, A_cf_drop, distance: int) -> sp.csr_matrix:
    """Distance-d lAIR sparsity A_cf_drop @ A_ff_drop^(d-1) (symbolic;
    reference: src/AIR_Operators_Setup.F90:700-782)."""
    if distance == 1:
        return A_cf_drop
    P = A_ff_drop
    for _ in range(3, distance + 1):
        P = symbolic_matmat(A_ff_drop, P)
    return symbolic_matmat(A_cf_drop, P)


def compute_z_lair(A_ff, A_cf, A_ff_drop, A_cf_drop, distance: int,
                   incomplete: bool, sparsity=None):
    """lAIR / SAI-lAIR: per-row dense solves on the distance-d sparsity
    (reference: src/AIR_Operators_Setup.F90:700-782).  ``sparsity`` may be
    supplied from the reuse slots to skip the symbolic products."""
    if sparsity is None:
        sparsity = lair_sparsity(A_ff_drop, A_cf_drop, distance)
    # solve against the UN-dropped matrices; sparsity came from the dropped
    return sai_z(A_ff, A_cf, sparsity, incomplete=incomplete)


def compute_w_ideal(inv_Aff: sp.csr_matrix, A_fc_drop: sp.csr_matrix):
    """Ideal prolongator W = -inv(A_ff) @ A_fc (reference:
    src/AIR_Operators_Setup.F90:544-555)."""
    W = sp.csr_matrix(inv_Aff @ A_fc_drop)
    W.data *= -1.0
    W.sort_indices()
    return W


def improve_transfer(M: sp.csr_matrix, A_ff: sp.csr_matrix,
                     A_other: sp.csr_matrix, inv_diag: np.ndarray,
                     its: int, is_z: bool) -> sp.csr_matrix:
    """Fixed-sparsity Richardson improvement of W or Z (reference:
    src/Grid_Transfer_Improve.F90:25-376):
      W <- W - D (A_ff W + A_fc) |_S(W)
      Z <- Z - (Z A_ff + A_cf) D |_S(Z)
    with D = diag(inv(A_ff)) -- the diagonal of the APPROXIMATE INVERSE
    (the reference always pulls diag(A_ff_inv), :60-66), scaling BOTH
    residual terms.
    """
    D = sp.diags(np.asarray(inv_diag).astype(M.data.dtype, copy=False))
    for _ in range(its):
        if is_z:
            resid = (M @ A_ff + A_other) @ D
        else:
            resid = D @ (A_ff @ M + A_other)
        M = remove_from_sparse_match(sp.csr_matrix(M - resid), M)
    return M


def assemble_p(W: sp.csr_matrix, fine, coarse, n: int) -> sp.csr_matrix:
    """P = [W; I] scattered to the full ordering: P[fine, :] = W,
    P[coarse, j] = 1 (reference: src/Grid_Transfer.F90:224)."""
    n_c = len(coarse)
    rows = np.concatenate([fine[_rows_of(W)], coarse])
    cols = np.concatenate([W.indices, np.arange(n_c)])
    vals = np.concatenate([W.data, np.ones(n_c, dtype=W.data.dtype)])
    P = sp.csr_matrix((vals, (rows, cols)), shape=(n, n_c))
    P.sort_indices()
    return P


def assemble_r(Z: sp.csr_matrix, fine, coarse, n: int) -> sp.csr_matrix:
    """R = [Z I] in the full column ordering: R[:, fine] = Z,
    R[i, coarse[i]] = 1 (reference: src/Grid_Transfer.F90:465)."""
    n_c = len(coarse)
    rows = np.concatenate([_rows_of(Z), np.arange(n_c)])
    cols = np.concatenate([fine[Z.indices], coarse])
    vals = np.concatenate([Z.data, np.ones(n_c, dtype=Z.data.dtype)])
    R = sp.csr_matrix((vals, (rows, cols)), shape=(n_c, n))
    R.sort_indices()
    return R


def compute_coarse_matrix(A, R, P, a_drop: float, a_lump: bool,
                          symmetric: bool = False, need_rap: bool = True):
    """RAP via two SpGEMMs (or PtAP) + relative drop/lump (reference:
    src/AIR_Operators_Setup.F90:960-1082).

    When the caller doesn't need the un-dropped product (``need_rap=False``,
    i.e. no reuse plans), the second product and the drop fuse into one
    native sweep that never materialises RAP; the returned RAP is None.
    Returns (coarse, RAP, AP): AP is handed back so plan-building callers
    don't recompute the most expensive host SpGEMM of the level."""
    AP = ap_product(A, P)
    if symmetric:
        RAP = _matmat(sp.csr_matrix(P.T).tocsr(), AP)
    else:
        if not need_rap:
            from ..native import spgemm_drop_native

            fused = spgemm_drop_native(R, AP, a_drop, relative=1,
                                       lump=a_lump)
            if fused is not None:
                return fused, None, AP
        RAP = _matmat(R, AP)
    # tol 0 still drops explicit zeros (reference drops zeros always)
    coarse = remove_small_from_sparse(RAP, a_drop,
                                      relative_max_row_tol=1,
                                      lump=a_lump)
    return coarse, RAP, AP


def _rows_of(M: sp.csr_matrix):
    return np.repeat(np.arange(M.shape[0], dtype=np.int64), np.diff(M.indptr))
