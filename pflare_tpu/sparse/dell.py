"""Device-resident sparse setup primitives (DELL: device ELL).

The reference runs its ENTIRE hierarchy setup on the accelerator when the
matrix lives there (reference: src/PETSc_Helperk.kokkos.cxx,
src/Gmres_Polyk.kokkos.cxx, docs/gpus.md) -- dynamic Kokkos kernels
allocating exact-size CSR outputs per product.  XLA has no dynamic output
shapes, so the TPU-native formulation is different:

  * a sparse matrix is a PADDED rectangular pair (data, cols) [n, K] whose
    dead slots hold (0, PADCOL) and whose live columns are sorted -- the
    whole pattern lives ON DEVICE as data;
  * SpGEMM is expand (gather B rows at A's columns) -> row-sort ->
    segmented sum -> fused threshold-drop/lump -> row-sort compaction:
    every step is a static-shaped vectorised op (sorts ride the VPU);
  * the only host involvement is ONE SCALAR read-back per product (the max
    kept row length) used to slice the padded width down before the next
    product, so capacities track the actual fill level by level.

This gives a first-time setup whose numeric work is all on the TPU, the
analogue of the reference's Kokkos setup path -- where the device re-setup
plan (air/device_resetup.py) covers same-pattern REBUILDS, these kernels
cover pattern DISCOVERY.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

PADCOL = np.int32(2**30)


def ceil8(k: int) -> int:
    """Round a padded width up to a multiple of 8: 2-D gather INDEX arrays
    with a last dim that is not a multiple of 8 hit a pathological XLA
    compile path on TPU (measured ~13-48s vs ~1-3s aligned), and every
    DELL cols array ends up as a gather index somewhere (matvec, expand,
    masks).  All DELL widths are therefore multiples of 8 by policy."""
    return max(8, ((int(k) + 7) // 8) * 8)


@jax.tree_util.register_pytree_node_class
class DELL:
    """Padded device sparse matrix: data/cols [n, K], live cols sorted
    ascending per row, dead slots (0.0, PADCOL).  ``n_cols`` is static."""

    def __init__(self, data, cols, n_cols: int):
        self.data = data
        self.cols = cols
        self.n_cols = int(n_cols)

    def tree_flatten(self):
        return (self.data, self.cols), self.n_cols

    @classmethod
    def tree_unflatten(cls, n_cols, leaves):
        data, cols = leaves
        return cls(data, cols, n_cols)

    @property
    def shape(self):
        return (self.data.shape[0], self.n_cols)

    @property
    def K(self):
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    def matvec(self, x):
        j = jnp.minimum(self.cols, self.n_cols - 1)
        return jnp.sum(self.data * jnp.take(x, j, axis=0), axis=1)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        n = self.data.shape[0]
        isd = self.cols == jnp.arange(n, dtype=self.cols.dtype)[:, None]
        return jnp.sum(jnp.where(isd, self.data, 0), axis=1)

    def row_counts(self):
        return jnp.sum(self.cols < PADCOL, axis=1)

    # ~~~~~~~~~~ host converters (tests / interop only) ~~~~~~~~~~
    @staticmethod
    def from_scipy(A, dtype=jnp.float32) -> "DELL":
        A = sp.csr_matrix(A)
        A.sort_indices()
        n = A.shape[0]
        row_len = np.diff(A.indptr)
        K = ceil8(int(row_len.max()) if A.nnz else 1)
        cols = np.full((n, K), PADCOL, dtype=np.int32)
        data = np.zeros((n, K), dtype=np.float64)
        if A.nnz:
            rows = np.repeat(np.arange(n), row_len)
            offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], row_len)
            cols[rows, offs] = A.indices.astype(np.int32)
            data[rows, offs] = A.data
        return DELL(jnp.asarray(data, dtype=dtype), jnp.asarray(cols),
                    A.shape[1])

    def to_scipy(self) -> sp.csr_matrix:
        cols = np.asarray(self.cols)
        data = np.asarray(self.data, dtype=np.float64)
        live = cols < PADCOL
        n = cols.shape[0]
        indptr = np.zeros(n + 1, dtype=np.int64)
        indptr[1:] = np.cumsum(live.sum(axis=1))
        out = sp.csr_matrix(
            (data[live], cols[live].astype(np.int64), indptr),
            shape=(n, self.n_cols))
        out.has_sorted_indices = True
        return out


# ~~~~~~~~~~~~~~~~~~ row-wise building blocks ~~~~~~~~~~~~~~~~~~


def sort_rows(cols, vals):
    """Sort (col, val) pairs ascending by col along the last axis; PADCOL
    pads migrate right."""
    return jax.lax.sort((cols, vals), dimension=-1, num_keys=1)


def segsum_rows(cols, vals):
    """Sorted rows -> duplicate columns merged: the LAST slot of each run
    keeps (col, run total), the rest become dead (PADCOL, 0).

    Formulated as log-depth masked DOUBLING (Hillis-Steele within runs:
    s[i] += s[i-d] while cols[i-d] == cols[i], d = 1,2,4,... -- equal
    sorted cols imply same run, so no segment-flag propagation is
    needed): shifts, compares and adds only.  Both scan formulations
    compile pathologically on TPU -- sort + associative_scan in one
    program measured ~74s at [2304, 512], and the cumsum+cummax+gather
    form ~25s at [16384, 128] (vs ~2s for this one, uniform across
    shapes); every SpGEMM is sort->segsum, so those forms made pattern
    discovery uncompilable within any budget."""
    K = cols.shape[1]
    s = vals
    d = 1
    while d < K:
        same = cols[:, d:] == cols[:, :-d]
        add = jnp.where(same, s[:, :-d], 0.0)
        s = jnp.concatenate([s[:, :d], s[:, d:] + add], axis=1)
        d *= 2
    is_last = jnp.concatenate(
        [cols[:, 1:] != cols[:, :-1],
         jnp.ones_like(cols[:, :1], dtype=bool)], axis=1)
    live = is_last & (cols < PADCOL)
    return jnp.where(live, cols, PADCOL), jnp.where(live, s, 0.0)


def drop_rows(cols, vals, tol, relative: bool, lump: bool, diag_of_row=None):
    """Fused threshold drop on merged rows (reference semantics:
    remove_small_from_sparse / the fused drop in spgemm_drop,
    src/PETSc_Helper.F90:108-412): relative tolerances scale by the row
    max |value|; the diagonal is never dropped (unless exactly 0); dropped
    values optionally lump onto the kept diagonal.  ``diag_of_row``: the
    column index that counts as this row's diagonal (default row index)."""
    live = cols < PADCOL
    if diag_of_row is None:
        diag_of_row = jnp.arange(cols.shape[0], dtype=cols.dtype)
    is_diag = cols == diag_of_row[:, None]
    av = jnp.abs(vals)
    if relative:
        rowmax = jnp.max(jnp.where(live, av, 0.0), axis=1, keepdims=True)
        rt = tol * rowmax
    else:
        rt = jnp.full_like(vals, tol)
    keep = av >= rt
    keep = jnp.where(is_diag, True, keep)
    keep = jnp.where(vals == 0.0, False, keep)
    keep = keep & live
    if lump:
        lacc = jnp.sum(jnp.where(live & ~keep, vals, 0.0), axis=1,
                       keepdims=True)
        vals = jnp.where(is_diag & keep, vals + lacc, vals)
    return jnp.where(keep, cols, PADCOL), jnp.where(keep, vals, 0.0)


@partial(jax.jit, static_argnames=("new_K",))
def compact(cols, vals, new_K: int):
    """Push live entries left (sort) and slice the padded width down to
    ceil8(new_K) (one program per shape -- sort + slices fused; widths
    stay multiples of 8, see ceil8)."""
    c, v = sort_rows(cols, vals)
    K8 = ceil8(new_K)
    if K8 <= c.shape[1]:
        return c[:, :K8], v[:, :K8]
    pad = K8 - c.shape[1]
    return (jnp.pad(c, ((0, 0), (0, pad)), constant_values=PADCOL),
            jnp.pad(v, ((0, 0), (0, pad))))


@jax.jit
def _row_count_max(cols):
    # f32 on purpose: integer d2h transfers hit a pathological minutes-long
    # first-use stall on remote-attached TPU backends; float scalars come
    # back in ~1 RTT.  Row counts are exact in f32 up to 2^24.
    return jnp.max(jnp.sum(cols < PADCOL, axis=1)).astype(jnp.float32)


def max_row_count(cols) -> int:
    """SCALAR device->host readback: the max live-entries-per-row.  The one
    sync point per product (shape discovery)."""
    return int(float(_row_count_max(cols)))


# ~~~~~~~~~~~~~~~~~~ SpGEMM ~~~~~~~~~~~~~~~~~~


def spgemm_expand(A: DELL, B: DELL):
    """Candidate triples of C = A @ B as padded rows [n, Ka*Kb]."""
    n = A.data.shape[0]
    safe = jnp.minimum(A.cols, B.data.shape[0] - 1)
    bcols = B.cols[safe]                       # [n, Ka, Kb]
    bvals = B.data[safe]
    alive = (A.cols < PADCOL)[:, :, None]
    ccols = jnp.where(alive, bcols, PADCOL)
    cvals = jnp.where(alive, A.data[:, :, None] * bvals, 0.0)
    return (ccols.reshape(n, -1), cvals.reshape(n, -1))


@jax.jit
def spgemm_merge(A: DELL, B: DELL):
    """C = A @ B merged (duplicates summed) at full padded width."""
    ccols, cvals = spgemm_expand(A, B)
    ccols, cvals = sort_rows(ccols, cvals)
    return segsum_rows(ccols, cvals)


def spgemm_drop_dell(A: DELL, B: DELL, tol: float, relative: bool,
                     lump: bool) -> DELL:
    """Fused C = drop(A @ B): the device sibling of the native
    spgemm_drop (kernels.cpp) and of the reference's product+drop chain.
    One scalar readback sizes the output."""
    ccols, cvals = _spgemm_drop_jit(A, B, float(tol), bool(relative),
                                    bool(lump))
    K_new = max(max_row_count(ccols), 1)
    c, v = compact(ccols, cvals, K_new)
    return DELL(v, c, B.n_cols)


@jax.jit
def _spgemm_merge_sorted(A: DELL, B: DELL):
    ccols, cvals = spgemm_expand(A, B)
    ccols, cvals = sort_rows(ccols, cvals)
    ccols, cvals = segsum_rows(ccols, cvals)
    return sort_rows(ccols, cvals)      # left-packed, sorted


def spgemm_merge_dell(A: DELL, B: DELL) -> DELL:
    """C = A @ B merged and left-packed at the expand capacity Ka*Kb --
    NO scalar readback (no compaction).  Use when the expand width is
    already tight, e.g. B has one entry per row (the one-point P), so the
    tunnel round-trip of a shape readback costs more than the padding."""
    ccols, cvals = _spgemm_merge_sorted(A, B)
    return DELL(cvals, ccols, B.n_cols)


@partial(jax.jit, static_argnames=("relative", "lump"))
def _spgemm_drop_jit(A: DELL, B: DELL, tol, relative: bool, lump: bool):
    ccols, cvals = spgemm_expand(A, B)
    ccols, cvals = sort_rows(ccols, cvals)
    ccols, cvals = segsum_rows(ccols, cvals)
    return drop_rows(ccols, cvals, tol, relative, lump)


# ~~~~~~~~~~~~~~~~~~ extraction ~~~~~~~~~~~~~~~~~~


def extract_dell(A: DELL, row_idx, col_mask, col_newidx, n_cols_new: int,
                 ensure_diag: bool = False,
                 compact_width: bool = True) -> DELL:
    """Submatrix A[row_idx][:, col_mask] with columns renumbered by
    ``col_newidx`` (the device analogue of MatCreateSubMatrix, reference:
    src/PETSc_Helperk.kokkos.cxx:1801-2403).

    row_idx: [n_new] device indices of the kept rows.
    col_mask: [n_cols] bool, col_newidx: [n_cols] new index per old column.
    ensure_diag: append a structural diagonal slot where missing (the
    fixed-sparsity polynomial needs the c0 I term to land).
    compact_width=False keeps the input capacity (rows still sorted and
    left-packed) and skips the scalar shape readback -- extraction can
    only shrink rows, so the input width is already a valid bound and the
    tunnel round-trip usually costs more than the padding."""
    ccols, cvals = _extract_core(A, row_idx, col_mask, col_newidx,
                                 bool(ensure_diag))
    if compact_width:
        K_new = max(max_row_count(ccols), 1)
    else:
        K_new = ccols.shape[1]
    c, v = compact(ccols, cvals, K_new)
    return DELL(v, c, n_cols_new)


@partial(jax.jit, static_argnames=("ensure_diag",))
def _extract_core(A: DELL, row_idx, col_mask, col_newidx,
                  ensure_diag: bool):
    cols = A.cols[row_idx]
    vals = A.data[row_idx]
    live = cols < PADCOL
    safe = jnp.minimum(cols, col_mask.shape[0] - 1)
    keep = live & col_mask[safe]
    ncols = jnp.where(keep, col_newidx[safe].astype(cols.dtype), PADCOL)
    nvals = jnp.where(keep, vals, 0.0)
    if ensure_diag:
        n_new = row_idx.shape[0]
        ridx = jnp.arange(n_new, dtype=cols.dtype)
        has_diag = jnp.any(ncols == ridx[:, None], axis=1)
        extra_c = jnp.where(has_diag, PADCOL, ridx)[:, None]
        ncols = jnp.concatenate([ncols, extra_c], axis=1)
        nvals = jnp.concatenate(
            [nvals, jnp.zeros((n_new, 1), dtype=nvals.dtype)], axis=1)
    return ncols, nvals


# ~~~~~~~~~~~~~~~~~~ fixed-sparsity polynomial ~~~~~~~~~~~~~~~~~~


@jax.jit
def restricted_product(Xc, Xv, A: DELL):
    """(X @ A) restricted to X's own pattern (device sibling of
    mat_mult_powers_share_sparsity, reference: src/Gmres_Poly.F90:777-920).
    Xc/Xv are X's padded (cols, vals)."""
    n = Xc.shape[0]
    X = DELL(Xv, Xc, A.data.shape[0])
    pc, pv = spgemm_expand(X, A)
    pc, pv = sort_rows(pc, pv)
    pc, pv = segsum_rows(pc, pv)
    pc, pv = sort_rows(pc, pv)          # live merged entries, left-packed
    idx = jax.vmap(jnp.searchsorted)(pc, Xc)
    idx = jnp.minimum(idx, pc.shape[1] - 1)
    hit = jnp.take_along_axis(pc, idx, axis=1) == Xc
    vals = jnp.where(hit & (Xc < PADCOL),
                     jnp.take_along_axis(pv, idx, axis=1), 0.0)
    return vals


@jax.jit
def poly_dell(A: DELL, coeffs):
    """Assembled polynomial sum_k c_k A^k restricted onto A's pattern
    (sparsity_order 1; A must carry a structural diagonal -- use
    extract_dell(..., ensure_diag=True))."""
    n = A.data.shape[0]
    cur = A.data
    acc = coeffs[1] * cur
    order = coeffs.shape[0] - 1
    for k in range(2, order + 1):
        cur = restricted_product(A.cols, cur, A)
        acc = acc + coeffs[k] * cur
    isd = A.cols == jnp.arange(n, dtype=A.cols.dtype)[:, None]
    acc = jnp.where(isd, acc + coeffs[0], acc)
    acc = jnp.where(A.cols < PADCOL, acc, 0.0)
    return DELL(acc, A.cols, A.n_cols)


def newton_poly_dell(A: DELL, wr, wi, tol_zero: float):
    """Assembled Newton-basis inverse restricted onto A's pattern (device
    sibling of src/Gmres_Poly_Newtonk.kokkos.cxx:15; real arithmetic for
    conjugate pairs as in inverse/build.py::_newton_fixed_sparsity_host).
    wr/wi must be CONCRETE numpy arrays (the root schedule is static)."""
    wr = np.asarray(wr)
    wi = np.asarray(wi)
    n = A.data.shape[0]
    isd = A.cols == jnp.arange(n, dtype=A.cols.dtype)[:, None]
    T = jnp.where(isd, 1.0, 0.0).astype(A.dtype)
    M = jnp.zeros_like(T)
    k = len(wr)
    i = 0
    while i <= k - 2:
        if wi[i] == 0.0:
            if abs(wr[i]) < tol_zero:
                i += 1
                continue
            M = M + T / wr[i]
            TA = restricted_product(A.cols, T, A)
            T = T - TA / wr[i]
            i += 1
        else:
            s = wr[i] ** 2 + wi[i] ** 2
            if s < tol_zero:
                i += 2
                continue
            TA = restricted_product(A.cols, T, A)
            T2 = 2.0 * wr[i] * T - TA
            M = M + T2 / s
            if i <= k - 3:
                T = T - restricted_product(A.cols, T2, A) / s
            i += 2
    if k >= 1 and wi[k - 1] == 0.0 and abs(wr[k - 1]) > tol_zero:
        M = M + T / wr[k - 1]
    M = jnp.where(A.cols < PADCOL, M, 0.0)
    return DELL(M, A.cols, A.n_cols)


# ~~~~~~~~~~~~~~~~~~ offset census (DIA detection) ~~~~~~~~~~~~~~~~~~

OFFBIG = np.int32(2**29)


@partial(jax.jit, static_argnames=("cap",))
def distinct_offsets_device(cols, cap: int = 16):
    """Distinct (col - row) offsets of a square padded pattern, computed
    ON DEVICE as a presence bitmap over the 2n-1 possible offsets (one
    scatter + one sized nonzero -- the earlier folded-union tree compiled
    a fresh program per fold shape and burned ~200s of XLA time per
    setup; a flat d2h of the pattern is tunnel-bandwidth bound and large
    1-D device sorts compile pathologically slowly on TPU).  Returns an
    ascending [cap+1] vector padded with OFFBIG; a live slot ``cap``
    means MORE than ``cap`` distinct offsets exist (DIA viability needs
    only ~8 offsets anyway)."""
    n, K = cols.shape
    ridx = jnp.arange(n, dtype=cols.dtype)[:, None]
    live = cols < PADCOL
    # shift offsets to [0, 2n-2]; dead slots land on the 2n-1 sentinel
    offs = jnp.where(live, cols - ridx + (n - 1), 2 * n - 1)
    bitmap = jnp.zeros(2 * n, bool).at[offs.reshape(-1)].set(
        True, mode="drop")
    bitmap = bitmap.at[2 * n - 1].set(False)
    idx = jnp.nonzero(bitmap, size=cap + 1, fill_value=2 * n)[0]
    return jnp.where(idx < 2 * n - 1,
                     idx.astype(jnp.int32) - jnp.int32(n - 1), OFFBIG)


# ~~~~~~~~~~~~~~~~~~ pattern transpose / union ~~~~~~~~~~~~~~~~~~


def transpose_pattern(A: DELL):
    """A^T's pattern as padded cols [n_cols, K_T] -- the in-neighbour
    lists, used to symmetrize the strength graph (the reference symmetrizes
    S on the host, src/SAbs.F90; here the scatter runs once per level on
    device).  One scalar readback sizes K_T.  int32-safe: the global order
    is a two-key lexicographic sort, no row*n+col packing."""
    n_rows, K = A.cols.shape
    n_cols = A.n_cols
    rows = jnp.broadcast_to(
        jnp.arange(n_rows, dtype=jnp.int32)[:, None], (n_rows, K)
    ).reshape(-1)
    cols = A.cols.reshape(-1)
    col_s, row_s = jax.lax.sort((cols, rows), num_keys=2)
    live = col_s < PADCOL
    group_start = jnp.searchsorted(col_s, col_s)
    slot = (jnp.arange(col_s.shape[0], dtype=jnp.int32)
            - group_start.astype(jnp.int32))
    K_T = max(int(float(jnp.max(jnp.where(live, slot, -1))
                        .astype(jnp.float32))) + 1, 1)
    tcols = jnp.full((n_cols, K_T), PADCOL, dtype=jnp.int32)
    tc = jnp.where(live, col_s, n_cols)      # out of bounds -> dropped
    ts = jnp.where(live, slot, K_T)
    tcols = tcols.at[tc, ts].set(row_s, mode="drop")
    return tcols


def union_patterns(cols_a, cols_b):
    """Per-row sorted union of two padded column sets; returns padded cols
    (dead = PADCOL) at combined width -- caller compacts."""
    allc = jnp.concatenate([cols_a, cols_b], axis=1)
    allc = jnp.sort(allc, axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(allc[:, :1], dtype=bool),
         allc[:, 1:] != allc[:, :-1]], axis=1)
    live = first & (allc < PADCOL)
    return jnp.where(live, allc, PADCOL)
