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
    """Round a padded width up to a multiple of 8 with a MINIMUM of 16:
    2-D arrays with unaligned last dims hit pathological XLA compile
    paths on TPU (measured ~13-48s vs ~1-3s aligned), and minor dim
    EXACTLY 8 is itself pathological for several fused patterns
    (scatter/reduce/compare at [262144, 8] measured ~17-27s to compile
    vs ~1-2s at [262144, 16]).  All DELL widths are therefore multiples
    of 8 with min 16 by policy (the name keeps the granularity)."""
    return max(16, ((int(k) + 7) // 8) * 8)


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
        # one jitted program per shape; the eager form dispatched 4
        # separate XLA programs (iota/equal/where/reduce) per call site
        return _diag_jit(self.data, self.cols)

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


@jax.jit
def _diag_jit(data, cols):
    n = data.shape[0]
    isd = cols == jnp.arange(n, dtype=cols.dtype)[:, None]
    return jnp.sum(jnp.where(isd, data, 0), axis=1)


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


def cumsum1d(x):
    """Inclusive 1-D cumsum via log-depth doubling (shifts + adds only):
    jnp.cumsum on a large 1-D operand compiles in ~4s on TPU and sized
    jnp.nonzero in ~7s; this form compiles in well under 1s and its
    log(n) extra passes are bandwidth noise."""
    n = x.shape[0]
    d = 1
    while d < n:
        x = jnp.concatenate([x[:d], x[d:] + x[:-d]])
        d *= 2
    return x


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
    """Candidate triples of C = A @ B as padded rows [n, Ka*Kb].

    Masking rides a SENTINEL ROW appended to B (dead A slots gather the
    (PADCOL, 0) row): a broadcast where/select of an [n,Ka,1] mask
    against the [n,Ka,Kb] gather output compiles pathologically on TPU
    (measured ~18s vs ~0.7s for this form at [147k,8]x[115k,48]); the
    broadcast MULTIPLY for the values is fine."""
    n = A.data.shape[0]
    nb = B.data.shape[0]
    Kb = B.data.shape[1]
    bc1 = jnp.concatenate(
        [B.cols, jnp.full((1, Kb), PADCOL, B.cols.dtype)], axis=0)
    bd1 = jnp.concatenate(
        [B.data, jnp.zeros((1, Kb), B.data.dtype)], axis=0)
    alive = A.cols < PADCOL
    safe = jnp.where(alive, jnp.minimum(A.cols, nb - 1), nb)
    ccols = bc1[safe]                          # [n, Ka, Kb]
    cvals = jnp.where(alive, A.data, 0.0)[:, :, None] * bd1[safe]
    return (ccols.reshape(n, -1), cvals.reshape(n, -1))


@jax.jit
def spgemm_merge(A: DELL, B: DELL):
    """C = A @ B merged (duplicates summed) at full padded width."""
    ccols, cvals = spgemm_expand(A, B)
    ccols, cvals = sort_rows(ccols, cvals)
    return segsum_rows(ccols, cvals)


# Above this many candidate entries (rows x Ka x Kb) the expand ->
# sort -> segsum pipeline runs row-CHUNKED under lax.map: the full-width
# intermediate of a big product (e.g. RAP at 512^2) otherwise allocates
# multiple GB and OOMs the 16 GB HBM.  Rows are independent, so chunking
# is exact; the threshold keeps small/sharded products in the single
# fused program (GSPMD shards those cleanly).
_SPGEMM_CHUNK_LIMIT = 1 << 26
_SPGEMM_CHUNK_ROWS = 1 << 15


def _row_sharded(x) -> bool:
    """True when the (concrete) array is sharded across devices -- the
    chunked product's reshape would fight GSPMD's row partition."""
    try:
        return any(s is not None for s in tuple(x.sharding.spec))
    except Exception:
        return False


def spgemm_drop_dell(A: DELL, B: DELL, tol: float, relative: bool,
                     lump: bool, diag_of_row=None) -> DELL:
    """Fused C = drop(A @ B): the device sibling of the native
    spgemm_drop (kernels.cpp) and of the reference's product+drop chain.
    One scalar readback sizes the output.  ``diag_of_row``: the column
    that counts as each row's protected diagonal (default: the row index;
    pass the global coarse positions when A's rows are a compressed
    renumbering, e.g. the coarse-rows-only RAP).

    Row-sharded operands on a shared 1-D mesh take the NEIGHBOUR-ONLY
    halo-exchange path when the partition is banded (two ppermute shifts
    of B instead of GSPMD's general resharding -- the reference's
    PetscSF/distributed-MatMatMult semantics); otherwise GSPMD compiles
    the fused program SPMD."""
    n = A.data.shape[0]
    ccols = cvals = None
    if _row_sharded(A.data):
        from ..parallel.halo_spgemm import halo_mesh_for, spgemm_drop_halo

        mesh = halo_mesh_for(A, B)
        if mesh is not None:
            out = spgemm_drop_halo(A, B, float(tol), bool(relative),
                                   bool(lump), mesh, diag_of_row)
            if out is not None:
                ccols, cvals = out
    if ccols is None:
        if (n * A.K * B.K > _SPGEMM_CHUNK_LIMIT and n > _SPGEMM_CHUNK_ROWS
                and not _row_sharded(A.data)):
            ccols, cvals = _spgemm_drop_chunked(A, B, float(tol),
                                                bool(relative), bool(lump),
                                                diag_of_row)
        else:
            ccols, cvals = _spgemm_drop_jit(A, B, float(tol),
                                            bool(relative), bool(lump),
                                            diag_of_row)
    K_new = max(max_row_count(ccols), 1)
    c, v = compact(ccols, cvals, K_new)
    return DELL(v, c, B.n_cols)


def _spgemm_drop_chunked(A: DELL, B: DELL, tol: float, relative: bool,
                         lump: bool, diag_of_row=None):
    """Row-chunked fused product+drop: peak memory is one chunk's expand
    ([CHUNK_ROWS, Ka*Kb]) instead of the whole matrix's."""
    n = A.data.shape[0]
    if diag_of_row is None:
        diag_of_row = jnp.arange(n, dtype=A.cols.dtype)
    return _spgemm_drop_chunked_jit(A.data, A.cols, diag_of_row, B, tol,
                                    relative, lump)


@partial(jax.jit, static_argnames=("relative", "lump"))
def _spgemm_drop_chunked_jit(ad, ac, dor, B: DELL, tol, relative: bool,
                             lump: bool):
    # padding/reshape to the chunk layout lives INSIDE the program (the
    # eager pad/reshape/iota soup cost ~4 extra XLA programs per level)
    n = ad.shape[0]
    CH = _SPGEMM_CHUNK_ROWS
    nch = -(-n // CH)
    padn = nch * CH - n
    ac3 = jnp.pad(ac, ((0, padn), (0, 0)),
                  constant_values=PADCOL).reshape(nch, CH, -1)
    ad3 = jnp.pad(ad, ((0, padn), (0, 0))).reshape(nch, CH, -1)
    rix3 = jnp.pad(dor, (0, padn),
                   constant_values=PADCOL).reshape(nch, CH)
    nb = B.data.shape[0]
    Kb = B.data.shape[1]
    bc1 = jnp.concatenate(
        [B.cols, jnp.full((1, Kb), PADCOL, B.cols.dtype)], axis=0)
    bd1 = jnp.concatenate(
        [B.data, jnp.zeros((1, Kb), B.data.dtype)], axis=0)

    def body(args):
        a_d, a_c, rix = args
        ch = a_d.shape[0]
        alive = a_c < PADCOL
        safe = jnp.where(alive, jnp.minimum(a_c, nb - 1), nb)
        ccols = bc1[safe].reshape(ch, -1)
        cvals = (jnp.where(alive, a_d, 0.0)[:, :, None]
                 * bd1[safe]).reshape(ch, -1)
        ccols, cvals = sort_rows(ccols, cvals)
        ccols, cvals = segsum_rows(ccols, cvals)
        return drop_rows(ccols, cvals, tol, relative, lump,
                         diag_of_row=rix)

    ccols, cvals = jax.lax.map(body, (ad3, ac3, rix3))
    return (ccols.reshape(nch * CH, -1)[:n],
            cvals.reshape(nch * CH, -1)[:n])


@partial(jax.jit, static_argnames=("n_cols_new",))
def onecol_product(A: DELL, pcol, pval, n_cols_new: int) -> DELL:
    """AP = A @ P for a P with at most ONE live entry per row (the
    one-point-W prolongator [n, n_c]): a pure column RELABELING of A --
    AP[i, pcol[j]] += A[i, j] * pval[j] -- merged rowwise at A's own
    width.  Replaces the [n, Ka*Kp] expand of the general SpGEMM with a
    [n, Ka] one (the RAP expand at full width OOMs HBM at 512^2).
    ``pcol``: [n_cols(A)] target column per P row (PADCOL = empty row);
    ``pval``: the matching value."""
    live = A.cols < PADCOL
    safe = jnp.minimum(A.cols, pcol.shape[0] - 1)
    newc = jnp.where(live, pcol[safe], PADCOL)
    newv = jnp.where(live, A.data * pval[safe], 0.0)
    newc = jnp.where(newv == 0.0, PADCOL, newc)
    c, v = sort_rows(newc, newv)
    c, v = segsum_rows(c, v)
    c, v = sort_rows(c, v)
    return DELL(v, c, n_cols_new)


@partial(jax.jit, static_argnames=("relative", "lump"))
def _spgemm_drop_jit(A: DELL, B: DELL, tol, relative: bool, lump: bool,
                     diag_of_row=None):
    ccols, cvals = spgemm_expand(A, B)
    ccols, cvals = sort_rows(ccols, cvals)
    ccols, cvals = segsum_rows(ccols, cvals)
    return drop_rows(ccols, cvals, tol, relative, lump,
                     diag_of_row=diag_of_row)


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
    tunnel round-trip usually costs more than the padding.

    Row-sharded operators on a 1-D mesh take the NEIGHBOUR-ONLY halo
    path for banded partitions (ppermute shifts instead of GSPMD's
    general resharding of the row gather); see
    parallel/halo_spgemm.py::extract_halo."""
    ccols = cvals = None
    if _row_sharded(A.data):
        from ..parallel.halo_spgemm import _mesh_of, extract_halo

        mesh = _mesh_of(A.data)
        if mesh is not None:
            out = extract_halo(A, row_idx, col_mask, col_newidx,
                               bool(ensure_diag), mesh)
            if out is not None:
                ccols, cvals = out
    if ccols is None:
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


# Above this many mask elements (rows x Ka*Kb x K_out) the compare-reduce
# runs row-chunked under lax.map: XLA usually fuses the [n, Ka*Kb, K]
# select into the reduction, but chunking bounds peak memory even when it
# does not.  The chunk height adapts to the per-row mask volume so one
# chunk's intermediate stays within the element budget at any width.
_RESTRICT_CHUNK_LIMIT = 1 << 31


def _restrict_chunk_rows(per_row: int) -> int:
    """Rows per chunk keeping CH * per_row within the element budget
    (multiple of 8, at least 8)."""
    ch = max(int(_RESTRICT_CHUNK_LIMIT // max(per_row, 1)), 8)
    return max((ch // 8) * 8, 8)


@jax.jit
def restricted_product(Xc, Xv, A: DELL):
    """(X @ A) restricted to X's own pattern (device sibling of
    mat_mult_powers_share_sparsity, reference: src/Gmres_Poly.F90:777-920).
    Xc/Xv are X's padded (cols, vals).

    Because the OUTPUT pattern is known (X's own), no merge of the product
    triples is needed at all: out[i, j] = sum over candidate triples whose
    column equals Xc[i, j] -- a broadcast compare + masked reduction over
    the expand, with no row sort.  The earlier expand->sort->segsum->
    searchsorted form paid ~log^2(Ka*Kb) VPU compare stages per product
    and dominated the warm device setup; this form measures 9-38x faster
    across the 512^2 hierarchy's shapes on a v5 chip (dead slots carry
    value 0, so they contribute nothing to any target)."""
    n, K = Xc.shape
    per_row = K * A.K * K
    if n * per_row > _RESTRICT_CHUNK_LIMIT:
        CH = _restrict_chunk_rows(per_row)
        nch = -(-n // CH)
        padn = nch * CH - n
        c3 = jnp.pad(Xc, ((0, padn), (0, 0)),
                     constant_values=PADCOL).reshape(nch, CH, K)
        v3 = jnp.pad(Xv, ((0, padn), (0, 0))).reshape(nch, CH, K)

        def body(args):
            xc, xv = args
            return _restrict_compare(xc, xv, A)

        out = jax.lax.map(body, (c3, v3))
        return out.reshape(nch * CH, K)[:n]
    return _restrict_compare(Xc, Xv, A)


def _restrict_compare(Xc, Xv, A: DELL):
    X = DELL(Xv, Xc, A.data.shape[0])
    pc, pv = spgemm_expand(X, A)            # [rows, K*Ka]
    m = pc[:, :, None] == Xc[:, None, :]
    return jnp.sum(jnp.where(m, pv[:, :, None], 0.0), axis=1)


# ~~~~~~~~~~ restriction plan: repeated products on ONE pattern ~~~~~~~~~~
#
# When several products restrict onto the SAME pattern (the polynomial
# power recurrence, Newton basis steps, fixed-sparsity improve
# iterations), the whole product collapses to a precomputed per-row local
# stencil operator
#     T[i, k, j] = A[Xc[i, k], Xc[i, j]]
# so each product is  out[i, j] = sum_k Xv[i, k] * T[i, k, j]  -- a
# batched [K]x[K, K] contraction with NO gather and NO sort.  The gather
# of A's rows (the dominant cost on TPU: measured ~46 ms per [262k, 16]
# row gather vs ~1.5 ms for the row sort) is paid ONCE per (pattern, A)
# instead of once per product step.


def restrict_plan(Xc, A: DELL):
    """T [n, K, K] with T[i,k,j] = A[Xc[i,k], Xc[i,j]] (0 where either
    index is dead or the entry is outside A's pattern)."""
    n, K = Xc.shape
    per_row = K * A.K * K
    if n * per_row > _RESTRICT_CHUNK_LIMIT:
        CH = _restrict_chunk_rows(per_row)
        nch = -(-n // CH)
        padn = nch * CH - n
        c3 = jnp.pad(Xc, ((0, padn), (0, 0)),
                     constant_values=PADCOL).reshape(nch, CH, K)
        out = jax.lax.map(lambda xc: _restrict_plan_core(xc, A), c3)
        return out.reshape(nch * CH, K, K)[:n]
    return _restrict_plan_core(Xc, A)


@jax.jit
def _restrict_plan_core(Xc, A: DELL):
    nb = A.data.shape[0]
    Ka = A.data.shape[1]
    bc1 = jnp.concatenate(
        [A.cols, jnp.full((1, Ka), PADCOL, A.cols.dtype)], axis=0)
    bd1 = jnp.concatenate(
        [A.data, jnp.zeros((1, Ka), A.data.dtype)], axis=0)
    alive = Xc < PADCOL
    safe = jnp.where(alive, jnp.minimum(Xc, nb - 1), nb)
    gc = bc1[safe]                               # [n, K, Ka]
    gv = bd1[safe]                               # [n, K, Ka]
    m = gc[:, :, :, None] == Xc[:, None, None, :]
    return jnp.sum(jnp.where(m, gv[:, :, :, None], 0.0), axis=2)


@jax.jit
def apply_restrict_plan(T, Xv):
    """out[i,j] = sum_k Xv[i,k] * T[i,k,j] -- one restricted product.
    Precision.HIGHEST: a default f32 dot on TPU rounds operands to bf16
    (~1e-3 relative error), which would compound over the order-6..24
    polynomial recurrences (same hazard documented in sparse/banded.py)."""
    return jnp.einsum("nk,nkj->nj", Xv, T,
                      precision=jax.lax.Precision.HIGHEST)


@jax.jit
def poly_dell(A: DELL, coeffs):
    """Assembled polynomial sum_k c_k A^k restricted onto A's pattern
    (sparsity_order 1; A must carry a structural diagonal -- use
    extract_dell(..., ensure_diag=True)).  The power recurrence runs as a
    lax.scan over the coefficients so the product compiles ONCE, not
    order-1 times, and rides a restriction PLAN: the gather of A's rows
    happens once (restrict_plan), every power step is a gather-free
    batched contraction (apply_restrict_plan)."""
    n = A.data.shape[0]
    acc = coeffs[1] * A.data
    order = coeffs.shape[0] - 1
    if order >= 2:
        T = restrict_plan(A.cols, A)

        def step(carry, ck):
            cur, acc = carry
            cur = apply_restrict_plan(T, cur)
            return (cur, acc + ck * cur), None
        (_, acc), _ = jax.lax.scan(step, (A.data, acc), coeffs[2:])
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
    # one gather for the whole Newton recurrence: every step restricts
    # onto A's own pattern, so they all share one restriction plan --
    # built lazily so a degenerate schedule (k <= 1 or all roots below
    # tol_zero) never pays the gather or the [n, K, K] tensor
    _plan = [None]

    def _P():
        if _plan[0] is None:
            _plan[0] = restrict_plan(A.cols, A)
        return _plan[0]

    apply_restrict = lambda X: apply_restrict_plan(_P(), X)
    k = len(wr)
    i = 0
    while i <= k - 2:
        if wi[i] == 0.0:
            if abs(wr[i]) < tol_zero:
                i += 1
                continue
            M = M + T / wr[i]
            TA = apply_restrict(T)
            T = T - TA / wr[i]
            i += 1
        else:
            s = wr[i] ** 2 + wi[i] ** 2
            if s < tol_zero:
                i += 2
                continue
            TA = apply_restrict(T)
            T2 = 2.0 * wr[i] * T - TA
            M = M + T2 / s
            if i <= k - 3:
                T = T - apply_restrict(T2) / s
            i += 2
    if k >= 1 and wi[k - 1] == 0.0 and abs(wr[k - 1]) > tol_zero:
        M = M + T / wr[k - 1]
    M = jnp.where(A.cols < PADCOL, M, 0.0)
    return DELL(M, A.cols, A.n_cols)


@jax.jit
def gather_at_pattern(pc, B: DELL):
    """Values of B at pattern columns ``pc`` (rows aligned; 0 where the
    entry is outside B's pattern).  B rows must be sorted/left-packed (the
    DELL invariant); the lookup is a per-row searchsorted -- the device
    analogue of remove_from_sparse_match's restriction gather
    (reference: src/PETSc_Helper.F90:490)."""
    idx = jax.vmap(jnp.searchsorted)(B.cols, pc)
    idx = jnp.minimum(idx, B.cols.shape[1] - 1)
    hit = jnp.take_along_axis(B.cols, idx, axis=1) == pc
    return jnp.where(hit & (pc < PADCOL),
                     jnp.take_along_axis(B.data, idx, axis=1), 0.0)


# ~~~~~~~~~~~~~~~~~~ offset census (DIA detection) ~~~~~~~~~~~~~~~~~~

OFFBIG = np.int32(2**29)


CENSUS_ROWS = 1024


@partial(jax.jit, static_argnames=("cap",))
def distinct_offsets_device(cols, cap: int = 16):
    """Distinct (col - row) offsets of a square padded pattern, computed
    ON DEVICE as a presence bitmap over the 2n-1 possible offsets,
    extracted blockwise.  Per-column 1-D scatters build the bitmap (a
    flattened [n,K] scatter forces a relayout that compiles in ~18-100s
    on TPU; K separate 1-D scatters compile in ~1s total), then the
    bitmap reshapes to [CENSUS_ROWS, C] and a row-wise sort yields the
    first cap+1 candidate offsets PER BLOCK.  Returns [CENSUS_ROWS,
    cap+1] ascending candidates padded with OFFBIG; the HOST finishes
    with np.unique on the ~70KB readback (the earlier folded-union tree
    burned ~200s of XLA compile per setup; a flat d2h of the whole
    pattern is tunnel-bandwidth bound).  Exactness: if the global
    distinct count is <= cap, no block can exceed cap+1 candidates, so
    the union is exact; if some block truncates, the global count
    already exceeds cap and DIA viability (~8 offsets) is correctly
    rejected."""
    n, K = cols.shape
    ridx = jnp.arange(n, dtype=cols.dtype)

    def scat(k, bm):
        ck = jax.lax.dynamic_index_in_dim(cols, k, 1, keepdims=False)
        # dead slots target index 2n: outside the bitmap, mode="drop"
        offk = jnp.where(ck < PADCOL, ck - ridx + (n - 1), 2 * n)
        return bm.at[offk].add(1, mode="drop")

    # fori_loop: the K per-column scatters compile once, not K times
    bitmap = jax.lax.fori_loop(0, K, scat, jnp.zeros(2 * n, jnp.int32))
    C = -((-2 * n) // CENSUS_ROWS)
    pad = CENSUS_ROWS * C - 2 * n
    if pad:
        bitmap = jnp.pad(bitmap, (0, pad))
    b2 = bitmap.reshape(CENSUS_ROWS, C)
    iota = jnp.arange(C, dtype=jnp.int32)[None, :]
    base = (jnp.arange(CENSUS_ROWS, dtype=jnp.int32) * C)[:, None]
    keys = jnp.where(b2 > 0, base + iota - jnp.int32(n - 1), OFFBIG)
    out = jnp.sort(keys, axis=1)
    if C >= cap + 1:
        return out[:, : cap + 1]
    return jnp.pad(out, ((0, 0), (0, cap + 1 - C)),
                   constant_values=OFFBIG)


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
