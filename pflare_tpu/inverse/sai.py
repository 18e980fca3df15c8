"""SAI / ISAI approximate inverses and the lAIR Z build.

Reference: src/SAI_Z.F90.  For every target row j with allowed sparsity J
(from the sparsity matrix), solve the local dense system

    Z(j, J) . A_ff(J, I) = -A_cf(j, I)

ISAI ("incomplete", = one-level restricted additive Schwarz, Antz 2018):
I = J, square solve.  SAI: I = shadow(J) (all columns reachable from rows J),
rectangular least squares.  A square approximate inverse (reference:
src/SAI_Z.F90:781) is the same with A_cf = -I.

TPU-native form: instead of the reference's per-row Kokkos team solves
(src/SAI_Zk.kokkos), all rows are padded to a common block size and solved
as ONE batched dense QR least-squares, chunked to bound memory.  Padded
columns are given disjoint unit rows in an augmentation block, so the
normal equations decouple exactly and padded unknowns come out 0 -- no
masking of the factorization itself is needed.  The batch is numpy on the
host during setup (patterns are host-symbolic); the identical einsum/QR
shape maps directly onto the MXU if run under jit.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

# Cap on the number of f64 scalars materialised per gathered chunk
# (blocks + rhs); keeps peak memory ~a few hundred MB.
_CHUNK_SCALARS = 1 << 24


def _rows_of(A):
    return np.repeat(np.arange(A.shape[0], dtype=np.int64), np.diff(A.indptr))


def _sv_cutoff(dtype) -> float:
    """dtype-matched relative singular-value/pivot cutoff (the host
    constrain/params sigma_drop: 1e-13 f64, 1e-6 f32 -- a fixed 1e-12
    would invert f32 noise-level singular values)."""
    from ..params import tolerances

    return float(tolerances(np.dtype(dtype).type).sigma_drop)


def _lookup_pos(A, rows, cols):
    """Position of each (row, col) inside A's sorted entry list; -1 when
    absent.  Safe on an empty A."""
    keys = _rows_of(A) * np.int64(A.shape[1]) + A.indices
    q = (rows.astype(np.int64) * np.int64(A.shape[1])
         + cols.astype(np.int64))
    if len(keys) == 0:
        return np.full(q.shape, -1, dtype=np.int64)
    pos = np.searchsorted(keys, q.ravel())
    pos_c = np.minimum(pos, len(keys) - 1)
    ok = keys[pos_c] == q.ravel()
    return np.where(ok, pos_c, -1).reshape(q.shape)


def _csr_lookup(A, rows, cols):
    """Vectorised A[rows, cols] with 0 for entries outside the pattern.

    ``rows``/``cols`` may be any (equal) shape.  A must have sorted indices.
    """
    pos = _lookup_pos(A, np.asarray(rows), np.asarray(cols))
    return np.where(pos >= 0, A.data[np.maximum(pos, 0)], 0.0)


def _pad_indices(M: sp.csr_matrix):
    """Row-padded index table of a CSR pattern.

    Returns (idx [n, kmax], mask [n, kmax], counts [n]); padded slots hold 0
    and mask False.
    """
    counts = np.diff(M.indptr)
    n = M.shape[0]
    kmax = int(counts.max()) if n and M.nnz else 0
    idx = np.zeros((n, kmax), dtype=np.int64)
    mask = np.zeros((n, kmax), dtype=bool)
    if kmax:
        slot = np.arange(M.nnz, dtype=np.int64) - np.repeat(M.indptr[:-1], counts)
        rr = _rows_of(M)
        idx[rr, slot] = M.indices
        mask[rr, slot] = True
    return idx, mask, counts


def sai_z(A_ff, A_cf, sparsity_cf, incomplete: bool,
          batched: bool = True, device: bool | None = None) -> sp.csr_matrix:
    """Compute Z ~= -A_cf @ inv(A_ff) with the sparsity of ``sparsity_cf``.

    ``device=True`` executes the batched dense QR solves under jit on the
    accelerator (the Kokkos-sibling parity item, reference:
    src/SAI_Zk.kokkos.cxx:13: per-row team solves become one batched MXU
    QR).  Default: host numpy (override with PFLARE_SAI_DEVICE=1)."""
    import os

    A_ff = sp.csr_matrix(A_ff)
    A_ff.sort_indices()
    A_cf = sp.csr_matrix(A_cf)
    A_cf.sort_indices()
    S = sp.csr_matrix(sparsity_cf)
    S.sort_indices()
    if device is None:
        device = os.environ.get("PFLARE_SAI_DEVICE") == "1"
    if device and S.nnz:
        return _sai_z_device(A_ff, A_cf, S, incomplete)
    if batched and S.nnz:
        return _sai_z_batched(A_ff, A_cf, S, incomplete)
    return _sai_z_loop(A_ff, A_cf, S, incomplete)


def _sai_z_device(A_ff, A_cf, S, incomplete: bool) -> sp.csr_matrix:
    """Device-executed batched SAI solves: block gather + batched QR +
    triangular solve, one jitted program per chunk-shape bucket.  The
    gather tables are host-symbolic (like every pattern); only the DENSE
    LINEAR ALGEBRA runs on device -- the MXU-shaped part."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    n_rows = S.shape[0]
    J_idx, J_mask, kJ = _pad_indices(S)
    kmax = J_idx.shape[1]
    if incomplete:
        I_idx, I_mask, kI = J_idx, J_mask, kJ
    else:
        Sh = sp.csr_matrix(
            (np.ones(S.nnz), S.indices, S.indptr), shape=S.shape
        ) @ sp.csr_matrix(
            (np.ones(A_ff.nnz), A_ff.indices, A_ff.indptr), shape=A_ff.shape
        )
        Sh.sort_indices()
        I_idx, I_mask, kI = _pad_indices(Sh)

    # entry lookup tables, host-built once: position of (row, col) in
    # A_ff/A_cf (-1 when absent)
    lookup_pos = _lookup_pos

    @partial(jax.jit, static_argnames=("kc",))
    def solve_chunk(aff_vals, acf_vals, Mpos, Rpos, Jm, kc):
        # M[b, ic, kc]: values gathered with -1 -> 0
        M = jnp.where(Mpos >= 0, aff_vals[jnp.maximum(Mpos, 0)], 0.0)
        aug = (jnp.eye(kc)[None, :, :]
               * (~Jm)[:, None, :].astype(M.dtype))
        M_ext = jnp.concatenate([M, aug], axis=1)
        rhs = -jnp.where(Rpos >= 0, acf_vals[jnp.maximum(Rpos, 0)], 0.0)
        rhs_ext = jnp.concatenate(
            [rhs, jnp.zeros((rhs.shape[0], kc), dtype=rhs.dtype)], axis=1)
        Q, R = jnp.linalg.qr(M_ext)
        qtb = jnp.einsum("bij,bi->bj", Q, rhs_ext)
        z = jax.scipy.linalg.solve_triangular(R, qtb[..., None],
                                              lower=False)[..., 0]
        rdiag = jnp.abs(jnp.diagonal(R, axis1=1, axis2=2))
        tiny = float(jnp.finfo(M.dtype).tiny)
        good = (rdiag.min(axis=1)
                > _sv_cutoff(M.dtype) * jnp.maximum(rdiag.max(axis=1),
                                                    tiny))
        good = good & jnp.isfinite(z).all(axis=1)
        return jnp.where(good[:, None], z, 0.0), good

    out_data = np.zeros((n_rows, kmax))
    bad_rows: list[int] = []
    order = np.argsort(-kI, kind="stable")
    order = order[kJ[order] > 0]
    rows_per_chunk = max(
        1, _CHUNK_SCALARS // max(1, kmax * (I_idx.shape[1] + kmax)))
    aff_vals = jnp.asarray(A_ff.data)
    acf_vals = jnp.asarray(A_cf.data)
    for lo in range(0, len(order), rows_per_chunk):
        sel = order[lo : lo + rows_per_chunk]
        if len(sel) == 0:
            continue
        kc = int(kJ[sel].max())
        ic = int(kI[sel].max())
        Jc, Jm = J_idx[sel][:, :kc], J_mask[sel][:, :kc]
        Ic, Im = I_idx[sel][:, :ic], I_mask[sel][:, :ic]
        Mpos = lookup_pos(A_ff, Jc[:, None, :], Ic[:, :, None])
        Mpos = np.where(Im[:, :, None] & Jm[:, None, :], Mpos, -1)
        Rpos = lookup_pos(A_cf, np.broadcast_to(sel[:, None], Ic.shape), Ic)
        Rpos = np.where(Im, Rpos, -1)
        z, good = solve_chunk(aff_vals, acf_vals, jnp.asarray(Mpos),
                              jnp.asarray(Rpos), jnp.asarray(Jm), kc)
        z = np.asarray(z)
        good = np.asarray(good)
        out_data[sel, :kc] = z
        bad_rows.extend(int(r) for r in sel[~good])

    if bad_rows:
        bad = np.asarray(bad_rows)
        Zf = _sai_z_loop(A_ff, sp.csr_matrix(A_cf[bad]), S[bad], incomplete)
        Zf.sort_indices()
        for k, j in enumerate(bad):
            vals = Zf.data[Zf.indptr[k]:Zf.indptr[k + 1]]
            out_data[j, : len(vals)] = vals

    rows_coo = np.repeat(np.arange(n_rows), kJ)
    slot = np.arange(S.nnz, dtype=np.int64) - np.repeat(S.indptr[:-1], kJ)
    Z = sp.csr_matrix(
        (out_data[rows_coo, slot], S.indices.copy(), S.indptr.copy()),
        shape=S.shape,
    )
    Z.sort_indices()
    return Z


def _sai_z_batched(A_ff, A_cf, S, incomplete: bool) -> sp.csr_matrix:
    n_rows = S.shape[0]
    J_idx, J_mask, kJ = _pad_indices(S)
    kmax = J_idx.shape[1]

    if incomplete:
        I_idx, I_mask, kI = J_idx, J_mask, kJ
    else:
        # shadow(J): the pattern of row j of S @ A_ff (cheap symbolic SpGEMM)
        Sh = sp.csr_matrix(
            (np.ones(S.nnz), S.indices, S.indptr), shape=S.shape
        ) @ sp.csr_matrix(
            (np.ones(A_ff.nnz), A_ff.indices, A_ff.indptr), shape=A_ff.shape
        )
        Sh.sort_indices()
        I_idx, I_mask, kI = _pad_indices(Sh)
    imax = I_idx.shape[1]

    out_data = np.zeros((n_rows, kmax))
    rows_per_chunk = max(1, _CHUNK_SCALARS // max(1, kmax * (imax + kmax)))
    bad_rows: list[int] = []

    # Bucket rows by descending block height so each chunk pads only to its
    # own max sizes (row block sizes vary a lot for the SAI shadow).
    order = np.argsort(-kI, kind="stable")
    order = order[kJ[order] > 0]

    for lo in range(0, len(order), rows_per_chunk):
        sel = order[lo : lo + rows_per_chunk]
        if len(sel) == 0:
            continue
        kc = int(kJ[sel].max())
        ic = int(kI[sel].max())
        pad_eye = np.eye(kc)
        Jc, Jm = J_idx[sel][:, :kc], J_mask[sel][:, :kc]   # [b, kc]
        Ic, Im = I_idx[sel][:, :ic], I_mask[sel][:, :ic]   # [b, ic]
        b = len(sel)
        # M[r, a, c] = A_ff[J_c, I_a]  (the transposed local block), plus a
        # unit row per padded column so the LS decouples and z_pad == 0.
        M = _csr_lookup(A_ff, Jc[:, None, :], Ic[:, :, None])  # [b, ic, kc]
        M *= (Im[:, :, None] & Jm[:, None, :])
        aug = np.broadcast_to(pad_eye, (b, kc, kc)) * ~Jm[:, None, :]
        M_ext = np.concatenate([M, aug], axis=1)    # [b, ic+kc, kc]
        rhs = -_csr_lookup(A_cf, np.broadcast_to(sel[:, None], Ic.shape), Ic)
        rhs *= Im
        rhs_ext = np.concatenate([rhs, np.zeros((b, kc))], axis=1)

        Q, R = np.linalg.qr(M_ext)                  # batched reduced QR
        qtb = np.einsum("bij,bi->bj", Q, rhs_ext)
        rdiag = np.abs(np.diagonal(R, axis1=1, axis2=2))
        good = rdiag.min(axis=1) > 1e-12 * np.maximum(rdiag.max(axis=1), 1e-300)
        with np.errstate(all="ignore"):
            z = np.linalg.solve(
                R + 1e-300 * np.broadcast_to(pad_eye, R.shape), qtb[..., None]
            )[..., 0]
        good &= np.isfinite(z).all(axis=1)
        out_data[sel, :kc] = np.where(good[:, None], z, 0.0)
        bad_rows.extend(int(r) for r in sel[~good])

    if bad_rows:
        # Rank-deficient local blocks: redo those rows with the SVD
        # (min-norm) host solve, matching the reference's lstsq fallback.
        bad = np.asarray(bad_rows)
        Zf = _sai_z_loop(A_ff, sp.csr_matrix(A_cf[bad]), S[bad], incomplete)
        Zf.sort_indices()
        for k, j in enumerate(bad):
            vals = Zf.data[Zf.indptr[k]:Zf.indptr[k + 1]]
            out_data[j, : len(vals)] = vals

    rows_coo = np.repeat(np.arange(n_rows), kJ)
    slot = np.arange(S.nnz, dtype=np.int64) - np.repeat(S.indptr[:-1], kJ)
    Z = sp.csr_matrix(
        (out_data[rows_coo, slot], S.indices.copy(), S.indptr.copy()),
        shape=S.shape,
    )
    Z.sort_indices()
    return Z


class SAISolvePlan:
    """Static-table plan for re-solving SAI/ISAI/lAIR rows on device.

    Built once from the (fixed) patterns; ``execute(aff_flat, acf_flat)``
    is pure jit-traceable: per size-bucketed chunk it gathers the dense
    local blocks from the CSR value arrays, runs one batched SVD
    least-squares (the reference's per-row gels/gesv,
    src/SAI_Zk.kokkos.cxx:13, as MXU batches), and reassembles the Z/M
    values in CSR entry order through a static gather -- no scatters.
    """

    def __init__(self, A_ff: sp.csr_matrix, A_cf, S: sp.csr_matrix,
                 incomplete: bool):
        import numpy as _np

        A_ff = sp.csr_matrix(A_ff)
        A_ff.sort_indices()
        S = sp.csr_matrix(S)
        S.sort_indices()
        self.identity_rhs = A_cf is None
        if A_cf is not None:
            A_cf = sp.csr_matrix(A_cf)
            A_cf.sort_indices()
        n_rows = S.shape[0]
        J_idx, J_mask, kJ = _pad_indices(S)
        if incomplete:
            I_idx, I_mask, kI = J_idx, J_mask, kJ
        else:
            Sh = sp.csr_matrix(
                (np.ones(S.nnz), S.indices, S.indptr), shape=S.shape
            ) @ sp.csr_matrix(
                (np.ones(A_ff.nnz), A_ff.indices, A_ff.indptr),
                shape=A_ff.shape)
            Sh.sort_indices()
            I_idx, I_mask, kI = _pad_indices(Sh)

        lookup_pos = _lookup_pos

        order = np.argsort(-kI, kind="stable")
        order = order[kJ[order] > 0]
        rows_per_chunk = max(
            1, _CHUNK_SCALARS // max(1, int(J_idx.shape[1])
                                     * (int(I_idx.shape[1])
                                        + int(J_idx.shape[1]))))
        self.chunks = []
        # CSR entry -> (position within the concatenated chunk outputs)
        out_src = np.zeros(S.nnz, dtype=np.int64)
        out_ok = np.zeros(S.nnz, dtype=bool)
        offset = 0
        for lo in range(0, len(order), rows_per_chunk):
            sel = order[lo : lo + rows_per_chunk]
            if len(sel) == 0:
                continue
            kc = int(kJ[sel].max())
            ic = int(kI[sel].max())
            Jc, Jm = J_idx[sel][:, :kc], J_mask[sel][:, :kc]
            Ic, Im = I_idx[sel][:, :ic], I_mask[sel][:, :ic]
            Mpos = lookup_pos(A_ff, Jc[:, None, :], Ic[:, :, None])
            Mpos = np.where(Im[:, :, None] & Jm[:, None, :], Mpos, -1)
            if self.identity_rhs:
                # A_cf = -I: rhs = +e_row restricted to I
                rhs_fix = np.where(
                    (Ic == sel[:, None]) & Im, 1.0, 0.0)
                chunk = dict(Mpos=Mpos, rhs_fix=rhs_fix, Jm=Jm, kc=kc)
            else:
                Rpos = lookup_pos(
                    A_cf, np.broadcast_to(sel[:, None], Ic.shape), Ic)
                Rpos = np.where(Im, Rpos, -1)
                chunk = dict(Mpos=Mpos, Rpos=Rpos, Jm=Jm, kc=kc)
            self.chunks.append(chunk)
            # output layout: chunk emits [b, kc] values; entry (row, slot)
            for bi, r in enumerate(sel):
                s0, s1 = S.indptr[r], S.indptr[r + 1]
                m = s1 - s0
                out_src[s0:s1] = offset + bi * kc + np.arange(m)
                out_ok[s0:s1] = True
            offset += len(sel) * kc
        self.out_src = out_src
        self.out_ok = out_ok
        self.total = offset
        self.nnz = S.nnz
        self.pat_S = S

    def device_tables(self):
        """Static tables as a jit-arg pytree (tuple of per-chunk dicts +
        the output gather maps) -- passed as ARGUMENTS, not closure
        constants, like every other static map in the re-setup plans."""
        import jax.numpy as jnp

        chunks = []
        for ch in self.chunks:
            d = {"Mpos": jnp.asarray(ch["Mpos"]),
                 "Jm": jnp.asarray(ch["Jm"])}
            if self.identity_rhs:
                d["rhs_fix"] = jnp.asarray(ch["rhs_fix"])
            else:
                d["Rpos"] = jnp.asarray(ch["Rpos"])
            chunks.append(d)
        return {
            "chunks": tuple(chunks),
            "out_src": jnp.asarray(np.maximum(self.out_src, 0)),
            "out_ok": jnp.asarray(self.out_ok),
        }

    def execute(self, aff_flat, acf_flat=None, tables=None):
        """Z/M values in S's CSR entry order (traced; device math)."""
        if tables is None:
            tables = self.device_tables()
        return sai_execute(tables, aff_flat, acf_flat)


def sai_execute(tables, aff_flat, acf_flat=None):
    """Run the batched local solves of a SAISolvePlan from its jit-arg
    tables (see SAISolvePlan.device_tables)."""
    import jax.numpy as jnp

    outs = []
    for ch in tables["chunks"]:
        Mpos = ch["Mpos"]
        Jm = ch["Jm"]
        kc = Jm.shape[1]
        M = jnp.where(Mpos >= 0, aff_flat[jnp.maximum(Mpos, 0)], 0.0)
        aug = (jnp.eye(kc, dtype=M.dtype)[None, :, :]
               * (~Jm)[:, None, :].astype(M.dtype))
        M_ext = jnp.concatenate([M, aug], axis=1)       # [b, ic+kc, kc]
        if "rhs_fix" in ch:
            rhs = ch["rhs_fix"].astype(M.dtype)
        else:
            Rpos = ch["Rpos"]
            rhs = -jnp.where(Rpos >= 0,
                             acf_flat[jnp.maximum(Rpos, 0)], 0.0)
        rhs_ext = jnp.concatenate(
            [rhs, jnp.zeros((rhs.shape[0], kc), dtype=rhs.dtype)],
            axis=1)
        # batched SVD least squares (rank-revealing: the reference's
        # gels/pseudo-inverse semantics, relative cutoff)
        U, sv, Vt = jnp.linalg.svd(M_ext, full_matrices=False)
        smax = jnp.max(sv, axis=1, keepdims=True)
        tiny = float(jnp.finfo(M.dtype).tiny)
        sinv = jnp.where(sv > _sv_cutoff(M.dtype) * jnp.maximum(smax, tiny),
                         1.0 / jnp.where(sv != 0, sv, 1.0), 0.0)
        utb = jnp.einsum("bij,bi->bj", U, rhs_ext)
        z = jnp.einsum("bji,bj->bi", Vt, sinv * utb)     # [b, kc]
        outs.append(z.reshape(-1))
    flat = jnp.concatenate(outs) if outs else jnp.zeros(
        0, dtype=aff_flat.dtype)
    return jnp.where(tables["out_ok"], flat[tables["out_src"]], 0.0)


def _sai_z_loop(A_ff, A_cf, S, incomplete: bool) -> sp.csr_matrix:
    """Per-row reference solve (kept as the rank-deficient fallback and the
    oracle for the batched path)."""
    n_rows = S.shape[0]
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
