"""Host same-pattern numeric re-setup fast path.

The reference's MAT_REUSE_MATRIX re-setup (reference:
src/AIR_Data_Type.F90:388-422 reuse tables; src/PETSc_Helper.F90:490
remove_from_sparse_match; docs/reuse.md "10-20x faster re-setup") skips
every symbolic step on a SAME_NONZERO_PATTERN rebuild: sparsity patterns,
CF splittings and product structures are pinned, and only numeric values
flow.  This module is the TPU-build's host-side realisation of that idea
taken to its limit: at the first reuse-enabled setup each level caches
*index plans* -- submatrix gather positions, SpGEMM product triples
enumerated directly onto the stored dropped patterns (with lumped
out-of-pattern redirects), and R-assembly permutations -- so a re-setup
is a chain of native streaming passes (gather / plan-execute /
poly-on-sparsity) with zero pattern discovery, zero searches and zero
CSR re-sorting.

Eligibility is the default AIRG configuration (one-point classical
prolongator, product Z, no strong-R drop, no improve/constrain, F-point
smoothing); anything else falls back to the generic reuse path in
hierarchy._build_level, which is still pattern-reusing but re-runs the
structural scaffolding per product.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..params import InverseType, ZType

_POLY_TYPES = (InverseType.POWER, InverseType.ARNOLDI)
_NEWTON_TYPES = (InverseType.NEWTON, InverseType.NEWTON_NO_EXTRA)


def eligible(opts) -> bool:
    """Static (options-level) fast-path eligibility."""
    return (opts.one_point_classical_prolong
            and opts.z_type == ZType.PRODUCT
            and opts.strong_r_threshold == 0.0
            and opts.improve_z_its == 0 and opts.improve_w_its == 0
            and not opts.constrain_z and not opts.constrain_w
            and not opts.full_smoothing_up_and_down
            and not opts.symmetric
            and not opts.matrix_free_polys
            and not opts.any_c_smooths
            and not opts.diag_scale_polys
            and opts.inverse_type in _POLY_TYPES + _NEWTON_TYPES)


def _csr_view(data: np.ndarray, like: sp.csr_matrix) -> sp.csr_matrix:
    """CSR with new values sharing ``like``'s structure arrays (O(1))."""
    out = sp.csr_matrix((data, like.indices, like.indptr), shape=like.shape)
    out.has_sorted_indices = True
    return out


def _positions_matrix(A: sp.csr_matrix) -> sp.csr_matrix:
    """A's pattern with data = CSR entry positions (exact in f64 below
    2^53 nnz): extracting THIS matrix yields gather indices into A.data."""
    return _csr_view(np.arange(A.nnz, dtype=np.float64), A)


def build_plan(lvl, A: sp.csr_matrix, AP: sp.csr_matrix, opts) -> None:
    """Cache the numeric re-setup plan on ``lvl.patterns['host_fast']``.

    Called at the end of the first reuse-enabled _build_level;
    ``AP = A @ P`` is handed in so the product pattern is not recomputed.
    """
    from .operators import extract_submatrices
    from ..native import plan_triples32_native
    from ..sparse.ops import _diag_positions

    if lvl.inv_Aff.kind not in ("assembled", "diagonal"):
        return
    inv_host = lvl.inv_Aff_host
    if inv_host is None:
        return
    if A.nnz >= 2**31 or AP.nnz >= 2**31:
        return  # int32 gather positions would wrap; generic reuse path

    pf: dict = {}
    pos = _positions_matrix(A)
    p_ff, p_fc, p_cf, _ = extract_submatrices(pos, lvl.fine, lvl.coarse,
                                              need_acc=False)
    pf["pos_ff"] = p_ff.data.astype(np.int32)
    pf["pos_fc"] = p_fc.data.astype(np.int32)
    pf["pos_cf"] = p_cf.data.astype(np.int32)
    # A_cf structure (LevelData stores A_cf=None when C-smooths are off)
    pf["cf_struct"] = p_cf

    # ~~~ inverse rebuild spec ~~~
    if lvl.inv_Aff.kind == "diagonal":
        dpos = _diag_positions(lvl.A_ff)
        pf["inv"] = ("diag",
                     np.where(dpos >= 0, pf["pos_ff"][np.maximum(dpos, 0)],
                              -1).astype(np.int32))
    else:
        from ..inverse.build import _poly_sparsity

        coeffs = np.asarray(lvl.inv_Aff.coefficients, dtype=np.float64)
        if opts.inverse_type in _NEWTON_TYPES:
            order = coeffs.shape[1] if coeffs.ndim == 2 else len(coeffs) - 1
        else:
            order = len(coeffs) - 1
        si, sx = _poly_sparsity(lvl.A_ff, opts.inverse_sparsity_order, order)
        if len(sx) != inv_host.nnz:
            return  # assembled pattern disagrees (value-pruned); fall back
        kind = "newton" if opts.inverse_type in _NEWTON_TYPES else "poly"
        pf["inv"] = (kind, si, sx)

    # ~~~ Z product straight onto the stored dropped pattern ~~~
    zd = lvl.patterns["Z_drop"]
    if zd.nnz >= 2**31:
        return
    trip = plan_triples32_native(p_cf.indptr, p_cf.indices,
                                 inv_host.indptr, inv_host.indices,
                                 zd.indptr, zd.indices, inv_host.shape[1])
    if trip is None:
        return  # no native library; generic path handles reuse
    pf["zplan"] = trip

    # ~~~ R value-assembly permutation: R = [Z I] (reference:
    # src/Grid_Transfer.F90:465); -1 marks the structural identity ones ~~~
    n_c = len(lvl.coarse)
    rows = np.concatenate([
        np.repeat(np.arange(zd.shape[0], dtype=np.int64),
                  np.diff(zd.indptr)),
        np.arange(n_c, dtype=np.int64)])
    cols = np.concatenate([np.asarray(lvl.fine)[zd.indices],
                           np.asarray(lvl.coarse)])
    vals = np.concatenate([np.arange(zd.nnz, dtype=np.float64),
                           np.full(n_c, -1.0)])
    Rp = sp.csr_matrix((vals, (rows, cols)), shape=lvl.R.shape)
    Rp.sort_indices()
    if Rp.nnz != lvl.R.nnz:
        return
    pf["rperm"] = Rp.data.astype(np.int32)

    # ~~~ AP = A @ P with all-ones P values (one-point classical W) ~~~
    trip = plan_triples32_native(A.indptr, A.indices, lvl.P.indptr,
                                 lvl.P.indices, AP.indptr, AP.indices,
                                 AP.shape[1])
    if trip is None:
        return
    pf["applan"] = (trip[0], trip[2])
    pf["ap_nnz"] = AP.nnz

    # ~~~ RAP onto the stored dropped pattern, out-of-pattern mass lumped
    # onto the diagonal when a_lump (reference: the fused a_drop/a_lump of
    # src/AIR_Operators_Setup.F90:1038-1082 under MAT_REUSE) ~~~
    rapd = lvl.patterns["RAP_drop"]
    trip = plan_triples32_native(lvl.R.indptr, lvl.R.indices, AP.indptr,
                                 AP.indices, rapd.indptr, rapd.indices,
                                 rapd.shape[1], lump=opts.a_lump)
    if trip is None:
        return
    pf["rapplan"] = trip
    lvl.patterns["host_fast"] = pf


def rebuild_level(A: sp.csr_matrix, prev, opts):
    """Numeric-only rebuild of one level from cached index plans.

    Returns a fresh LevelData sharing every structure array with ``prev``
    (the reference's MAT_REUSE_MATRIX semantics: same patterns, new
    values)."""
    import jax.numpy as jnp

    from .hierarchy import LevelData
    from ..inverse.build import Inverse
    from ..native import plan_execute_native, gather_fill_native

    from ..utils.timers import timer

    pf = prev.patterns["host_fast"]
    patterns = prev.patterns
    d = A.data

    # phase timers ("resetup_*") publish the re-setup decomposition the
    # bench reports: value-streaming floor (gathers + inverse values +
    # onto-pattern products) vs everything else (reference band:
    # docs/reuse.md:11)
    with timer("resetup_gather"):
        A_ff = _csr_view(d[pf["pos_ff"]], prev.A_ff)
        A_fc = _csr_view(d[pf["pos_fc"]], prev.A_fc)
        A_cf = _csr_view(d[pf["pos_cf"]], pf["cf_struct"])

    # ~~~ approximate inverse of A_ff ~~~
    spec = pf["inv"]
    if spec[0] == "diag":
        diagv = gather_fill_native(d, spec[1], 0.0)
        if diagv is None:
            diagv = np.where(spec[1] >= 0, d[np.maximum(spec[1], 0)], 0.0)
        inv_d = np.where(diagv != 0, 1.0 / diagv, 0.0)
        inv_Aff = Inverse("diagonal", diag=jnp.asarray(inv_d))
        inv_Aff.host_diag = inv_d
        inv_host = sp.diags(inv_d).tocsr()
        inv_host.sort_indices()
    else:
        kind, si, sx = spec
        with timer("resetup_coeffs"):
            coeffs = _inverse_coefficients(A_ff, prev, opts, kind)
        with timer("resetup_inverse"):
            if kind == "newton":
                from ..native import newton_on_sparsity_native
                from ..params import tolerances

                tol = tolerances(np.float64)
                data = newton_on_sparsity_native(A_ff, si, sx, coeffs[0],
                                                 coeffs[1], tol.zero)
                cj = jnp.asarray(np.stack([coeffs[0], coeffs[1]]))
            else:
                from ..native import poly_on_sparsity_native

                data = poly_on_sparsity_native(A_ff, si, sx, coeffs)
                cj = jnp.asarray(coeffs)
            inv_host = sp.csr_matrix((data, sx, si), shape=A_ff.shape)
            inv_host.has_sorted_indices = True
        inv_Aff = Inverse("assembled", host_csr=inv_host, mat_src=inv_host,
                          coefficients=cj,
                          meta={"type": int(opts.inverse_type)})

    # ~~~ Z = -A_cf @ inv(A_ff) directly onto the stored Z_drop pattern ~~~
    with timer("resetup_products"):
        zd_prev = patterns["Z_drop"]
        za, zb, zc = pf["zplan"]
        zvals = plan_execute_native(A_cf.data, inv_host.data, za, zb, zc,
                                    zd_prev.nnz, alpha=-1.0)
    Z_drop = _csr_view(zvals, zd_prev)
    patterns["Z_drop"] = Z_drop

    # ~~~ R = [Z I]; P unchanged (one-point W values are all 1.0) ~~~
    with timer("resetup_gather"):
        rvals = gather_fill_native(zvals, pf["rperm"], 1.0)
    R = _csr_view(rvals, prev.R)
    P = prev.P

    # ~~~ coarse matrix: AP then RAP onto the stored dropped pattern ~~~
    with timer("resetup_products"):
        apos, cpos = pf["applan"]
        ap_vals = plan_execute_native(d, None, apos, None, cpos,
                                      pf["ap_nnz"])
        ra, rb, rc = pf["rapplan"]
        rapd_prev = patterns["RAP_drop"]
        coarse_vals = plan_execute_native(rvals, ap_vals, ra, rb, rc,
                                          rapd_prev.nnz)
    coarse_A = _csr_view(coarse_vals, rapd_prev)
    patterns["RAP_drop"] = coarse_A
    patterns["coarse_A"] = coarse_A

    return LevelData(
        n=A.shape[0], fine=prev.fine, coarse=prev.coarse, A=A,
        A_ff=A_ff, A_fc=A_fc, A_cf=None, A_cc=None, R=R, P=P,
        inv_Aff=inv_Aff, inv_Acc=None, inv_Aff_host=inv_host,
        patterns=patterns,
    )


def _inverse_coefficients(A_ff, prev, opts, kind):
    """Reused coefficients when frozen, else the reference's re-iteration
    on the fresh values (reference: src/Approx_Inverse_Setup.F90:52-64 --
    reuse restores coefficients only when explicitly requested)."""
    if opts.reuse_poly_coeffs and prev.inv_Aff.coefficients is not None:
        c = np.asarray(prev.inv_Aff.coefficients, dtype=np.float64)
        return c
    matvec = lambda v: A_ff @ v
    n = A_ff.shape[0]
    if kind == "newton":
        from ..inverse.newton import newton_roots

        wr, wi = newton_roots(
            matvec, n, opts.poly_order, np.float64,
            add_roots=(opts.inverse_type == InverseType.NEWTON),
            seed=opts.seed, xp=np)
        return np.stack([wr, wi])
    from ..inverse.gmres_poly import (coefficients_arnoldi,
                                      coefficients_power)

    order = max(min(opts.poly_order, n - 1), 0)
    if opts.inverse_type == InverseType.POWER:
        return coefficients_power(matvec, n, order, np.float64,
                                  seed=opts.seed, xp=np)
    return coefficients_arnoldi(matvec, n, order, np.float64,
                                seed=opts.seed, xp=np)
