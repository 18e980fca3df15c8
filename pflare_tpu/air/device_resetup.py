"""Fully-jitted device numeric re-setup: the TPU-native reuse path.

The reference's reuse story re-runs the numeric half of setup on the CPU
(or with Kokkos kernels) against stored symbolic state (reference:
src/AIR_MG_Setup.F90 reuse branches, docs/reuse.md).  On TPU the natural
form is stronger: with ``reuse_sparsity`` every pattern, product plan and
layout in the hierarchy is static, so the WHOLE numeric re-setup --
submatrix extraction, approximate-inverse assembly, Z = -A_cf A_ff^-1,
R assembly, AP/RAP, coarse drop/lump, level after level -- is one pure
function from the new matrix values to the new device hierarchy.  Compiled
once by XLA, it runs entirely on the accelerator: re-setup for a
time-dependent operator costs one h2d value upload and one program launch.

Polynomial coefficients are carried over from the previous setup (the
reference's ``-pc_air_reuse_poly_coeffs``; with unchanged patterns and
mildly drifting values this is the standard regime, docs/reuse.md).

Every static index array is passed to the jitted function as an ARGUMENT
pytree: on backends that re-stream program constants per dispatch (see
axon notes) closure-captured arrays would dominate the launch cost.

Supported configuration (others raise ValueError at plan build):
AIRG / lAIR / SAI-lAIR restrictors, one-point classical, ideal
(-inv(A_ff) A_fc) or symmetric (P = R^T) transfers, every inverse kind
(assembled power/Arnoldi/Newton, SAI/ISAI re-solves, matrix-free,
diagonal), strong-R dropping, improve_w/z iterations (incl. lAIR Z),
near-nullspace constraints (device-smoothed candidates + batched
projector corrections), F/C and full up/down smoothing, auto-truncated
hierarchies (truncation level fixed as stored structure; the probe
re-runs on device and install() flags a stale truncation), setup done
with ``reuse_sparsity=True`` and ``reuse_amount >= 3``.  Loud rejects:
lAIR z_type combined with the ideal prolongator or symmetric transfers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..inverse.build import Inverse
from ..options import AIROptions
from ..params import InverseType, ZType
from ..params import tolerances as _sigma_tols
from ..sparse import ELL
from ..sparse.dia import DIA
from ..sparse.pattern import SparsityPattern


# ~~~~~~~~~~~~~~~~~~~~~ host-side map helpers ~~~~~~~~~~~~~~~~~~~~~


def _keys(indptr, indices, n_cols):
    rows = np.repeat(np.arange(len(indptr) - 1, dtype=np.int64),
                     np.diff(indptr))
    return rows * np.int64(n_cols) + indices.astype(np.int64)


def _pos_in(src: sp.csr_matrix, dst_keys: np.ndarray) -> np.ndarray:
    """Position of each dst key inside src's (sorted) entry list; -1 when
    absent."""
    skeys = _keys(src.indptr, src.indices, src.shape[1])
    if len(skeys) == 0:
        return np.full(np.shape(dst_keys), -1, dtype=np.int64)
    pos = np.searchsorted(skeys, dst_keys)
    pos_c = np.minimum(pos, len(skeys) - 1)
    return np.where(skeys[pos_c] == dst_keys, pos_c, -1)


def _submatrix_map(A: sp.csr_matrix, sub: sp.csr_matrix,
                   row_sel: np.ndarray, col_sel: np.ndarray) -> np.ndarray:
    """For each entry (i,j) of ``sub``, its position in A's values, where
    sub was extracted as A[row_sel][:, col_sel]."""
    rows = np.repeat(row_sel[np.arange(sub.shape[0])], np.diff(sub.indptr))
    cols = col_sel[sub.indices]
    m = _pos_in(A, rows.astype(np.int64) * np.int64(A.shape[1]) + cols)
    if np.any(m < 0):
        raise ValueError("submatrix entry missing from parent pattern")
    return m


def _product_arrays(plan) -> dict:
    """SpGEMM plan triples in CSR-position space (the plan's native
    space), sorted by output position (lets XLA use the sorted-scatter
    path).  plan_fill enumerates triples row-major in C, so out_pos is
    already grouped by C row; the within-row argsort is near-free."""
    order = np.argsort(plan.out_pos_np, kind="stable")
    return {
        "a_pos": jnp.asarray(plan.a_pos_np[order]),
        "b_pos": jnp.asarray(plan.b_pos_np[order]),
        "out_pos": jnp.asarray(plan.out_pos_np[order]),
    }


def _exec_product(arrs: dict, a_flat, b_flat, nnz_out: int):
    prod = a_flat[arrs["a_pos"]] * b_flat[arrs["b_pos"]]
    return jax.ops.segment_sum(prod, arrs["out_pos"], num_segments=nnz_out,
                               indices_are_sorted=True)


def _invert_scatter(targets: np.ndarray, out_size: int):
    """Turn a static injective scatter out[targets[i]] = vals[i] into the
    gather out[j] = vals[src[j]] * mask[j].  TPU scatters run ~400x slower
    than gathers, and every layout map here is static, so all value
    placement is done in gather form."""
    src = np.zeros(out_size, dtype=np.int64)
    mask = np.zeros(out_size, dtype=np.float32)
    src[targets] = np.arange(len(targets), dtype=np.int64)
    mask[targets] = 1.0
    return {"gsrc": jnp.asarray(src), "gmask": jnp.asarray(mask)}


def _gather_place(arrs: dict, vals, dtype):
    return (vals[arrs["gsrc"]] * arrs["gmask"].astype(vals.dtype)).astype(
        dtype)


def _op_layout(op, M_host: sp.csr_matrix | None = None):
    """(kind, gather-placement arrays, static aux) for a device DIA/ELL op.
    CSR-ordered values -> op data layout, as a gather (see above).

    ``M_host``: the host CSR the op was built from.  Required for DIA ops
    -- reading entries back off the device (op.to_scipy) would be a d2h
    transfer, and on the tunneled backend ANY d2h permanently degrades
    every later dispatch (~0.1ms -> 250ms), so plan building must stay
    d2h-free."""
    if isinstance(op, DIA):
        if M_host is None:
            raise ValueError("DIA layout needs the host matrix (no d2h)")
        M = sp.csr_matrix(M_host)
        M.sort_indices()
        rows = np.repeat(np.arange(M.shape[0], dtype=np.int64),
                         np.diff(M.indptr))
        offs = M.indices - rows
        slot = np.searchsorted(np.asarray(op.offsets), offs)
        d = len(op.offsets)
        n = op.data.shape[1]
        arrs = _invert_scatter(slot * np.int64(n) + rows, d * n)
        return "dia", arrs, (op.offsets, op.shape, op.data.shape)
    from ..sparse.banded import BandedSpMV

    if isinstance(op, BandedSpMV):
        # transposed [K, n_pad] layout: entry (row, slot) -> slot*n_pad+row
        # (sparse/banded.py::from_scipy)
        if M_host is None:
            raise ValueError("banded layout needs the host matrix (no d2h)")
        M = sp.csr_matrix(M_host)
        M.sort_indices()
        counts = np.diff(M.indptr)
        rows = np.repeat(np.arange(M.shape[0], dtype=np.int64), counts)
        slot = np.arange(M.nnz, dtype=np.int64) - np.repeat(
            M.indptr[:-1], counts)
        n_pad = op.data.shape[1]
        arrs = _invert_scatter(slot * np.int64(n_pad) + rows,
                               op.data.shape[0] * n_pad)
        arrs["lcols"] = op.lcols
        return "banded", arrs, (op.data.shape, op.n, op.n_cols, op.w,
                                op.W, op.precision)
    # ELL
    pat = op.pattern
    arrs = _invert_scatter(pat.slot_of_pos, op.data.shape[0] * op.data.shape[1])
    arrs["cols"] = op.cols
    return "ell", arrs, (pat, op.data.shape)


def _build_op(kind: str, arrs: dict, aux, vals, dtype):
    if kind == "dia":
        offsets, shape, dshape = aux
        data = _gather_place(arrs, vals, dtype).reshape(dshape)
        return DIA(offsets, data, shape)
    if kind == "banded":
        from ..sparse.banded import BandedSpMV

        dshape, n, n_cols, w, W, prec = aux
        data = _gather_place(arrs, vals, dtype).reshape(dshape)
        return BandedSpMV(data, arrs["lcols"], n, n_cols, w, W,
                          precision=prec)
    pat, dshape = aux
    flat = _gather_place(arrs, vals, dtype)
    return ELL(pat, flat.reshape(dshape), arrs["cols"])


def _perm_between(src: sp.csr_matrix, dst: sp.csr_matrix,
                  row_map=None, col_map=None) -> np.ndarray:
    """dst entry -> src entry index when dst is src relabeled by
    (row_map, col_map) (bijective on entries)."""
    rows = np.repeat(np.arange(dst.shape[0], dtype=np.int64),
                     np.diff(dst.indptr))
    cols = dst.indices.astype(np.int64)
    # invert the relabeling: find src coords for each dst coord
    if row_map is not None:
        inv_r = -np.ones(dst.shape[0], dtype=np.int64)
        inv_r[row_map] = np.arange(len(row_map))
        rows = inv_r[rows]
    if col_map is not None:
        inv_c = -np.ones(dst.shape[1], dtype=np.int64)
        inv_c[col_map] = np.arange(len(col_map))
        cols = inv_c[cols]
    m = _pos_in(src, rows * np.int64(src.shape[1]) + cols)
    if np.any(m < 0):
        raise ValueError("relabel map is not a bijection on entries")
    return m


# ~~~~~~~~~~~~~~~~~~~~~ poly-plan arrays ~~~~~~~~~~~~~~~~~~~~~


def _poly_plan_arrays(plan) -> dict:
    """FixedSparsityPolyPlan re-expressed in CSR-position space.  The A->S
    injection is injective (gather form); the diagonal add is a one-hot
    mask multiply -- no scatters."""
    nnz_s = plan.pat_S.nnz
    diag_mask = np.zeros(nnz_s, dtype=np.float32)
    dp = plan.diag_pos_np
    diag_mask[dp[dp >= 0]] = 1.0
    return {
        "inject": _invert_scatter(plan.inject_pos_np, nnz_s),
        "diag_mask": jnp.asarray(diag_mask),
        "step": _product_arrays(plan.step_plan),
    }


def _diag_gather(diag_pos, flat):
    """flat[diag_pos] with 0 where the diagonal entry is absent (-1)."""
    safe = jnp.maximum(diag_pos, 0)
    return jnp.where(diag_pos >= 0, flat[safe], 0.0)


def _exec_poly(arrs: dict, order: int, nnz_s: int, a_flat, coeffs):
    """p(A) values on the plan's S pattern, CSR order (device)."""
    a_on_s = _gather_place(arrs["inject"], a_flat, a_flat.dtype)
    acc = coeffs[1] * a_on_s
    power = a_on_s
    for k in range(2, order + 1):
        power = _exec_product(arrs["step"], power, a_flat, nnz_s)
        acc = acc + coeffs[k] * power
    acc = acc + coeffs[0] * arrs["diag_mask"].astype(acc.dtype)
    return acc


def _exec_newton_poly(arrs: dict, wr, wi, nnz_s: int, a_flat, tol_zero):
    """Assembled Newton-basis inverse values on the plan's S pattern:
    M = sum T_i/theta_i with every product restricted through the SAME
    (X @ A)|_S step plan the monomial path uses -- the root schedule is
    static (reference: src/Gmres_Poly_Newtonk.kokkos.cxx:15; real
    arithmetic for conjugate pairs as inverse/build.py)."""
    T = arrs["diag_mask"].astype(a_flat.dtype)   # identity on S
    M = jnp.zeros_like(T)
    k = len(wr)
    i = 0
    while i <= k - 2:
        if wi[i] == 0.0:
            if abs(wr[i]) < tol_zero:
                i += 1
                continue
            M = M + T / wr[i]
            TA = _exec_product(arrs["step"], T, a_flat, nnz_s)
            T = T - TA / wr[i]
            i += 1
        else:
            s2 = wr[i] ** 2 + wi[i] ** 2
            if s2 < tol_zero:
                i += 2
                continue
            TA = _exec_product(arrs["step"], T, a_flat, nnz_s)
            T2 = 2.0 * wr[i] * T - TA
            M = M + T2 / s2
            if i <= k - 3:
                T = T - _exec_product(arrs["step"], T2, a_flat, nnz_s) / s2
            i += 2
    if k >= 1 and wi[k - 1] == 0.0 and abs(wr[k - 1]) > tol_zero:
        M = M + T / wr[k - 1]
    return M


# ~~~~~~~~~~~~~~~~~~~~~ inverse re-assembly ~~~~~~~~~~~~~~~~~~~~~


@dataclass
class _InvMeta:
    kind: str                       # Inverse.kind
    steps: tuple = ()
    scaled: bool = False
    meta: dict = field(default_factory=dict)
    order: int = 0
    nnz_s: int = 0                  # assembled: nnz of the plan S pattern
    op_kind: str = ""               # device op layout kind
    op_aux: object = None
    newton_wr: tuple = None         # assembled Newton: static root schedule
    newton_wi: tuple = None
    tol_zero: float = 0.0
    sai: bool = False               # assembled SAI/ISAI (solve tables)


def _inverse_plan(inv: Inverse, A_ff: sp.csr_matrix, patterns: dict,
                  plan_key: str, fine: np.ndarray, n: int,
                  ext_op, opts: AIROptions):
    """(meta, arrays) to rebuild the full-space form of ``inv`` from the
    compressed A_ff CSR values.  ``ext_op`` is the existing full-space
    device operator for the matrix-free kinds."""
    arrs: dict = {}
    meta = _InvMeta(kind=inv.kind, steps=inv.steps, scaled=inv.scaled,
                    meta=dict(inv.meta))
    diag_pos = SparsityPattern(A_ff.indptr, A_ff.indices,
                               A_ff.shape).diag_positions()
    if inv.kind == "diagonal":
        arrs["diag_pos"] = jnp.asarray(diag_pos)
        arrs["fine_g"] = _invert_scatter(fine, n)
        # weighted-Jacobi carries a weight: recover it so the rebuilt
        # diagonal is w / d_new (plain 1/d has w == 1)
        d_old = A_ff.diagonal()
        host_diag = getattr(inv, "host_diag", None)
        dvals = (np.asarray(host_diag) if host_diag is not None
                 else np.asarray(inv.diag))
        if len(dvals) == n:          # already full-space
            dvals = dvals[fine]
        w = np.where(d_old != 0, dvals * d_old, 0.0)
        arrs["w"] = jnp.asarray(w)
        meta.order = n
        return meta, arrs
    if inv.kind == "assembled" and inv.meta.get("type") in (
            int(InverseType.SAI), int(InverseType.ISAI)):
        # SAI/ISAI re-solve: static gather tables + batched in-jit SVD
        # least squares (the Kokkos re-solve sibling,
        # src/SAI_Zk.kokkos.cxx:13)
        from ..inverse.sai import SAISolvePlan

        S_csr = inv.host_csr
        if S_csr is None:
            raise ValueError("SAI re-solve needs the host inverse copy")
        S_pat = sp.csr_matrix(
            (np.ones(S_csr.nnz), S_csr.indices, S_csr.indptr),
            shape=S_csr.shape)
        sai_plan = SAISolvePlan(
            A_ff, None, S_pat,
            incomplete=(inv.meta.get("type") == int(InverseType.ISAI)))
        arrs["sai"] = sai_plan.device_tables()
        meta.sai = True
        meta.nnz_s = S_pat.nnz
        from .fullspace import _map_both as _mb2
        M_ext = _mb2(S_pat, fine, fine, n)
        kind, oarrs, oaux = _op_layout(_ext_like(ext_op, M_ext), M_ext)
        meta.op_kind, meta.op_aux = kind, oaux
        arrs["op"] = oarrs
        arrs["ext_perm"] = jnp.asarray(_perm_between(S_pat, M_ext,
                                                     row_map=fine,
                                                     col_map=fine))
        return meta, arrs
    if inv.kind == "assembled":
        plan = patterns.get(plan_key)
        if plan is None:
            raise ValueError(
                f"device re-setup needs the '{plan_key}' numeric plan; "
                "run setup with reuse_sparsity=True, reuse_amount>=3 "
                "(assembled power/arnoldi only)")
        if inv.coefficients is None:
            raise ValueError(
                "assembled inverse without stored coefficients is not "
                "supported by device re-setup")
        arrs["poly"] = _poly_plan_arrays(plan)
        if inv.meta.get("type") in (int(InverseType.NEWTON),
                                    int(InverseType.NEWTON_NO_EXTRA)):
            c = np.asarray(inv.coefficients)
            meta.newton_wr = tuple(float(v) for v in c[0])
            meta.newton_wi = tuple(float(v) for v in c[1])
            from ..params import tolerances as _tols
            meta.tol_zero = float(_tols(jnp.float64).zero)
            arrs["coeffs"] = jnp.asarray(c)
        else:
            arrs["coeffs"] = jnp.asarray(np.asarray(inv.coefficients))
        meta.order = plan.order
        meta.nnz_s = plan.pat_S.nnz
        # full-space layout: the rebuilt inverse lives exactly on the
        # plan's S pattern (the stored host matrix may have dropped
        # explicit zeros, so don't reuse its pattern)
        M_S = sp.csr_matrix(
            (np.ones(plan.pat_S.nnz), plan.pat_S.indices,
             plan.pat_S.indptr), shape=plan.pat_S.shape)
        from .fullspace import _map_both
        M_ext = _map_both(M_S, fine, fine, n)
        kind, oarrs, oaux = _op_layout(_ext_like(ext_op, M_ext), M_ext)
        meta.op_kind, meta.op_aux = kind, oaux
        arrs["op"] = oarrs
        # S-pattern entry -> ext entry permutation
        arrs["ext_perm"] = jnp.asarray(_perm_between(M_S, M_ext,
                                                     row_map=fine,
                                                     col_map=fine))
        return meta, arrs
    # matrix-free kinds: new operator values + carried coefficients
    if inv.coefficients is not None:
        arrs["coeffs"] = jnp.asarray(np.asarray(inv.coefficients))
    if inv.diag is not None:
        arrs["diag_pos"] = jnp.asarray(diag_pos)
        arrs["fine_g"] = _invert_scatter(fine, n)
    return meta, arrs


def _ext_like(ext_op, M_ext):
    """Choose the device layout for a rebuilt full-space matrix: keep the
    KIND of the existing op when it still fits (the re-setup replaces
    ops in an already-compiled solve, and a kind change would alter the
    pytree structure and force a recompile), else decide fresh."""
    from ..sparse.dia import DIA
    from .fullspace import make_op

    if isinstance(ext_op, DIA) and DIA.viable(M_ext):
        return DIA.from_scipy(M_ext)
    if isinstance(ext_op, ELL):
        return ELL.from_scipy(M_ext)
    try:
        from ..sparse.banded import BandedSpMV

        if isinstance(ext_op, BandedSpMV) and BandedSpMV.viable(M_ext):
            return BandedSpMV.from_scipy(M_ext, dtype=ext_op.dtype)
    except Exception:
        pass
    return make_op(M_ext)


def _exec_inverse(meta: _InvMeta, arrs: dict, aff_flat, ext_A_op, n: int,
                  dtype):
    if meta.kind == "diagonal":
        dvals = _diag_gather(arrs["diag_pos"], aff_flat)
        dinv = jnp.where(dvals != 0, arrs["w"] / dvals, 0.0)
        d = _gather_place(arrs["fine_g"], dinv, dtype)
        return Inverse("diagonal", diag=d, meta=meta.meta)
    if meta.kind == "assembled":
        if meta.sai:
            from ..inverse.sai import sai_execute

            m_flat = sai_execute(arrs["sai"], aff_flat)
        elif meta.newton_wr is not None:
            m_flat = _exec_newton_poly(arrs["poly"], meta.newton_wr,
                                       meta.newton_wi, meta.nnz_s,
                                       aff_flat, meta.tol_zero)
        else:
            m_flat = _exec_poly(arrs["poly"], meta.order, meta.nnz_s,
                                aff_flat, arrs["coeffs"])
        ext_vals = m_flat[arrs["ext_perm"]]
        op = _build_op(meta.op_kind, arrs["op"], meta.op_aux, ext_vals,
                       dtype)
        coeffs = arrs.get("coeffs")
        return Inverse("assembled", mat=op, meta=meta.meta,
                       coefficients=(coeffs.astype(dtype)
                                     if coeffs is not None else None))
    # matrix-free kinds run against the full-space A_ff operator
    diag = None
    if "diag_pos" in arrs:
        dvals = _diag_gather(arrs["diag_pos"], aff_flat)
        dvals = jnp.where(dvals != 0, dvals, 1.0)
        fg = arrs["fine_g"]
        diag = jnp.where(fg["gmask"] > 0,
                         dvals[fg["gsrc"]], 1.0).astype(dtype)
    coeffs = arrs.get("coeffs")
    if coeffs is not None:
        coeffs = coeffs.astype(dtype)
    return Inverse(meta.kind, mat=ext_A_op, coefficients=coeffs,
                   steps=meta.steps, diag=diag, scaled=meta.scaled,
                   meta=meta.meta)


# ~~~~~~~~~~~~~~~~~~~~~ near-nullspace constraints ~~~~~~~~~~~~~~~~~~~~~


def _matvec_arrays(M: sp.csr_matrix, transpose: bool = False) -> dict:
    """Static arrays for y = M x (or M^T x) from CSR values: gather x at
    the column of each entry, segment-sum into rows.  For the transpose
    the entries re-sort by column (a static permutation)."""
    rows = np.repeat(np.arange(M.shape[0], dtype=np.int64),
                     np.diff(M.indptr))
    cols = M.indices.astype(np.int64)
    if transpose:
        order = np.argsort(cols, kind="stable")
        return {"perm": jnp.asarray(order),
                "x_at": jnp.asarray(rows[order]),
                "out": jnp.asarray(cols[order])}
    return {"perm": None, "x_at": jnp.asarray(cols),
            "out": jnp.asarray(rows)}


def _exec_matvec(arrs: dict, m_flat, x, n_out: int):
    vals = m_flat if arrs["perm"] is None else m_flat[arrs["perm"]]
    return jax.ops.segment_sum(vals * x[arrs["x_at"]], arrs["out"],
                               num_segments=n_out, indices_are_sorted=True)


def _exec_null_smooth(mv_arrs: dict, m_flat, dpos, v, n: int, its: int):
    """Self-scaled Richardson + Jacobi on Mx=0 from guess v (the device
    form of air/constrain.py::_richardson_smooth, reference:
    src/Constrain_Z_or_W.F90:118-218)."""
    dvals = _diag_gather(dpos, m_flat)
    dinv = jnp.where(dvals != 0, 1.0 / jnp.where(dvals != 0, dvals, 1.0),
                     0.0)

    def body(x, _):
        r = -_exec_matvec(mv_arrs, m_flat, x, n)
        z = dinv * r
        Az = _exec_matvec(mv_arrs, m_flat, z, n)
        denom = jnp.dot(Az, Az)
        alpha = jnp.where(denom != 0, jnp.dot(Az, r)
                          / jnp.where(denom != 0, denom, 1.0), 0.0)
        return x + alpha * z, None

    x, _ = jax.lax.scan(body, v, None, length=its)
    return x


def _constrain_tables(M_pat: sp.csr_matrix):
    """Support-size-bucketed static tables for the row-wise projector
    correction (air/constrain.py::constrain_grid_transfer as in-jit
    batched SVD pseudo-inverses with the reference's absolute sigma
    cutoff)."""
    indptr, indices = M_pat.indptr, M_pat.indices
    row_len = np.diff(indptr)
    buckets = []
    for m in np.unique(row_len):
        if m == 0:
            continue
        rows = np.nonzero(row_len == m)[0]
        idx = indptr[rows][:, None] + np.arange(m)[None, :]
        buckets.append({
            "pos": jnp.asarray(idx),                  # entry positions
            "rows": jnp.asarray(rows),
            "cols": jnp.asarray(indices[idx].astype(np.int64)),
        })
    return tuple(buckets)


def _exec_constrain(buckets, data, b_row, b_col, sigma_drop: float):
    """data: [nnz] transfer values on the fixed pattern; b_row/b_col:
    [n_rows, k] / [n_cols, k] stacked null vectors.  Returns corrected
    data (same pattern)."""
    for bk in buckets:
        Bj = b_col[bk["cols"]]                        # [R, m, k]
        G = jnp.einsum("rmk,rml->rkl", Bj, Bj)
        vals = data[bk["pos"]]                        # [R, m]
        diff = jnp.einsum("rm,rmk->rk", vals, Bj) - b_row[bk["rows"]]
        U, sv, Vt = jnp.linalg.svd(G)
        sinv = jnp.where(jnp.abs(sv) > sigma_drop,
                         1.0 / jnp.where(sv != 0, sv, 1.0), 0.0)
        piv = jnp.einsum("rij,rj,rkj->rik",
                         jnp.swapaxes(Vt, 1, 2), sinv, U)
        corr = jnp.einsum("rkl,rl->rk", piv, diff)
        new_vals = vals - jnp.einsum("rmk,rk->rm", Bj, corr)
        data = data.at[bk["pos"].reshape(-1)].set(new_vals.reshape(-1))
    return data


# ~~~~~~~~~~~~~~~~~~~~~ the per-level plan ~~~~~~~~~~~~~~~~~~~~~


@dataclass
class _LevelMeta:
    n: int
    nnz_inv_host: int
    nnz_z: int
    nnz_zdrop: int
    nnz_ap: int
    nnz_rap: int
    nnz_coarse: int
    inv_meta: _InvMeta = None
    z_src: str = "same"               # diag-same | diag-own | same | sep
    invh_meta: _InvMeta = None        # when a separate dropped inverse
    op_kinds: dict = field(default_factory=dict)
    op_aux: dict = field(default_factory=dict)
    lump: bool = False
    has_c: bool = False
    ideal_w: bool = False
    strong_r: bool = False
    improve_w: int = 0
    improve_z: int = 0
    improve_diag: str = ""
    symmetric: bool = False
    z_lair: bool = False
    constrain_w: bool = False
    constrain_z: bool = False
    sigma_drop: float = 1e-13
    full_smooth: bool = False
    nnz_w: int = 0
    nnz_wdrop: int = 0
    invc_meta: _InvMeta = None


def _pattern_diag_only(M: sp.csr_matrix) -> bool:
    rows = np.repeat(np.arange(M.shape[0]), np.diff(M.indptr))
    return bool(np.all(rows == M.indices))


def _match_arrays(src: sp.csr_matrix, dst: sp.csr_matrix, lump: bool):
    """remove_from_sparse_match as static maps: dst values from src values
    (absent -> 0), plus lump segments (src entries outside dst added onto
    the dst diagonal of their row)."""
    dkeys = _keys(dst.indptr, dst.indices, dst.shape[1])
    src_pos_for_dst = _pos_in(src, dkeys)       # -1 -> 0 value
    out = {
        "src": jnp.asarray(np.maximum(src_pos_for_dst, 0)),
        "ok": jnp.asarray((src_pos_for_dst >= 0).astype(np.float64)),
    }
    if lump:
        skeys = _keys(src.indptr, src.indices, src.shape[1])
        in_dst = np.isin(skeys, dkeys, assume_unique=True)
        outside = np.nonzero(~in_dst)[0]
        srows = np.repeat(np.arange(src.shape[0], dtype=np.int64),
                          np.diff(src.indptr))[outside]
        dpat = SparsityPattern(dst.indptr, dst.indices, dst.shape)
        dpos = dpat.diag_positions()
        ok = dpos[srows] >= 0
        lsrc, ldst = outside[ok], dpos[srows[ok]]
        order = np.argsort(ldst, kind="stable")
        out["lump_src"] = jnp.asarray(lsrc[order])
        out["lump_dst"] = jnp.asarray(ldst[order])
    return out


# ~~~~~~~~~~~~~~~~~~~~~ the public plan ~~~~~~~~~~~~~~~~~~~~~


class DeviceResetup:
    """Callable device re-setup for a PCAIR hierarchy.

    ``plan = DeviceResetup(hierarchy, dtype)`` validates and builds the
    static maps; ``plan(A_new)`` returns ``(device_levels, coarse_inv)``
    computed entirely on device (jitted on first call).
    """

    def __init__(self, hierarchy, dtype=None):
        opts: AIROptions = hierarchy.options
        self.dtype = dtype or jnp.float64
        _validate(opts, hierarchy)
        self.meta: list[_LevelMeta] = []
        self.arrays: list[dict] = []
        self.hierarchy = hierarchy
        dev_levels = hierarchy.device_levels  # materialise layouts
        for lvl, dev in zip(hierarchy.levels, dev_levels):
            m, a = self._build_level_plan(lvl, dev, opts)
            self.meta.append(m)
            self.arrays.append(a)
        self.coarse_meta, self.coarse_arrays = self._build_coarse_plan(
            hierarchy, opts)
        # auto-truncated hierarchies re-setup with the truncation level
        # FIXED (it is part of the stored structure, like the CF
        # splitting), and the probe (reference: src/AIR_MG_Setup.F90:
        # 158-256) re-runs ON DEVICE against the rebuilt coarse values so
        # install() can flag a truncation the new values no longer justify
        self._probe = None
        self.probe_quality: float | None = None
        if hierarchy.auto_truncated:
            Ac = hierarchy.coarse_matrix
            rng = np.random.default_rng(opts.seed + 101)
            self._probe = {
                "mv": _matvec_arrays(Ac),
                "b": jnp.asarray(rng.standard_normal(Ac.shape[0])),
                "n": Ac.shape[0],
            }
        self._jitted = jax.jit(self._execute)

    # ~~~~~~~~~~ host plan build ~~~~~~~~~~

    def _build_level_plan(self, lvl, dev, opts: AIROptions):
        A, fine, coarse = lvl.A, np.asarray(lvl.fine), np.asarray(lvl.coarse)
        pats = lvl.patterns
        if getattr(lvl, "coarse_order", None) is not None:
            raise ValueError(
                "device re-setup does not support coarse-level "
                "repartitioning (reorder with an RCM-repartitioned coarse "
                "level); use the host re-setup path")
        n = lvl.n
        arrs: dict = {}
        # submatrix maps
        arrs["ff"] = jnp.asarray(_submatrix_map(A, lvl.A_ff, fine, fine))
        arrs["fc"] = jnp.asarray(_submatrix_map(A, lvl.A_fc, fine, coarse))
        cf_mat = lvl.A_cf
        if cf_mat is None:
            # rebuild for the Z product source (A_cf_drop == A_cf here)
            cf_mat = sp.csr_matrix(A[coarse][:, fine])
            cf_mat.sort_indices()
        arrs["cf"] = jnp.asarray(_submatrix_map(A, cf_mat, coarse, fine))
        z_is_lair = opts.z_type != ZType.PRODUCT
        if not z_is_lair:
            z_amat = (pats["Acf_drop"] if opts.strong_r_threshold != 0.0
                      else cf_mat)
            if z_amat.nnz != pats["Z_numeric_plan"].pat_A.nnz:
                raise ValueError(
                    "A_cf pattern differs from the stored Z plan")

        # smoothing inverse.  In full-smoothing mode the smoother acts on
        # the WHOLE level matrix in its own space: the "full-space
        # extension" becomes the identity (fine = arange), so the same
        # machinery serves both layouts (reference: PCMAT smoothing,
        # src/AIR_MG_Setup.F90:1014-1048)
        full_smooth = opts.full_smoothing_up_and_down
        if full_smooth:
            ext_A_op = dev["A"]
            inv_meta, inv_arrs = _inverse_plan(
                lvl.inv_Aff, lvl.A, pats, "inv_aff_poly_plan",
                np.arange(n, dtype=np.int64), n, ext_A_op, opts)
        else:
            ext_A_op = dev["A_ff"]
            inv_meta, inv_arrs = _inverse_plan(
                lvl.inv_Aff, lvl.A_ff, pats, "inv_aff_poly_plan", fine, n,
                ext_A_op, opts)
        arrs["inv"] = inv_arrs

        # the assembled inverse used for Z: one of four sources
        #   diag-same: the smoothing inverse is diagonal (reuse its w/d)
        #   diag-own: A_ff is diagonal-only but the smoother is mf
        #   same: the smoothing assembled inverse doubles as Z's
        #   sep: a separately assembled dropped inverse (mf smoothing)
        strong_r = opts.strong_r_threshold != 0.0
        if strong_r:
            if "Aff_drop" not in pats or "Acf_drop" not in pats:
                raise ValueError(
                    "device re-setup with strong_r_threshold needs the "
                    "stored dropped patterns (setup with reuse_sparsity, "
                    "amount>=2)")
            arrs["ffd"] = _match_arrays(lvl.A_ff, pats["Aff_drop"],
                                        lump=False)
            arrs["cfd"] = _match_arrays(cf_mat, pats["Acf_drop"],
                                        lump=False)
            if (not opts.one_point_classical_prolong
                    and pats.get("Afc_drop") is not None):
                arrs["fcd"] = _match_arrays(lvl.A_fc, pats["Afc_drop"],
                                            lump=False)
        aff_rows = np.repeat(np.arange(lvl.A_ff.shape[0]),
                             np.diff(lvl.A_ff.indptr))
        aff_diag_only = bool(np.all(aff_rows == lvl.A_ff.indices))
        invh_meta = None
        if (full_smooth and not z_is_lair and not strong_r
                and (lvl.inv_Aff.kind == "diagonal" or aff_diag_only)):
            # full smoothing with a Jacobi inverse (or diagonal A_ff): the
            # smoother's diag lives in the FULL space; Z's dropped inverse
            # is 1/diag(A_ff) gathered from the compressed values
            z_src = "diag-own"
            dpos = SparsityPattern(lvl.A_ff.indptr, lvl.A_ff.indices,
                                   lvl.A_ff.shape).diag_positions()
            arrs["invh_diag_pos"] = jnp.asarray(dpos)
        elif full_smooth and not z_is_lair and not strong_r:
            # full smoothing: the smoothing inverse acts on the WHOLE
            # matrix, so Z always rebuilds its own dropped inverse
            # (reference: src/AIR_MG_Setup.F90:1014-1048 + Z on A_ff)
            z_src = "sep"
            plan = pats.get("inv_aff_drop_poly_plan")
            if plan is None:
                raise ValueError(
                    "device re-setup with full smoothing needs the "
                    "dropped-inverse numeric plan (reuse_amount>=3)")
            coeffs = _dropped_inverse_coeffs(lvl, opts)
            invh_meta = _InvMeta(kind="assembled", order=plan.order,
                                 nnz_s=plan.pat_S.nnz)
            if opts.inverse_type in (InverseType.NEWTON,
                                     InverseType.NEWTON_NO_EXTRA):
                invh_meta.newton_wr = tuple(float(v) for v in coeffs[0])
                invh_meta.newton_wi = tuple(float(v) for v in coeffs[1])
                from ..params import tolerances as _tols
                invh_meta.tol_zero = float(_tols(jnp.float64).zero)
            arrs["invh"] = {
                "poly": _poly_plan_arrays(plan),
                "coeffs": jnp.asarray(coeffs),
            }
        elif z_is_lair:
            # lAIR / SAI-lAIR: Z rows re-solve as batched local least
            # squares over the stored distance-d sparsity (reference:
            # src/SAI_Zk.kokkos.cxx:13)
            from ..inverse.sai import SAISolvePlan

            lair_pat = pats.get("Z_lair_sparsity")
            if lair_pat is None:
                raise ValueError(
                    "device re-setup with lAIR needs the stored "
                    "distance-d sparsity (setup with reuse_sparsity, "
                    "amount>=2)")
            z_src = "lair"
            z_plan_sai = SAISolvePlan(
                lvl.A_ff, cf_mat, lair_pat,
                incomplete=(opts.z_type == ZType.LAIR))
            arrs["z_sai"] = z_plan_sai.device_tables()
            z_pat_for_drop = lair_pat
            nnz_z_val = lair_pat.nnz
        elif lvl.inv_Aff.kind == "diagonal" and not strong_r:
            z_src = "diag-same"
        elif aff_diag_only and not strong_r:
            z_src = "diag-own"
            dpos = SparsityPattern(lvl.A_ff.indptr, lvl.A_ff.indices,
                                   lvl.A_ff.shape).diag_positions()
            arrs["invh_diag_pos"] = jnp.asarray(dpos)
        elif (lvl.inv_Aff.kind == "assembled"
              and not opts.matrix_free_polys and not strong_r):
            z_src = "same"
        elif strong_r and _pattern_diag_only(pats["Aff_drop"]):
            # the DROPPED A_ff is diagonal-only: its inverse is 1/diag
            z_src = "diag-drop"
            dpos = SparsityPattern(pats["Aff_drop"].indptr,
                                   pats["Aff_drop"].indices,
                                   pats["Aff_drop"].shape).diag_positions()
            arrs["invh_diag_pos"] = jnp.asarray(dpos)
        else:
            z_src = "sep"
            plan = pats.get("inv_aff_drop_poly_plan")
            if plan is None:
                raise ValueError(
                    "device re-setup with matrix-free smoothing or "
                    "strong-R dropping needs the dropped-inverse numeric "
                    "plan (reuse_amount>=3)")
            coeffs = _dropped_inverse_coeffs(lvl, opts)
            invh_meta = _InvMeta(kind="assembled", order=plan.order,
                                 nnz_s=plan.pat_S.nnz)
            if opts.inverse_type in (InverseType.NEWTON,
                                     InverseType.NEWTON_NO_EXTRA):
                invh_meta.newton_wr = tuple(float(v) for v in coeffs[0])
                invh_meta.newton_wi = tuple(float(v) for v in coeffs[1])
                from ..params import tolerances as _tols
                invh_meta.tol_zero = float(_tols(jnp.float64).zero)
            arrs["invh"] = {
                "poly": _poly_plan_arrays(plan),
                "coeffs": jnp.asarray(coeffs),
            }
        invh_same = z_src in ("diag-same", "same")

        if not z_is_lair:
            # inverse values (CSR order, own pattern) feeding the Z plan
            zplan = pats.get("Z_numeric_plan")
            if zplan is None:
                raise ValueError("device re-setup needs Z_numeric_plan "
                                 "(setup with reuse_sparsity, amount>=2)")
            arrs["z"] = _product_arrays(zplan)
            # map the rebuilt inverse values onto zplan's B pattern (the
            # host assembled inverse may have dropped explicit zeros
            # relative to the poly plan's S pattern)
            pat_b = zplan.pat_B
            b_keys = _keys(pat_b.indptr, pat_b.indices, pat_b.shape[1])
            if z_src in ("diag-same", "diag-own", "diag-drop"):
                arrs["invh_rows"] = jnp.asarray(pat_b.row_of_pos())
            else:
                if z_src == "same" and inv_meta.sai:
                    # the SAI/ISAI inverse's own (solve sparsity) pattern
                    hc = lvl.inv_Aff.host_csr
                    s_csr = sp.csr_matrix(
                        (np.ones(hc.nnz), hc.indices, hc.indptr),
                        shape=hc.shape)
                else:
                    src_plan = (pats["inv_aff_poly_plan"]
                                if z_src == "same"
                                else pats["inv_aff_drop_poly_plan"])
                    s_csr = sp.csr_matrix(
                        (np.ones(src_plan.pat_S.nnz),
                         src_plan.pat_S.indices,
                         src_plan.pat_S.indptr),
                        shape=src_plan.pat_S.shape)
                m = _pos_in(s_csr, b_keys)
                if np.any(m < 0):
                    raise ValueError(
                        "assembled-inverse pattern does not cover the "
                        "stored Z plan pattern")
                arrs["invh_map"] = jnp.asarray(m)
            z_pat_for_drop = sp.csr_matrix(
                (np.ones(zplan.pat_C.nnz), zplan.pat_C.indices,
                 zplan.pat_C.indptr), shape=zplan.pat_C.shape)
            nnz_z_val = zplan.pat_C.nnz
        # Z -> Z_drop subset
        arrs["zdrop"] = _match_arrays(z_pat_for_drop, pats["Z_drop"],
                                      lump=False)

        # R values: Z_drop entries + identity ones
        R = lvl.R
        rrows = np.repeat(np.arange(R.shape[0], dtype=np.int64),
                          np.diff(R.indptr))
        rcols = R.indices.astype(np.int64)
        # identity entries: (i, coarse[i])
        is_ident = rcols == coarse[rrows]
        zd = pats["Z_drop"]
        inv_f = -np.ones(n, dtype=np.int64)
        inv_f[fine] = np.arange(len(fine))
        zsrc = np.zeros(len(rrows), dtype=np.int64)
        nz = ~is_ident
        zkeys = rrows[nz] * np.int64(zd.shape[1]) + inv_f[rcols[nz]]
        zpos = _pos_in(zd, zkeys)
        if np.any(zpos < 0):
            raise ValueError("R entry missing from Z_drop")
        zsrc[nz] = zpos
        arrs["r_src"] = jnp.asarray(zsrc)
        arrs["r_ident"] = jnp.asarray(is_ident.astype(np.float64))

        # products
        ap_plan = pats.get("AP_numeric_plan")
        rap_plan = pats.get("RAP_numeric_plan")
        if ap_plan is None or rap_plan is None:
            raise ValueError("device re-setup needs AP/RAP numeric plans")
        arrs["ap"] = _product_arrays(ap_plan)
        arrs["rap"] = _product_arrays(rap_plan)
        ideal_w = (not opts.one_point_classical_prolong
                   and not opts.symmetric)
        nnz_w = nnz_wdrop = 0
        if opts.symmetric:
            # P = R^T exactly: P values are a static transpose permutation
            # of R values (reference: src/AIR_Operators_Setup.F90:919-922)
            Pm0 = lvl.P
            prows0 = np.repeat(np.arange(Pm0.shape[0], dtype=np.int64),
                               np.diff(Pm0.indptr))
            m0 = _pos_in(R, Pm0.indices.astype(np.int64)
                         * np.int64(R.shape[1]) + prows0)
            if np.any(m0 < 0):
                raise ValueError("P is not R^T")
            arrs["p_from_r"] = jnp.asarray(m0)
            from .fullspace import _map_cols as _mc0
            # full-smoothing levels keep P in its own compressed space
            P_ext0 = Pm0 if full_smooth else _mc0(Pm0, coarse, n)
            op0 = dev["P"]
            kind0, oarrs0, oaux0 = _op_layout(op0, P_ext0)
            kinds_sym = (kind0, oaux0)
            arrs["op_P"] = oarrs0
            arrs["perm_P"] = jnp.asarray(
                _perm_between(Pm0, P_ext0, row_map=None,
                              col_map=None if full_smooth else coarse))
            self._sym_p_kind = kinds_sym
        elif not ideal_w:
            arrs["p_vals"] = jnp.asarray(lvl.P.data)   # static (one-point)
        else:
            wplan = pats.get("W_numeric_plan")
            if wplan is None:
                raise ValueError("device re-setup with ideal W needs the "
                                 "W numeric plan (reuse_amount>=2 setup)")
            arrs["w"] = _product_arrays(wplan)
            nnz_w = wplan.pat_C.nnz
            # inverse values onto the W plan's A pattern
            pa = wplan.pat_A
            a_keys = _keys(pa.indptr, pa.indices, pa.shape[1])
            if z_src in ("diag-same", "diag-own", "diag-drop"):
                arrs["w_inv_rows"] = jnp.asarray(pa.row_of_pos())
            else:
                if z_src == "same" and inv_meta.sai:
                    # SAI/ISAI: no poly plan exists -- the re-solved
                    # inverse lives on its own (solve sparsity) pattern
                    hc = lvl.inv_Aff.host_csr
                    s_csr2 = sp.csr_matrix(
                        (np.ones(hc.nnz), hc.indices, hc.indptr),
                        shape=hc.shape)
                else:
                    src_plan = (pats["inv_aff_poly_plan"]
                                if z_src == "same"
                                else pats["inv_aff_drop_poly_plan"])
                    s_csr2 = sp.csr_matrix(
                        (np.ones(src_plan.pat_S.nnz),
                         src_plan.pat_S.indices,
                         src_plan.pat_S.indptr),
                        shape=src_plan.pat_S.shape)
                mw = _pos_in(s_csr2, a_keys)
                if np.any(mw < 0):
                    raise ValueError("inverse pattern does not cover the "
                                     "stored W plan pattern")
                arrs["w_inv_map"] = jnp.asarray(mw)
            w_csr = sp.csr_matrix(
                (np.ones(wplan.pat_C.nnz), wplan.pat_C.indices,
                 wplan.pat_C.indptr), shape=wplan.pat_C.shape)
            arrs["wdrop"] = _match_arrays(w_csr, pats["W_drop"], lump=False)
            nnz_wdrop = pats["W_drop"].nnz
            # P values: W_drop entries on fine rows + identity on coarse
            Pm = lvl.P
            prows = np.repeat(np.arange(Pm.shape[0], dtype=np.int64),
                              np.diff(Pm.indptr))
            pcols = Pm.indices.astype(np.int64)
            inv_f2 = -np.ones(n, dtype=np.int64)
            inv_f2[fine] = np.arange(len(fine))
            is_ident_p = inv_f2[prows] < 0          # coarse rows
            wd = pats["W_drop"]
            psrc = np.zeros(len(prows), dtype=np.int64)
            nzp = ~is_ident_p
            pkeys = (inv_f2[prows[nzp]] * np.int64(wd.shape[1])
                     + pcols[nzp])
            ppos = _pos_in(wd, pkeys)
            if np.any(ppos < 0):
                raise ValueError("P entry missing from W_drop")
            psrc[nzp] = ppos
            arrs["p_src"] = jnp.asarray(psrc)
            arrs["p_ident"] = jnp.asarray(is_ident_p.astype(np.float64))
        # fixed-sparsity Richardson improvement of W/Z (reference:
        # src/Grid_Transfer_Improve.F90): residual values OUTSIDE the
        # transfer pattern are discarded by the match, so the device form
        # needs only products restricted onto the transfer pattern
        if opts.improve_w_its > 0 or opts.improve_z_its > 0:
            from ..sparse.spgemm import build_spgemm_plan

            patA_ff = SparsityPattern(lvl.A_ff.indptr, lvl.A_ff.indices,
                                      lvl.A_ff.shape)
            # D = diag of the APPROXIMATE INVERSE feeding the transfers
            # (reference: src/Grid_Transfer_Improve.F90:60-66)
            if z_src in ("diag-same", "diag-own", "diag-drop"):
                meta_imp_diag = "direct"       # invh_flat IS the diagonal
            elif z_is_lair:
                # no dropped inverse exists under lAIR: the host takes the
                # SMOOTHING inverse's diagonal (1/diag(A_ff) for mf kinds);
                # under full smoothing that inverse lives on the whole
                # matrix, so its diagonal restricts to the fine points
                if lvl.inv_Aff.kind == "diagonal":
                    meta_imp_diag = "smooth-diag"
                    if full_smooth:
                        dpos_full = SparsityPattern(
                            A.indptr, A.indices, A.shape).diag_positions()
                        arrs["impf_dpos"] = jnp.asarray(dpos_full[fine])
                        d_old = np.asarray(A.diagonal())[fine]
                        hd = np.asarray(lvl.inv_Aff.diag)
                        if hd.shape[0] == n:
                            hd = hd[fine]
                        arrs["impf_w"] = jnp.asarray(
                            np.where(d_old != 0, hd * d_old, 0.0))
                elif lvl.inv_Aff.kind == "assembled" and inv_meta.sai:
                    meta_imp_diag = "smooth-sai"
                    S_host = lvl.inv_Aff.host_csr
                    dpos2 = SparsityPattern(
                        S_host.indptr, S_host.indices,
                        S_host.shape).diag_positions()
                    arrs["imp_dpos"] = jnp.asarray(
                        dpos2[fine] if full_smooth else dpos2)
                elif lvl.inv_Aff.kind == "assembled":
                    meta_imp_diag = "smooth-pattern"
                    dpos2 = pats["inv_aff_poly_plan"].pat_S.diag_positions()
                    arrs["imp_dpos"] = jnp.asarray(
                        dpos2[fine] if full_smooth else dpos2)
                else:
                    meta_imp_diag = "aff-recip"
                    arrs["imp_dpos"] = jnp.asarray(patA_ff.diag_positions())
            else:
                if z_src == "same" and inv_meta.sai:
                    # SAI/ISAI: diag positions on the inverse's own
                    # (solve sparsity) pattern -- no poly plan exists
                    hc = lvl.inv_Aff.host_csr
                    arrs["imp_dpos"] = jnp.asarray(SparsityPattern(
                        hc.indptr, hc.indices,
                        hc.shape).diag_positions())
                else:
                    src_plan3 = (pats["inv_aff_poly_plan"]
                                 if z_src == "same"
                                 else pats["inv_aff_drop_poly_plan"])
                    arrs["imp_dpos"] = jnp.asarray(
                        src_plan3.pat_S.diag_positions())
                meta_imp_diag = "pattern"
        if opts.improve_z_its > 0:
            if z_is_lair:
                pat_Z = SparsityPattern(lair_pat.indptr, lair_pat.indices,
                                        lair_pat.shape)
            else:
                pat_Z = zplan.pat_C
            z_csr = sp.csr_matrix(
                (np.ones(pat_Z.nnz), pat_Z.indices, pat_Z.indptr),
                shape=pat_Z.shape)
            arrs["zimp"] = _product_arrays(
                build_spgemm_plan(pat_Z, patA_ff, pat_Z))
            arrs["zimp_acf"] = _match_arrays(cf_mat, z_csr, lump=False)
            arrs["zimp_cols"] = jnp.asarray(pat_Z.indices)
        if opts.improve_w_its > 0 and ideal_w:
            wplan2 = pats["W_numeric_plan"]
            pat_W = wplan2.pat_C
            w_csr2 = sp.csr_matrix(
                (np.ones(pat_W.nnz), pat_W.indices, pat_W.indptr),
                shape=pat_W.shape)
            arrs["wimp"] = _product_arrays(
                build_spgemm_plan(patA_ff, pat_W, pat_W))
            arrs["wimp_afc"] = _match_arrays(lvl.A_fc, w_csr2, lump=False)
            arrs["wimp_rows"] = jnp.asarray(pat_W.row_of_pos())
        if opts.constrain_w or opts.constrain_z:
            # near-nullspace machinery (reference: src/Constrain_Z_or_W.F90)
            patA_full = SparsityPattern(A.indptr, A.indices, A.shape)
            arrs["cn_dpos"] = jnp.asarray(patA_full.diag_positions())
            arrs["cn_fine"] = jnp.asarray(fine)
            arrs["cn_coarse"] = jnp.asarray(coarse)
            if opts.constrain_z:
                arrs["cn_mv_t"] = _matvec_arrays(A, transpose=True)
                zd = pats["Z_drop"]
                zdT = sp.csr_matrix(zd.T)
                zdT.sort_indices()
                arrs["cnz_tables"] = _constrain_tables(zdT)
                # Z_drop entry <-> transposed entry permutations
                zrows = np.repeat(np.arange(zd.shape[0], dtype=np.int64),
                                  np.diff(zd.indptr))
                order_t = np.argsort(
                    zd.indices.astype(np.int64) * np.int64(zd.shape[0])
                    + zrows, kind="stable")
                inv_t = np.empty_like(order_t)
                inv_t[order_t] = np.arange(len(order_t))
                arrs["cnz_to_t"] = jnp.asarray(order_t)
                arrs["cnz_from_t"] = jnp.asarray(inv_t)
            if opts.constrain_w:
                arrs["cn_mv"] = _matvec_arrays(A)
                arrs["cnw_tables"] = _constrain_tables(pats["W_drop"])
        rap_csr = sp.csr_matrix(
            (np.ones(rap_plan.pat_C.nnz), rap_plan.pat_C.indices,
             rap_plan.pat_C.indptr), shape=rap_plan.pat_C.shape)
        arrs["coarse"] = _match_arrays(rap_csr, pats["RAP_drop"],
                                       lump=opts.a_lump)

        # device op layouts (values only; indices/masks are reused)
        kinds, auxs = {}, {}
        from .fullspace import _map_both, _map_rows

        from .fullspace import _map_cols as _mc
        if full_smooth:
            # compressed layouts: the full-smoothing cycle consumes A, R,
            # P directly in their own spaces (air/smooth.py::vcycle_full)
            ext_maps = {
                "A": (A, A, None, None),
                "A_ff": (lvl.A_ff, lvl.A_ff, None, None),
                "A_fc": (lvl.A_fc, lvl.A_fc, None, None),
                "R": (R, R, None, None),
            }
            if ideal_w:
                ext_maps["P"] = (lvl.P, lvl.P, None, None)
        else:
            ext_maps = {
                "A_ff": (_map_both(lvl.A_ff, fine, fine, n), lvl.A_ff,
                         fine, fine),
                "A_fc": (_map_both(lvl.A_fc, fine, coarse, n), lvl.A_fc,
                         fine, coarse),
                "R": (_map_rows(R, coarse, n), R, coarse, None),
            }
            if ideal_w:
                ext_maps["P"] = (_mc(lvl.P, coarse, n), lvl.P, None,
                                 coarse)
        for name, (ext, comp, rmap, cmap) in ext_maps.items():
            op = dev[name]
            kind, oarrs, oaux = _op_layout(op, ext)
            kinds[name], auxs[name] = kind, oaux
            arrs[f"op_{name}"] = oarrs
            arrs[f"perm_{name}"] = jnp.asarray(
                _perm_between(comp, ext, row_map=rmap, col_map=cmap))

        has_c = "A_cc" in dev
        invc_meta = None
        if has_c:
            A_cc = lvl.A_cc
            A_cf2 = lvl.A_cf
            arrs["cc"] = jnp.asarray(
                _submatrix_map(A, A_cc, coarse, coarse))
            from .fullspace import _map_both as _mb
            for name, comp, rmap, cmap in (
                    ("A_cc", A_cc, coarse, coarse),
                    ("A_cf", A_cf2, coarse, fine)):
                ext = _mb(comp, rmap, cmap, n)
                op = dev[name]
                kind, oarrs, oaux = _op_layout(op, ext)
                kinds[name], auxs[name] = kind, oaux
                arrs[f"op_{name}"] = oarrs
                arrs[f"perm_{name}"] = jnp.asarray(
                    _perm_between(comp, ext, row_map=rmap, col_map=cmap))
            invc_meta, invc_arrs = _inverse_plan(
                lvl.inv_Acc, A_cc, pats, "inv_acc_poly_plan", coarse, n,
                dev["A_cc"], opts)
            arrs["invc"] = invc_arrs

        if opts.symmetric:
            kinds["P"], auxs["P"] = self._sym_p_kind
        meta = _LevelMeta(
            n=n,
            nnz_inv_host=(lvl.inv_Aff_host.nnz
                          if lvl.inv_Aff_host is not None else 0),
            nnz_z=nnz_z_val,
            nnz_zdrop=pats["Z_drop"].nnz,
            nnz_ap=ap_plan.pat_C.nnz,
            nnz_rap=rap_plan.pat_C.nnz,
            nnz_coarse=pats["RAP_drop"].nnz,
            inv_meta=inv_meta,
            z_src=z_src,
            invh_meta=invh_meta,
            op_kinds=kinds,
            op_aux=auxs,
            lump=opts.a_lump,
            has_c=has_c,
            ideal_w=ideal_w,
            strong_r=strong_r,
            improve_w=opts.improve_w_its,
            improve_z=opts.improve_z_its,
            improve_diag=(meta_imp_diag if (opts.improve_w_its
                                            or opts.improve_z_its) else ""),
            symmetric=opts.symmetric,
            z_lair=(z_src == "lair"),
            full_smooth=full_smooth,
            constrain_w=opts.constrain_w,
            constrain_z=opts.constrain_z,
            sigma_drop=float(_sigma_tols(
                np.dtype(self.dtype).type).sigma_drop),
            nnz_w=nnz_w,
            nnz_wdrop=nnz_wdrop,
            invc_meta=invc_meta,
        )
        return meta, arrs

    def _build_coarse_plan(self, hierarchy, opts: AIROptions):
        inv = hierarchy.coarse_inv
        Ac = hierarchy.coarse_matrix
        arrs: dict = {}
        meta = _InvMeta(kind=inv.kind, steps=inv.steps, scaled=inv.scaled,
                        meta=dict(inv.meta))
        pat = SparsityPattern(Ac.indptr, Ac.indices, Ac.shape)
        if inv.kind == "dense":
            rows = np.repeat(np.arange(Ac.shape[0], dtype=np.int64),
                             np.diff(Ac.indptr))
            arrs["rows"] = jnp.asarray(rows)
            arrs["cols"] = jnp.asarray(Ac.indices.astype(np.int64))
            meta.order = Ac.shape[0]
            return meta, arrs
        if inv.kind == "diagonal":
            arrs["diag_pos"] = jnp.asarray(pat.diag_positions())
            meta.order = Ac.shape[0]
            return meta, arrs
        if inv.kind == "assembled":
            if inv.coefficients is None:
                raise ValueError("assembled coarse inverse without "
                                 "coefficients not supported")
            from ..sparse.spgemm import FixedSparsityPolyPlan

            c = np.asarray(inv.coefficients)
            is_newton = inv.meta.get("type") in (
                int(InverseType.NEWTON), int(InverseType.NEWTON_NO_EXTRA))
            order = (c.shape[1] if is_newton else len(c)) - 1
            plan = FixedSparsityPolyPlan(
                pat, max(1, min(order, max(Ac.shape[0] - 1, 0))),
                opts.coarsest_inverse_sparsity_order)
            arrs["poly"] = _poly_plan_arrays(plan)
            arrs["coeffs"] = jnp.asarray(c)
            if is_newton:
                meta.newton_wr = tuple(float(v) for v in c[0])
                meta.newton_wi = tuple(float(v) for v in c[1])
                from ..params import tolerances as _tols
                meta.tol_zero = float(_tols(jnp.float64).zero)
            meta.order = plan.order
            meta.nnz_s = plan.pat_S.nnz
            # rebuilt inverse lives exactly on the plan's S pattern
            S_csr = sp.csr_matrix(
                (np.ones(plan.pat_S.nnz), plan.pat_S.indices,
                 plan.pat_S.indptr), shape=plan.pat_S.shape)
            kind, oarrs, oaux = _op_layout(_ext_like(None, S_csr), S_csr)
            meta.op_kind, meta.op_aux = kind, oaux
            arrs["op"] = oarrs
            arrs["ext_perm"] = jnp.asarray(
                np.arange(plan.pat_S.nnz, dtype=np.int64))
            return meta, arrs
        # matrix-free kinds: rebuild the ELL operator from coarse values
        E = inv.mat
        kind, oarrs, oaux = _op_layout(E)
        meta.op_kind, meta.op_aux = kind, oaux
        arrs["op"] = oarrs
        if inv.coefficients is not None:
            arrs["coeffs"] = jnp.asarray(np.asarray(inv.coefficients))
        if inv.diag is not None:
            arrs["diag_pos"] = jnp.asarray(pat.diag_positions())
        return meta, arrs

    # ~~~~~~~~~~ device execution ~~~~~~~~~~

    def _execute(self, arrays, coarse_arrays, a_flat, nulls):
        dtype = self.dtype
        levels_vals = []
        left_v, right_v = nulls
        for meta, arrs in zip(self.meta, arrays):
            lv: dict = {}
            n_lvl = meta.n
            if meta.constrain_z:
                # smooth the left vectors on A^T (reference:
                # src/Constrain_Z_or_W.F90:118-218), per candidate column
                left_v = jnp.stack([
                    _exec_null_smooth(arrs["cn_mv_t"], a_flat,
                                      arrs["cn_dpos"], left_v[:, k],
                                      n_lvl, 15)
                    for k in range(left_v.shape[1])], axis=1)
            if meta.constrain_w:
                right_v = jnp.stack([
                    _exec_null_smooth(arrs["cn_mv"], a_flat,
                                      arrs["cn_dpos"], right_v[:, k],
                                      n_lvl, 15)
                    for k in range(right_v.shape[1])], axis=1)
            aff = a_flat[arrs["ff"]]
            afc = a_flat[arrs["fc"]]
            acf = a_flat[arrs["cf"]]
            if meta.strong_r:
                affd = aff[arrs["ffd"]["src"]] * arrs["ffd"]["ok"]
                acf_z = acf[arrs["cfd"]["src"]] * arrs["cfd"]["ok"]
                afc_w = (afc[arrs["fcd"]["src"]] * arrs["fcd"]["ok"]
                         if "fcd" in arrs else afc)
            else:
                affd = aff
                acf_z = acf
                afc_w = afc
            # smoothing inverse (full-space; full-smoothing mode rebuilds
            # the level matrix itself and an inverse on it instead)
            A_ff_ext = _build_op(meta.op_kinds["A_ff"], arrs["op_A_ff"],
                                 meta.op_aux["A_ff"],
                                 aff[arrs["perm_A_ff"]], dtype)
            lv["A_ff"] = A_ff_ext
            lv["A_fc"] = _build_op(meta.op_kinds["A_fc"], arrs["op_A_fc"],
                                   meta.op_aux["A_fc"],
                                   afc[arrs["perm_A_fc"]], dtype)
            if meta.full_smooth:
                lv["A"] = _build_op(meta.op_kinds["A"], arrs["op_A"],
                                    meta.op_aux["A"],
                                    a_flat[arrs["perm_A"]], dtype)
                lv["inv_Aff"] = _exec_inverse(meta.inv_meta, arrs["inv"],
                                              a_flat, lv["A"], meta.n,
                                              dtype)
            else:
                lv["inv_Aff"] = _exec_inverse(meta.inv_meta, arrs["inv"],
                                              aff, A_ff_ext, meta.n, dtype)
            # assembled inverse values for the Z product (f64 throughout
            # the setup math; cast at the op build)
            if meta.z_lair:
                invh_flat = None
            elif meta.z_src == "same":
                im = meta.inv_meta
                if im.sai:
                    from ..inverse.sai import sai_execute as _sai_exec2

                    invh_flat = _sai_exec2(arrs["inv"]["sai"], aff)
                elif im.newton_wr is not None:
                    invh_flat = _exec_newton_poly(
                        arrs["inv"]["poly"], im.newton_wr, im.newton_wi,
                        im.nnz_s, aff, im.tol_zero)
                else:
                    invh_flat = _exec_poly(
                        arrs["inv"]["poly"], im.order, im.nnz_s, aff,
                        arrs["inv"]["coeffs"])
            elif meta.z_src == "diag-same":
                dvals = _diag_gather(arrs["inv"]["diag_pos"], aff)
                invh_flat = jnp.where(dvals != 0,
                                      arrs["inv"]["w"] / dvals, 0.0)
            elif meta.z_src == "diag-own":
                dvals = _diag_gather(arrs["invh_diag_pos"], aff)
                invh_flat = jnp.where(dvals != 0, 1.0 / dvals, 0.0)
            elif meta.z_src == "diag-drop":
                dvals = _diag_gather(arrs["invh_diag_pos"], affd)
                invh_flat = jnp.where(dvals != 0, 1.0 / dvals, 0.0)
            else:  # sep
                im = meta.invh_meta
                if im.newton_wr is not None:
                    invh_flat = _exec_newton_poly(
                        arrs["invh"]["poly"], im.newton_wr, im.newton_wi,
                        im.nnz_s, affd, im.tol_zero)
                else:
                    invh_flat = _exec_poly(
                        arrs["invh"]["poly"], im.order, im.nnz_s, affd,
                        arrs["invh"]["coeffs"])
            if meta.z_lair:
                from ..inverse.sai import sai_execute as _sai_exec

                # lAIR: Z rows from batched local solves on the stored
                # sparsity (UNdropped operators, like the host)
                z_flat = _sai_exec(arrs["z_sai"], aff, acf)
            else:
                # lay the inverse onto the Z plan's B pattern
                if "invh_rows" in arrs:
                    z_b = invh_flat[arrs["invh_rows"]]
                else:
                    z_b = invh_flat[arrs["invh_map"]]
                # Z = -(A_cf_drop @ inv)
                z_flat = -_exec_product(arrs["z"], acf_z, z_b, meta.nnz_z)
            if meta.improve_z > 0 or meta.improve_w > 0:
                if meta.improve_diag == "direct":
                    dinv = invh_flat
                elif meta.improve_diag == "pattern":
                    dinv = _diag_gather(arrs["imp_dpos"], invh_flat)
                elif meta.improve_diag == "smooth-diag":
                    if meta.full_smooth:
                        dvals = _diag_gather(arrs["impf_dpos"], a_flat)
                        dinv = jnp.where(dvals != 0,
                                         arrs["impf_w"] / dvals, 0.0)
                    else:
                        dvals = _diag_gather(arrs["inv"]["diag_pos"], aff)
                        dinv = jnp.where(dvals != 0,
                                         arrs["inv"]["w"] / dvals, 0.0)
                elif meta.improve_diag == "smooth-sai":
                    from ..inverse.sai import sai_execute as _sai_exec3

                    src2 = a_flat if meta.full_smooth else aff
                    dinv = _diag_gather(arrs["imp_dpos"],
                                        _sai_exec3(arrs["inv"]["sai"], src2))
                elif meta.improve_diag == "smooth-pattern":
                    im2 = meta.inv_meta
                    src2 = a_flat if meta.full_smooth else aff
                    if im2.newton_wr is not None:
                        m2 = _exec_newton_poly(
                            arrs["inv"]["poly"], im2.newton_wr,
                            im2.newton_wi, im2.nnz_s, src2, im2.tol_zero)
                    else:
                        m2 = _exec_poly(arrs["inv"]["poly"], im2.order,
                                        im2.nnz_s, src2,
                                        arrs["inv"]["coeffs"])
                    dinv = _diag_gather(arrs["imp_dpos"], m2)
                else:                     # aff-recip (mf smoothing kinds)
                    dvals = _diag_gather(arrs["imp_dpos"], aff)
                    dinv = jnp.where(dvals != 0, 1.0 / dvals, 0.0)
            for _ in range(meta.improve_z):
                za = _exec_product(arrs["zimp"], z_flat, aff, meta.nnz_z)
                acf_on_z = (acf[arrs["zimp_acf"]["src"]]
                            * arrs["zimp_acf"]["ok"])
                z_flat = z_flat - (acf_on_z + za) * dinv[
                    arrs["zimp_cols"]]
            zdrop = z_flat[arrs["zdrop"]["src"]] * arrs["zdrop"]["ok"]
            if meta.constrain_z:
                zt = zdrop[arrs["cnz_to_t"]]
                zt = _exec_constrain(
                    arrs["cnz_tables"], zt, left_v[arrs["cn_fine"]],
                    left_v[arrs["cn_coarse"]], meta.sigma_drop)
                zdrop = zt[arrs["cnz_from_t"]]
            # R values
            r_flat = jnp.where(arrs["r_ident"] > 0, 1.0,
                               zdrop[arrs["r_src"]])
            lv["R"] = _build_op(meta.op_kinds["R"], arrs["op_R"],
                                meta.op_aux["R"], r_flat[arrs["perm_R"]],
                                dtype)
            # RAP
            if meta.ideal_w:
                if "w_inv_rows" in arrs:
                    w_b = invh_flat[arrs["w_inv_rows"]]
                else:
                    w_b = invh_flat[arrs["w_inv_map"]]
                w_flat = -_exec_product(arrs["w"], w_b, afc_w,
                                        meta.nnz_w)
                for _ in range(meta.improve_w):
                    aw = _exec_product(arrs["wimp"], aff, w_flat,
                                       meta.nnz_w)
                    afc_on_w = (afc[arrs["wimp_afc"]["src"]]
                                * arrs["wimp_afc"]["ok"])
                    w_flat = w_flat - dinv[arrs["wimp_rows"]] * (
                        afc_on_w + aw)
                wdrop = (w_flat[arrs["wdrop"]["src"]]
                         * arrs["wdrop"]["ok"])
                if meta.constrain_w:
                    wdrop = _exec_constrain(
                        arrs["cnw_tables"], wdrop,
                        right_v[arrs["cn_fine"]],
                        right_v[arrs["cn_coarse"]], meta.sigma_drop)
                p_flat = jnp.where(arrs["p_ident"] > 0, 1.0,
                                   wdrop[arrs["p_src"]])
                lv["P"] = _build_op(meta.op_kinds["P"], arrs["op_P"],
                                    meta.op_aux["P"],
                                    p_flat[arrs["perm_P"]], dtype)
            elif meta.symmetric:
                p_flat = r_flat[arrs["p_from_r"]]
                lv["P"] = _build_op(meta.op_kinds["P"], arrs["op_P"],
                                    meta.op_aux["P"],
                                    p_flat[arrs["perm_P"]], dtype)
            else:
                p_flat = arrs["p_vals"]
            ap = _exec_product(arrs["ap"], a_flat, p_flat,
                               meta.nnz_ap)
            rap = _exec_product(arrs["rap"], r_flat, ap, meta.nnz_rap)
            cm = arrs["coarse"]
            coarse_vals = rap[cm["src"]] * cm["ok"]
            if meta.lump and "lump_src" in cm:
                coarse_vals = coarse_vals + jax.ops.segment_sum(
                    rap[cm["lump_src"]], cm["lump_dst"],
                    num_segments=meta.nnz_coarse, indices_are_sorted=True)
            if meta.has_c:
                acc = a_flat[arrs["cc"]]
                lv["A_cc"] = _build_op(
                    meta.op_kinds["A_cc"], arrs["op_A_cc"],
                    meta.op_aux["A_cc"], acc[arrs["perm_A_cc"]], dtype)
                lv["A_cf"] = _build_op(
                    meta.op_kinds["A_cf"], arrs["op_A_cf"],
                    meta.op_aux["A_cf"], acf[arrs["perm_A_cf"]], dtype)
                lv["inv_Acc"] = _exec_inverse(
                    meta.invc_meta, arrs["invc"], acc, lv["A_cc"],
                    meta.n, dtype)
            if meta.constrain_z:
                left_v = left_v[arrs["cn_coarse"]]
            if meta.constrain_w:
                right_v = right_v[arrs["cn_coarse"]]
            levels_vals.append(lv)
            a_flat = coarse_vals
        coarse_inv = self._exec_coarse(coarse_arrays, a_flat)
        quality = None
        if self._probe is not None:
            # the auto-truncation probe on the NEW values: relative
            # residual of the rebuilt coarse solver on the same seeded
            # RHS the host probe used (hierarchy._coarse_solver_quality)
            b = self._probe["b"].astype(dtype)
            x = coarse_inv.apply(b)
            r = b - _exec_matvec(self._probe["mv"], a_flat, x,
                                 self._probe["n"])
            quality = jnp.linalg.norm(r) / jnp.linalg.norm(b)
        return levels_vals, coarse_inv, quality

    def _exec_coarse(self, arrs, a_flat):
        meta = self.coarse_meta
        dtype = self.dtype
        if meta.kind == "dense":
            n = meta.order
            D = jnp.zeros((n, n), dtype=a_flat.dtype).at[
                arrs["rows"], arrs["cols"]].set(a_flat)
            return Inverse("dense", mat=jnp.linalg.inv(D).astype(dtype),
                           meta=meta.meta)
        if meta.kind == "diagonal":
            dvals = a_flat[arrs["diag_pos"]]
            ok = (arrs["diag_pos"] >= 0) & (dvals != 0)
            return Inverse("diagonal",
                           diag=jnp.where(ok, 1.0 / dvals, 0.0).astype(dtype),
                           meta=meta.meta)
        if meta.kind == "assembled":
            if meta.newton_wr is not None:
                m_flat = _exec_newton_poly(arrs["poly"], meta.newton_wr,
                                           meta.newton_wi, meta.nnz_s,
                                           a_flat, meta.tol_zero)
            else:
                m_flat = _exec_poly(arrs["poly"], meta.order, meta.nnz_s,
                                    a_flat, arrs["coeffs"])
            op = _build_op(meta.op_kind, arrs["op"], meta.op_aux,
                           m_flat[arrs["ext_perm"]], dtype)
            return Inverse("assembled", mat=op, meta=meta.meta,
                           coefficients=arrs["coeffs"].astype(dtype))
        # matrix-free
        op = _build_op(meta.op_kind, arrs["op"], meta.op_aux, a_flat, dtype)
        diag = None
        if "diag_pos" in arrs:
            # -1 marks a structurally absent diagonal (negative indexing
            # would silently wrap to the row's last stored value)
            dvals = _diag_gather(arrs["diag_pos"], a_flat)
            diag = jnp.where(dvals != 0, dvals, 1.0).astype(dtype)
        coeffs = arrs.get("coeffs")
        if coeffs is not None:
            coeffs = coeffs.astype(dtype)
        return Inverse(meta.kind, mat=op, coefficients=coeffs,
                       steps=meta.steps, diag=diag, scaled=meta.scaled,
                       meta=meta.meta)

    # ~~~~~~~~~~ public entry ~~~~~~~~~~

    def __call__(self, A_new):
        """A_new: scipy matrix with the SAME pattern as the original top
        matrix (or a flat [nnz] value array in its CSR order).  Returns
        (device_levels, coarse_inv); install with ``install()``."""
        if sp.issparse(A_new):
            M = sp.csr_matrix(A_new)
            M.sort_indices()
            # same-pattern guard: out-of-pattern values would be silently
            # mis-gathered (XLA clamps indices), so fail loudly instead
            top = self.hierarchy.levels[0].A
            if (M.nnz != top.nnz
                    or not np.array_equal(M.indptr, top.indptr)
                    or not np.array_equal(M.indices, top.indices)):
                raise ValueError(
                    "device re-setup requires the SAME sparsity pattern as "
                    "the matrix the plan was built for; run a full "
                    "setup() for a new pattern")
            vals = M.data
        else:
            vals = np.asarray(A_new)
            if len(vals) != self.hierarchy.levels[0].A.nnz:
                raise ValueError("value array length does not match the "
                                 "plan's matrix nnz")
        # internal setup math runs in the solve dtype: for f32/bf16 solves
        # the approximate-inverse hierarchy doesn't need f64 assembly (and
        # f64 is emulated on TPU); the dense coarse inverse upcasts itself
        a_flat = jnp.asarray(vals, dtype=self.dtype)
        opts = self.hierarchy.options
        n0 = self.hierarchy.levels[0].n if self.hierarchy.levels else 0
        nn = self.hierarchy.near_nullspace
        if nn is None:
            nn = [np.ones(n0)]
        stacked = jnp.asarray(np.stack(nn, axis=1), dtype=self.dtype)
        zerow = jnp.zeros((n0, 0), dtype=self.dtype)
        nulls = (stacked if opts.constrain_z else zerow,
                 stacked if opts.constrain_w else zerow)
        lvl_vals, coarse_inv, quality = self._jitted(self.arrays,
                                                     self.coarse_arrays,
                                                     a_flat, nulls)
        self.probe_quality = None if quality is None else float(quality)
        # merge: static leaves (masks, index vectors, P) come from the
        # existing device levels; rebuilt operators replace the rest
        out_levels = []
        for old, new in zip(self.hierarchy.device_levels, lvl_vals):
            d = dict(old)
            d.update(new)
            out_levels.append(d)
        return out_levels, coarse_inv

    def install(self, pc, A_new):
        """Re-setup pc's device state in place from new values.

        The host-side LevelData (coarse host matrices, stats) is left
        stale by design -- the device hierarchy and the top-level Krylov
        operator are what solves read.  A later host ``setup(...,
        structure='same')`` rebuilds host state from scratch.

        For auto-truncated hierarchies the truncation level is part of
        the stored structure and stays fixed; the truncation probe
        re-runs on device against the rebuilt coarse values, and a
        quality that no longer meets ``auto_truncate_tol`` is reported
        loudly (structure changes need a full ``setup()``)."""
        levels, coarse_inv = self(A_new)
        if (self.probe_quality is not None
                and self.probe_quality
                > self.hierarchy.options.auto_truncate_tol):
            import sys as _sys

            print(f"# device re-setup: truncation probe "
                  f"{self.probe_quality:.2e} exceeds auto_truncate_tol "
                  f"{self.hierarchy.options.auto_truncate_tol:.2e} on the "
                  "new values; structure kept -- run a full setup() to "
                  "re-truncate", file=_sys.stderr)
        pc.hierarchy.device_levels = levels
        pc.hierarchy.coarse_inv = coarse_inv
        if sp.issparse(A_new) and pc.hierarchy.levels:
            M = sp.csr_matrix(A_new)
            M.sort_indices()
            pc.hierarchy.levels[0].A = M
        return pc


def _dropped_inverse_coeffs(lvl, opts) -> np.ndarray:
    """Coefficients of the dropped assembled inverse used by Z (not stored
    on LevelData; recovered once at plan-build time).  Under strong-R
    dropping the inverse acts on the DROPPED A_ff."""
    from ..inverse.build import build_inverse

    A_use = (lvl.patterns.get("Aff_drop")
             if opts.strong_r_threshold != 0.0 else lvl.A_ff)
    if A_use is None:
        A_use = lvl.A_ff
    inv = build_inverse(
        None, opts.inverse_type,
        poly_order=opts.poly_order,
        sparsity_order=opts.inverse_sparsity_order, matrix_free=False,
        diag_scale=opts.diag_scale_polys, A_scipy=A_use, seed=opts.seed)
    if inv.coefficients is None:
        raise ValueError("dropped inverse has no polynomial coefficients")
    return np.asarray(inv.coefficients)


def _validate(opts: AIROptions, hierarchy):
    bad = []
    if (opts.z_type.name != "PRODUCT"
            and not opts.one_point_classical_prolong):
        bad.append("z_type=lair with ideal prolongator")
    if opts.z_type.name != "PRODUCT" and opts.symmetric:
        bad.append("z_type=lair with symmetric")
    if not opts.reuse_sparsity or opts.reuse_amount < 3:
        bad.append("reuse_sparsity/amount")
    if bad:
        raise ValueError(
            "device re-setup does not support: " + ", ".join(bad))
