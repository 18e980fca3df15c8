"""Native host-kernel loader: compiles kernels.cpp on first use (ctypes).

Falls back to the numpy implementations transparently when no compiler is
available.  Set PFLARE_NO_NATIVE=1 to force the numpy paths (also the
debug-compare lever, mirroring the reference's PFLARE_KOKKOS_DEBUG idea of
running both implementations, reference: docs/dev/kokkos.md).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False


def _so_path():
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(here, f"_kernels_{sys.implementation.cache_tag}.so")


def _build():
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "kernels.cpp")
    out = _so_path()
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_lib():
    """The loaded ctypes library, or None if unavailable/disabled."""
    global _LIB, _TRIED
    if os.environ.get("PFLARE_NO_NATIVE") == "1":
        return None
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        path = _so_path()
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "kernels.cpp")
        if (not os.path.exists(path)
                or os.path.getmtime(path) < os.path.getmtime(src)):
            path = _build()
        lib = ctypes.CDLL(path)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.pmisr_luby.restype = ctypes.c_int
        lib.pmisr_luby.argtypes = [i64p, i64p, ctypes.c_int64, f64p, i64p,
                                   u8p, ctypes.c_int]
        i32p_ = ctypes.POINTER(ctypes.c_int32)
        lib.plan_count.restype = ctypes.c_int64
        lib.plan_count.argtypes = [i64p, i64p, i64p, ctypes.c_int64]
        lib.plan_count_i32.restype = ctypes.c_int64
        lib.plan_count_i32.argtypes = [i32p_, i32p_, i32p_, ctypes.c_int64]
        lib.plan_fill.restype = ctypes.c_int64
        lib.plan_fill.argtypes = [i64p, i64p, i64p, i64p, i64p, i64p,
                                  ctypes.c_int64, ctypes.c_int64,
                                  i64p, i64p, i64p]
        lib.plan_fill_i32.restype = ctypes.c_int64
        lib.plan_fill_i32.argtypes = [i32p_, i32p_, i32p_, i32p_, i32p_,
                                      i32p_, ctypes.c_int64, ctypes.c_int64,
                                      i64p, i64p, i64p]
        lib.drop_small.restype = None
        lib.drop_small.argtypes = [i64p, i64p, f64p, f64p, ctypes.c_int64,
                                   ctypes.c_int, ctypes.c_int, u8p, f64p]
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.drop_small_count.restype = ctypes.c_int64
        lib.drop_small_count.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                         ctypes.c_double, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, i64p]
        lib.drop_small_fill.restype = None
        lib.drop_small_fill.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                        ctypes.c_double, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, i64p, f64p]
        lib.drop_small_count_i32.restype = ctypes.c_int64
        lib.drop_small_count_i32.argtypes = [i32p, i32p, f64p,
                                             ctypes.c_int64,
                                             ctypes.c_double, ctypes.c_int,
                                             ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, i32p]
        lib.drop_small_fill_i32.restype = None
        lib.drop_small_fill_i32.argtypes = [i32p, i32p, f64p,
                                            ctypes.c_int64,
                                            ctypes.c_double, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, i32p, f64p]
        lib.spgemm_drop.restype = ctypes.c_int64
        lib.spgemm_drop.argtypes = [i64p, i64p, f64p, i64p, i64p, f64p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_double, ctypes.c_int,
                                    ctypes.c_int, i64p, i64p, f64p]
        lib.spgemm_drop_i32.restype = ctypes.c_int64
        lib.spgemm_drop_i32.argtypes = [i32p, i32p, f64p, i32p, i32p, f64p,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_double, ctypes.c_int,
                                        ctypes.c_int, i32p, i32p, f64p]
        lib.spgemm_onto_pattern.restype = None
        lib.spgemm_onto_pattern.argtypes = [
            i64p, i64p, f64p, i64p, i64p, f64p, i64p, i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, f64p]
        lib.spgemm_onto_pattern_i32.restype = None
        lib.spgemm_onto_pattern_i32.argtypes = [
            i32p, i32p, f64p, i32p, i32p, f64p, i32p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, f64p]
        lib.dd_ratio.restype = None
        lib.dd_ratio.argtypes = [i64p, i64p, f64p, u8p, ctypes.c_int64, f64p]
        lib.dd_ratio_i32.restype = None
        lib.dd_ratio_i32.argtypes = [i32p, i32p, f64p, u8p, ctypes.c_int64,
                                     f64p]
        lib.pmisr_luby_i32.restype = ctypes.c_int
        lib.pmisr_luby_i32.argtypes = [i32p, i32p, ctypes.c_int64, f64p,
                                       i64p, u8p, ctypes.c_int]
        lib.aggregation.restype = ctypes.c_int64
        lib.aggregation.argtypes = [i64p, i64p, ctypes.c_int64, i64p, i64p]
        lib.poly_on_sparsity.restype = None
        lib.poly_on_sparsity.argtypes = [i64p, i64p, f64p, i64p, i64p,
                                         ctypes.c_int64, ctypes.c_int64,
                                         f64p, ctypes.c_int64, f64p]
        lib.poly_on_sparsity_i32.restype = None
        lib.poly_on_sparsity_i32.argtypes = [i32p, i32p, f64p, i32p, i32p,
                                             ctypes.c_int64, ctypes.c_int64,
                                             f64p, ctypes.c_int64, f64p]
        lib.newton_on_sparsity.restype = None
        lib.newton_on_sparsity.argtypes = [i64p, i64p, f64p, i64p, i64p,
                                           ctypes.c_int64, ctypes.c_int64,
                                           f64p, f64p, ctypes.c_int64,
                                           ctypes.c_double, f64p]
        lib.newton_on_sparsity_i32.restype = None
        lib.newton_on_sparsity_i32.argtypes = [i32p, i32p, f64p, i32p, i32p,
                                               ctypes.c_int64,
                                               ctypes.c_int64, f64p, f64p,
                                               ctypes.c_int64,
                                               ctypes.c_double, f64p]
        lib.spgemm_count.restype = None
        lib.spgemm_count.argtypes = [i64p, i64p, i64p, i64p,
                                     ctypes.c_int64, ctypes.c_int64, i64p]
        lib.spgemm_fill.restype = None
        lib.spgemm_fill.argtypes = [i64p, i64p, f64p, i64p, i64p, f64p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    i64p, i64p, f64p]
        # split_cf: 4 ctypes signatures (index dtype x value dtype)
        for ip_, vp_, nm in ((i64p, f64p, "split_cf"),
                             (i32p, f64p, "split_cf_i32")):
            fn = getattr(lib, nm)
            fn.restype = None
            fn.argtypes = ([ip_, ip_, vp_, ctypes.c_int64, u8p, ip_]
                           + [ip_, ip_, vp_] * 4 + [ctypes.c_int])
        lib.ap_onepoint.restype = ctypes.c_int64
        lib.ap_onepoint.argtypes = [i64p, i64p, f64p, i64p, f64p,
                                    ctypes.c_int64, i64p, i64p, f64p]
        lib.ap_onepoint_i32.restype = ctypes.c_int64
        lib.ap_onepoint_i32.argtypes = [i32p, i32p, f64p, i32p, f64p,
                                        ctypes.c_int64, i32p, i32p, f64p]
        # float32-valued variants (single-precision host setup streams
        # half the bytes through these memory-bound kernels); index and
        # value dtypes are orthogonal: "_f32" = i64 idx + f32 values,
        # "_i32f32" = i32 idx + f32 values
        f32p = ctypes.POINTER(ctypes.c_float)
        i64_, f64_, int_, dbl = ctypes.c_int64, f64p, ctypes.c_int, \
            ctypes.c_double
        for ip_, isuf in ((i64p, "_f32"), (i32p, "_i32f32")):
            fn = getattr(lib, "drop_small_count" + isuf)
            fn.restype = i64_
            fn.argtypes = [ip_, ip_, f32p, i64_, dbl, int_, int_, int_,
                           int_, ip_]
            fn = getattr(lib, "drop_small_fill" + isuf)
            fn.restype = None
            fn.argtypes = [ip_, ip_, f32p, i64_, dbl, int_, int_, int_,
                           int_, ip_, f32p]
            fn = getattr(lib, "spgemm_drop" + isuf)
            fn.restype = i64_
            fn.argtypes = [ip_, ip_, f32p, ip_, ip_, f32p, i64_, i64_,
                           dbl, int_, int_, ip_, ip_, f32p]
            fn = getattr(lib, "spgemm_onto_pattern" + isuf)
            fn.restype = None
            fn.argtypes = [ip_, ip_, f32p, ip_, ip_, f32p, ip_, ip_,
                           i64_, i64_, int_, f32p]
            fn = getattr(lib, "poly_on_sparsity" + isuf)
            fn.restype = None
            fn.argtypes = [ip_, ip_, f32p, ip_, ip_, i64_, i64_, f64_,
                           i64_, f32p]
            fn = getattr(lib, "newton_on_sparsity" + isuf)
            fn.restype = None
            fn.argtypes = [ip_, ip_, f32p, ip_, ip_, i64_, i64_, f64_,
                           f64_, i64_, dbl, f32p]
            fn = getattr(lib, "dd_ratio" + isuf)
            fn.restype = None
            fn.argtypes = [ip_, ip_, f32p, u8p, i64_, f64_]
            fn = getattr(lib, "split_cf" + isuf)
            fn.restype = None
            fn.argtypes = ([ip_, ip_, f32p, i64_, u8p, ip_]
                           + [ip_, ip_, f32p] * 4 + [int_])
            fn = getattr(lib, "ap_onepoint" + isuf)
            fn.restype = i64_
            fn.argtypes = [ip_, ip_, f32p, ip_, f32p, i64_, ip_, ip_, f32p]
        lib.csr_to_ell.restype = ctypes.c_int
        lib.csr_to_ell.argtypes = [i64p, i64p, i64_, i64_, i32p, i64p]
        lib.csr_to_ell_i32.restype = ctypes.c_int
        lib.csr_to_ell_i32.argtypes = [i32p, i32p, i64_, i64_, i32p, i64p]
        lib.plan_fill_lump.restype = ctypes.c_int64
        lib.plan_fill_lump.argtypes = [i64p, i64p, i64p, i64p, i64p, i64p,
                                       ctypes.c_int64, ctypes.c_int64,
                                       i64p, i64p, i64p]
        lib.plan_fill_lump_i32.restype = ctypes.c_int64
        lib.plan_fill_lump_i32.argtypes = [i32p, i32p, i32p, i32p, i32p,
                                           i32p, ctypes.c_int64,
                                           ctypes.c_int64, i64p, i64p, i64p]
        lib.plan_execute.restype = None
        lib.plan_execute.argtypes = [f64p, f64p, i64p, i64p, i64p,
                                     ctypes.c_int64, ctypes.c_double,
                                     f64p, ctypes.c_int64]
        lib.plan_execute_i32.restype = None
        lib.plan_execute_i32.argtypes = [f64p, f64p, i32p, i32p, i32p,
                                         ctypes.c_int64, ctypes.c_double,
                                         f64p, ctypes.c_int64]
        lib.gather_fill.restype = None
        lib.gather_fill.argtypes = [f64p, i64p, ctypes.c_int64,
                                    ctypes.c_double, f64p]
        lib.gather_fill_i32.restype = None
        lib.gather_fill_i32.argtypes = [f64p, i32p, ctypes.c_int64,
                                        ctypes.c_double, f64p]
        for nm, ip_ in (("plan_fill32", i64p), ("plan_fill32_i32", i32p),
                        ("plan_fill_lump32", i64p),
                        ("plan_fill_lump32_i32", i32p)):
            fn = getattr(lib, nm)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ip_] * 6 + [ctypes.c_int64, ctypes.c_int64,
                                       i32p, i32p, i32p]
        for nm, ip_ in (("sym_union_count", i64p),
                        ("sym_union_count_i32", i32p)):
            fn = getattr(lib, nm)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ip_, ip_, ctypes.c_int64, ip_, ip_, ip_]
        f32p_ = ctypes.POINTER(ctypes.c_float)
        for nm, ip_, vp_ in (("one_point_strongest", i64p, f64p),
                             ("one_point_strongest_i32", i32p, f64p),
                             ("one_point_strongest_f32", i64p, f32p_),
                             ("one_point_strongest_i32f32", i32p, f32p_)):
            fn = getattr(lib, nm)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ip_, ip_, vp_, ctypes.c_int64, ip_]
        for nm, ip_, vp_ in (("sym_union_fill", i64p, f64p),
                             ("sym_union_fill_i32", i32p, f64p),
                             ("sym_union_fill_f32", i64p, f32p_),
                             ("sym_union_fill_i32f32", i32p, f32p_)):
            fn = getattr(lib, nm)
            fn.restype = None
            fn.argtypes = [ip_, ip_, ip_, ip_, ctypes.c_int64, ip_, ip_,
                           vp_]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _p(a, typ):
    return a.ctypes.data_as(typ)


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _val_dispatch(*arrays):
    """(numpy value dtype, ctypes value pointer, f32 flag) shared by the
    given data arrays: float32 when EVERY one is float32 (zero-copy into
    the f32 kernel variants), else float64 (converting as needed)."""
    if all(getattr(a, "dtype", None) == np.float32 for a in arrays):
        return np.float32, ctypes.POINTER(ctypes.c_float), True
    return np.float64, ctypes.POINTER(ctypes.c_double), False


def _vfn(lib, base, i32: bool, f32: bool):
    """Kernel symbol for the (index, value) dtype combination."""
    if f32:
        return getattr(lib, base + ("_i32f32" if i32 else "_f32"))
    return getattr(lib, base + ("_i32" if i32 else ""))


def pmisr_luby_native(indptr, indices, measure, cf, assigned, max_steps):
    """Returns (cf, rounds) or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    # int32 fast path: scipy hands int32 CSR; per-call int64 conversion
    # of the graph costs more than the Luby rounds on fine levels
    if (getattr(indptr, "dtype", None) == np.int32
            and getattr(indices, "dtype", None) == np.int32):
        ip, fn = ctypes.POINTER(ctypes.c_int32), lib.pmisr_luby_i32
        indptr = np.ascontiguousarray(indptr)
        indices = np.ascontiguousarray(indices)
    else:
        ip, fn = ctypes.POINTER(ctypes.c_int64), lib.pmisr_luby
        indptr = _i64(indptr)
        indices = _i64(indices)
    measure = _f64(measure)
    cf = np.ascontiguousarray(cf, dtype=np.int64)
    assigned = np.ascontiguousarray(assigned, dtype=np.uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    rounds = fn(_p(indptr, ip), _p(indices, ip),
                len(indptr) - 1, _p(measure, f64p),
                _p(cf, i64p), _p(assigned, u8p), int(max_steps))
    return cf, rounds


def plan_triples_native(a_indptr, a_indices, b_indptr, b_indices,
                        c_indptr, c_indices, n_cols):
    """Returns (a_pos, b_pos, c_pos) or None.  ``n_cols`` is the column
    count of B/C (sizes the per-row stamp table)."""
    lib = get_lib()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    arrs = (a_indptr, a_indices, b_indptr, b_indices, c_indptr, c_indices)
    if all(getattr(a, "dtype", None) == np.int32 for a in arrs):
        ip = ctypes.POINTER(ctypes.c_int32)
        count, fill = lib.plan_count_i32, lib.plan_fill_i32
        arrs = tuple(np.ascontiguousarray(a) for a in arrs)
    else:
        ip, count, fill = i64p, lib.plan_count, lib.plan_fill
        arrs = tuple(_i64(a) for a in arrs)
    a_indptr, a_indices, b_indptr, b_indices, c_indptr, c_indices = arrs
    n_rows = len(a_indptr) - 1
    total = count(_p(a_indptr, ip), _p(a_indices, ip),
                  _p(b_indptr, ip), n_rows)
    a_pos = np.empty(total, dtype=np.int64)
    b_pos = np.empty(total, dtype=np.int64)
    c_pos = np.empty(total, dtype=np.int64)
    kept = fill(_p(a_indptr, ip), _p(a_indices, ip),
                _p(b_indptr, ip), _p(b_indices, ip),
                _p(c_indptr, ip), _p(c_indices, ip), n_rows, int(n_cols),
                _p(a_pos, i64p), _p(b_pos, i64p), _p(c_pos, i64p))
    return a_pos[:kept], b_pos[:kept], c_pos[:kept]


def drop_small_native(A, tol, rel_mode, diag_strength, drop_diag_mode, lump):
    """Compact threshold-drop of a (sorted) scipy CSR matrix in one native
    count+fill sweep.  Returns the new csr_matrix, or None when native is
    unavailable or lumping would need to insert a missing diagonal (the
    caller's COO path handles that case)."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    # dispatch on scipy's index dtype -- no conversion copies either way
    i32 = A.indices.dtype == np.int32 and A.indptr.dtype == np.int32
    idt = np.int32 if i32 else np.int64
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    vdt, vp, f32 = _val_dispatch(A.data)
    count = _vfn(lib, "drop_small_count", i32, f32)
    fill = _vfn(lib, "drop_small_fill", i32, f32)
    indptr = np.ascontiguousarray(A.indptr, dtype=idt)
    indices = np.ascontiguousarray(A.indices, dtype=idt)
    data = np.ascontiguousarray(A.data, dtype=vdt)
    n_rows = A.shape[0]
    out_indptr = np.empty(n_rows + 1, dtype=idt)
    nnz = count(
        _p(indptr, ip), _p(indices, ip), _p(data, vp), n_rows,
        float(tol), int(rel_mode), int(diag_strength), int(drop_diag_mode),
        int(lump), _p(out_indptr, ip))
    if nnz < 0:
        return None
    out_cols = np.empty(nnz, dtype=idt)
    out_data = np.empty(nnz, dtype=vdt)
    fill(
        _p(indptr, ip), _p(indices, ip), _p(data, vp), n_rows,
        float(tol), int(rel_mode), int(diag_strength), int(drop_diag_mode),
        int(lump), _p(out_cols, ip), _p(out_data, vp))
    out = sp.csr_matrix((out_data, out_cols, out_indptr), shape=A.shape)
    out.has_sorted_indices = True
    return out


# Persistent output scratch for the fused SpGEMM: the triple-count upper
# bound can be ~100x the kept nnz (tens of MB/level), and allocating it
# fresh every call costs more in page-fault zeroing than the product
# itself on a 1-core host.  Grown geometrically, reused across calls.
# THREAD-LOCAL: two concurrent setups in one process (e.g. two PCAIRs
# built from different threads) must not share output buffers.
import threading as _threading_mod

_SPGEMM_SCRATCH = _threading_mod.local()


def _scratch(key, n, dtype):
    store = getattr(_SPGEMM_SCRATCH, "bufs", None)
    if store is None:
        store = _SPGEMM_SCRATCH.bufs = {}
    buf = store.get(key)
    if buf is None or buf.size < n or buf.dtype != dtype:
        buf = np.empty(int(n * 1.25) + 16, dtype=dtype)
        store[key] = buf
    return buf


def spgemm_drop_native(R, B, tol, relative, lump):
    """Fused C = drop(R @ B) with relative row tolerance and optional
    diagonal lumping -- the coarse-matrix step in one sweep.  Returns the
    dropped product, or None when unavailable / a lumped row keeps no
    diagonal (caller falls back to product-then-drop)."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    i32 = (R.indices.dtype == np.int32 and R.indptr.dtype == np.int32
           and B.indices.dtype == np.int32 and B.indptr.dtype == np.int32)
    idt = np.int32 if i32 else np.int64
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    vdt, vp, f32 = _val_dispatch(R.data, B.data)
    fn = _vfn(lib, "spgemm_drop", i32, f32)
    r_indptr = np.ascontiguousarray(R.indptr, dtype=idt)
    r_indices = np.ascontiguousarray(R.indices, dtype=idt)
    r_data = np.ascontiguousarray(R.data, dtype=vdt)
    b_indptr = np.ascontiguousarray(B.indptr, dtype=idt)
    b_indices = np.ascontiguousarray(B.indices, dtype=idt)
    b_data = np.ascontiguousarray(B.data, dtype=vdt)
    n_rows, n_cols = R.shape[0], B.shape[1]
    # upper bound on product nnz = triple count, written into the
    # persistent scratch; the kept entries are copied out exact-size
    ub = int(np.diff(B.indptr)[R.indices].sum()) if R.nnz else 0
    out_indptr = np.empty(n_rows + 1, dtype=idt)
    out_cols = _scratch(("cols", idt), max(ub, 1), idt)
    out_data = _scratch(("data", vdt), max(ub, 1), vdt)
    nnz = fn(_p(r_indptr, ip), _p(r_indices, ip), _p(r_data, vp),
             _p(b_indptr, ip), _p(b_indices, ip), _p(b_data, vp),
             n_rows, n_cols, float(tol), int(relative), int(lump),
             _p(out_indptr, ip), _p(out_cols, ip), _p(out_data, vp))
    if nnz < 0:
        return None
    out = sp.csr_matrix((out_data[:nnz].copy(), out_cols[:nnz].copy(),
                         out_indptr), shape=(n_rows, n_cols))
    out.has_sorted_indices = True
    return out


def spgemm_onto_pattern_native(A, B, P, lump: bool):
    """C|_P = (A @ B) restricted onto P's pattern, with the outside mass
    optionally lumped onto P's diagonal -- the fused numeric-only
    re-setup product (never materialises the undropped product).
    Returns a csr with P's pattern, or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    i32 = all(M.indices.dtype == np.int32 and M.indptr.dtype == np.int32
              for M in (A, B, P))
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    cvt = (lambda a: np.ascontiguousarray(a)) if i32 else _i64
    vdt, vp, f32 = _val_dispatch(A.data, B.data)
    fn = _vfn(lib, "spgemm_onto_pattern", i32, f32)
    # bind conversions to locals so the buffers outlive the C call
    aip, aix = cvt(A.indptr), cvt(A.indices)
    ad = np.ascontiguousarray(A.data, dtype=vdt)
    bip, bix = cvt(B.indptr), cvt(B.indices)
    bd = np.ascontiguousarray(B.data, dtype=vdt)
    pip_, pix = cvt(P.indptr), cvt(P.indices)
    out = np.empty(P.nnz, dtype=vdt)
    fn(_p(aip, ip), _p(aix, ip), _p(ad, vp),
       _p(bip, ip), _p(bix, ip), _p(bd, vp),
       _p(pip_, ip), _p(pix, ip),
       A.shape[0], B.shape[1], int(lump), _p(out, vp))
    res = sp.csr_matrix((out, P.indices.copy(), P.indptr.copy()),
                        shape=(A.shape[0], B.shape[1]))
    res.has_sorted_indices = True
    return res


def dd_ratio_native(indptr, indices, data, f_mask):
    lib = get_lib()
    if lib is None:
        return None
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32 = (getattr(indptr, "dtype", None) == np.int32
           and getattr(indices, "dtype", None) == np.int32)
    if i32:
        ip = ctypes.POINTER(ctypes.c_int32)
        indptr = np.ascontiguousarray(indptr)
        indices = np.ascontiguousarray(indices)
    else:
        ip = ctypes.POINTER(ctypes.c_int64)
        indptr = _i64(indptr)
        indices = _i64(indices)
    vdt, vp, f32 = _val_dispatch(data)
    fn = _vfn(lib, "dd_ratio", i32, f32)
    data = np.ascontiguousarray(data, dtype=vdt)
    fm = np.ascontiguousarray(f_mask, dtype=np.uint8)
    n = len(indptr) - 1
    out = np.zeros(n, dtype=np.float64)
    fn(_p(indptr, ip), _p(indices, ip), _p(data, vp),
       _p(fm, u8p), n, _p(out, f64p))
    return out


def _csr_index_dispatch(*mats):
    """(index_dtype, ctypes_ptr, suffix) shared by all given CSR matrices:
    int32 when every one is int32-indexed (scipy's default), else int64."""
    if all(M.indices.dtype == np.int32 and M.indptr.dtype == np.int32
           for M in mats):
        return np.int32, ctypes.POINTER(ctypes.c_int32), "_i32"
    return np.int64, ctypes.POINTER(ctypes.c_int64), ""


def aggregation_native(indptr, indices, cf, aggregates):
    """Sequential root-node aggregation sweeps (kernels.cpp aggregation);
    mutates cf/aggregates in place.  Returns the aggregate count, or None
    when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    indptr = _i64(indptr)
    indices = _i64(indices)
    assert cf.dtype == np.int64 and aggregates.dtype == np.int64
    return lib.aggregation(_p(indptr, i64p), _p(indices, i64p),
                           len(indptr) - 1, _p(cf, i64p),
                           _p(aggregates, i64p))


def poly_on_sparsity_native(A, s_indptr, s_indices, coeffs):
    """out_data = (sum_k coeffs[k] A^k)|_S on the S pattern, one native
    sweep (see kernels.cpp poly_on_sparsity).  Returns the data array in S
    CSR entry order, or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f64p = ctypes.POINTER(ctypes.c_double)
    i32 = (A.indices.dtype == np.int32 and A.indptr.dtype == np.int32
           and s_indices.dtype == np.int32 and s_indptr.dtype == np.int32)
    idt = np.int32 if i32 else np.int64
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    vdt, vp, f32 = _val_dispatch(A.data)
    fn = _vfn(lib, "poly_on_sparsity", i32, f32)
    a_indptr = np.ascontiguousarray(A.indptr, dtype=idt)
    a_indices = np.ascontiguousarray(A.indices, dtype=idt)
    a_data = np.ascontiguousarray(A.data, dtype=vdt)
    s_indptr = np.ascontiguousarray(s_indptr, dtype=idt)
    s_indices = np.ascontiguousarray(s_indices, dtype=idt)
    coeffs = _f64(coeffs)
    out = np.empty(int(s_indptr[-1]), dtype=vdt)
    fn(_p(a_indptr, ip), _p(a_indices, ip), _p(a_data, vp),
       _p(s_indptr, ip), _p(s_indices, ip), A.shape[0], A.shape[1],
       _p(coeffs, f64p), len(coeffs) - 1, _p(out, vp))
    return out


def newton_on_sparsity_native(A, s_indptr, s_indices, wr, wi, tol_zero):
    """Assembled Newton-basis inverse data on the S pattern (see
    kernels.cpp newton_on_sparsity); None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f64p = ctypes.POINTER(ctypes.c_double)
    i32 = (A.indices.dtype == np.int32 and A.indptr.dtype == np.int32
           and s_indices.dtype == np.int32 and s_indptr.dtype == np.int32)
    idt = np.int32 if i32 else np.int64
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    vdt, vp, f32 = _val_dispatch(A.data)
    fn = _vfn(lib, "newton_on_sparsity", i32, f32)
    a_indptr = np.ascontiguousarray(A.indptr, dtype=idt)
    a_indices = np.ascontiguousarray(A.indices, dtype=idt)
    a_data = np.ascontiguousarray(A.data, dtype=vdt)
    s_indptr = np.ascontiguousarray(s_indptr, dtype=idt)
    s_indices = np.ascontiguousarray(s_indices, dtype=idt)
    wr = _f64(wr)
    wi = _f64(wi)
    out = np.empty(int(s_indptr[-1]), dtype=vdt)
    fn(_p(a_indptr, ip), _p(a_indices, ip), _p(a_data, vp),
       _p(s_indptr, ip), _p(s_indices, ip), A.shape[0], A.shape[1],
       _p(wr, f64p), _p(wi, f64p), len(wr), float(tol_zero), _p(out, vp))
    return out


def split_cf_native(A, fine, coarse, need_cc: bool):
    """(A_ff, A_fc, A_cf, A_cc) extracted in ONE streaming pass over A by
    the CF classes (kernels.cpp split_cf) -- replaces scipy's per-block
    double fancy-indexing + re-sorts.  fine/coarse are sorted ascending
    index arrays partitioning range(n).  Returns the 4 csr matrices
    (A_cc None unless need_cc), or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    n = A.shape[0]
    if len(fine) + len(coarse) != n:   # guard: fine/coarse must partition
        return None                    # range(n) or the row routing walks
    i32 = A.indices.dtype == np.int32 and A.indptr.dtype == np.int32
    idt = np.int32 if i32 else np.int64
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    vdt, vp, f32 = _val_dispatch(A.data)
    fn = _vfn(lib, "split_cf", i32, f32)
    indptr = np.ascontiguousarray(A.indptr, dtype=idt)
    indices = np.ascontiguousarray(A.indices, dtype=idt)
    data = np.ascontiguousarray(A.data, dtype=vdt)
    n_f, n_c = len(fine), len(coarse)
    is_fine = np.zeros(n, dtype=np.uint8)
    is_fine[fine] = 1
    col_new = np.empty(n, dtype=idt)      # position within its class
    col_new[fine] = np.arange(n_f, dtype=idt)
    col_new[coarse] = np.arange(n_c, dtype=idt)
    nnz = A.nnz
    ff_ip = np.empty(n_f + 1, dtype=idt)
    fc_ip = np.empty(n_f + 1, dtype=idt)
    cf_ip = np.empty(n_c + 1, dtype=idt)
    cc_ip = np.empty(n_c + 1, dtype=idt)
    # entry routing is exclusive, so per-block upper bound = nnz(A); the
    # persistent scratch avoids re-faulting tens of MB per level
    bufs = [(_scratch(("split_cols", k, idt), max(nnz, 1), idt),
             _scratch(("split_data", k, vdt), max(nnz, 1), vdt))
            for k in range(4)]
    fn(_p(indptr, ip), _p(indices, ip), _p(data, vp), n,
       _p(is_fine, ctypes.POINTER(ctypes.c_uint8)), _p(col_new, ip),
       _p(ff_ip, ip), _p(bufs[0][0], ip), _p(bufs[0][1], vp),
       _p(fc_ip, ip), _p(bufs[1][0], ip), _p(bufs[1][1], vp),
       _p(cf_ip, ip), _p(bufs[2][0], ip), _p(bufs[2][1], vp),
       _p(cc_ip, ip), _p(bufs[3][0], ip), _p(bufs[3][1], vp),
       int(need_cc))

    def _mk(indp, cols, dat, shape, m):
        M = sp.csr_matrix((dat[:m].copy(), cols[:m].copy(), indp),
                          shape=shape)
        M.has_sorted_indices = True
        return M

    A_ff = _mk(ff_ip, *bufs[0], (n_f, n_f), int(ff_ip[-1]))
    A_fc = _mk(fc_ip, *bufs[1], (n_f, n_c), int(fc_ip[-1]))
    A_cf = _mk(cf_ip, *bufs[2], (n_c, n_f), int(cf_ip[-1]))
    A_cc = (_mk(cc_ip, *bufs[3], (n_c, n_c), int(cc_ip[-1]))
            if need_cc else None)
    return A_ff, A_fc, A_cf, A_cc


def ap_onepoint_native(A, P):
    """C = A @ P when every row of P holds at most ONE entry (the
    one-point classical prolongator P = [W; I], the default config): the
    product degenerates to a streaming column relabel + per-row duplicate
    merge (kernels.cpp ap_onepoint) instead of a Gustavson SpGEMM with a
    dense accumulator over n_c columns.  The caller checks P's row widths;
    returns the product csr, or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    i32 = A.indices.dtype == np.int32 and A.indptr.dtype == np.int32
    idt = np.int32 if i32 else np.int64
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    vdt, vp, f32 = _val_dispatch(A.data, P.data)
    fn = _vfn(lib, "ap_onepoint", i32, f32)
    indptr = np.ascontiguousarray(A.indptr, dtype=idt)
    indices = np.ascontiguousarray(A.indices, dtype=idt)
    data = np.ascontiguousarray(A.data, dtype=vdt)
    n_rows = A.shape[0]
    # dense per-row (column, value) view of P; -1 marks an empty row
    pcol = np.full(P.shape[0], -1, dtype=idt)
    pval = np.zeros(P.shape[0], dtype=vdt)
    prows = np.flatnonzero(np.diff(P.indptr) == 1)
    pcol[prows] = P.indices
    pval[prows] = P.data
    out_indptr = np.empty(n_rows + 1, dtype=idt)
    ub = max(A.nnz, 1)                 # <=1 output entry per A entry
    out_cols = _scratch(("ap_cols", idt), ub, idt)
    out_data = _scratch(("ap_data", vdt), ub, vdt)
    nnz = fn(_p(indptr, ip), _p(indices, ip), _p(data, vp),
             _p(pcol, ip), _p(pval, vp), n_rows,
             _p(out_indptr, ip), _p(out_cols, ip), _p(out_data, vp))
    out = sp.csr_matrix((out_data[:nnz].copy(), out_cols[:nnz].copy(),
                         out_indptr), shape=(n_rows, P.shape[1]))
    out.has_sorted_indices = True
    return out


def spgemm_native(A, B):
    """C = A @ B for scipy CSR inputs via the native kernels; None if
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    B = sp.csr_matrix(B)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    a_indptr = _i64(A.indptr)
    a_indices = _i64(A.indices)
    a_data = _f64(A.data)
    b_indptr = _i64(B.indptr)
    b_indices = _i64(B.indices)
    b_data = _f64(B.data)
    n_rows, n_cols = A.shape[0], B.shape[1]
    c_indptr = np.zeros(n_rows + 1, dtype=np.int64)
    lib.spgemm_count(_p(a_indptr, i64p), _p(a_indices, i64p),
                     _p(b_indptr, i64p), _p(b_indices, i64p),
                     n_rows, n_cols, _p(c_indptr, i64p))
    nnz = int(c_indptr[-1])
    c_indices = np.empty(nnz, dtype=np.int64)
    c_data = np.empty(nnz, dtype=np.float64)
    lib.spgemm_fill(_p(a_indptr, i64p), _p(a_indices, i64p), _p(a_data, f64p),
                    _p(b_indptr, i64p), _p(b_indices, i64p), _p(b_data, f64p),
                    n_rows, n_cols, _p(c_indptr, i64p), _p(c_indices, i64p),
                    _p(c_data, f64p))
    C = sp.csr_matrix((c_data, c_indices, c_indptr),
                      shape=(n_rows, n_cols))
    # rows are already column-sorted
    C.has_sorted_indices = True
    return C


def csr_to_ell_native(indptr, indices, n_rows: int, K: int):
    """Padded-ELL layout of a sorted CSR pattern in one native pass:
    returns (ell_cols [n_rows, K] int32, slot_of_pos [nnz] int64) or None
    when native is unavailable.  Padded slots hold column 0 (their values
    are 0 so they contribute nothing to a SpMV)."""
    lib = get_lib()
    if lib is None:
        return None
    if (getattr(indptr, "dtype", None) == np.int32
            and getattr(indices, "dtype", None) == np.int32):
        ip, fn = ctypes.POINTER(ctypes.c_int32), lib.csr_to_ell_i32
        indptr = np.ascontiguousarray(indptr)
        indices = np.ascontiguousarray(indices)
    else:
        ip, fn = ctypes.POINTER(ctypes.c_int64), lib.csr_to_ell
        indptr = _i64(indptr)
        indices = _i64(indices)
    nnz = int(indptr[-1])
    ell_cols = np.empty((n_rows, int(K)), dtype=np.int32)
    slot_of_pos = np.empty(nnz, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = fn(_p(indptr, ip), _p(indices, ip), int(n_rows), int(K),
            _p(ell_cols, i32p), _p(slot_of_pos, i64p))
    if rc != 0:
        raise ValueError(
            f"csr_to_ell: a row exceeds the padded width K={K}")
    return ell_cols, slot_of_pos


def plan_triples_lump_native(a_indptr, a_indices, b_indptr, b_indices,
                             c_indptr, c_indices, n_cols):
    """Triples of C = A@B where out-of-pattern products are redirected to
    C's structural diagonal of their row (fused drop+lump of the RAP
    re-product).  Returns (a_pos, b_pos, c_pos) int64 or None."""
    lib = get_lib()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    arrs = (a_indptr, a_indices, b_indptr, b_indices, c_indptr, c_indices)
    if all(getattr(a, "dtype", None) == np.int32 for a in arrs):
        ip = ctypes.POINTER(ctypes.c_int32)
        count, fill = lib.plan_count_i32, lib.plan_fill_lump_i32
        arrs = tuple(np.ascontiguousarray(a) for a in arrs)
    else:
        ip, count, fill = i64p, lib.plan_count, lib.plan_fill_lump
        arrs = tuple(_i64(a) for a in arrs)
    a_indptr, a_indices, b_indptr, b_indices, c_indptr, c_indices = arrs
    n_rows = len(a_indptr) - 1
    total = count(_p(a_indptr, ip), _p(a_indices, ip),
                  _p(b_indptr, ip), n_rows)
    a_pos = np.empty(total, dtype=np.int64)
    b_pos = np.empty(total, dtype=np.int64)
    c_pos = np.empty(total, dtype=np.int64)
    kept = fill(_p(a_indptr, ip), _p(a_indices, ip),
                _p(b_indptr, ip), _p(b_indices, ip),
                _p(c_indptr, ip), _p(c_indices, ip), n_rows, int(n_cols),
                _p(a_pos, i64p), _p(b_pos, i64p), _p(c_pos, i64p))
    return a_pos[:kept], b_pos[:kept], c_pos[:kept]


def plan_execute_native(a_data, b_data, a_pos, b_pos, c_pos, nnz_out,
                        alpha=1.0):
    """out[c[k]] += alpha * a[a[k]] * (b[b[k]] if b is not None else 1)
    over k ascending (bitwise-identical accumulation order to a numpy
    bincount over the same triples).  Returns the out array or None."""
    lib = get_lib()
    if lib is None:
        return None
    f64p = ctypes.POINTER(ctypes.c_double)
    pos = (a_pos, c_pos) + (() if b_pos is None else (b_pos,))
    i32 = all(getattr(p_, "dtype", None) == np.int32 for p_ in pos)
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    conv = (lambda a: np.ascontiguousarray(a)) if i32 else _i64
    fn = lib.plan_execute_i32 if i32 else lib.plan_execute
    a_data = _f64(a_data)
    a_pos = conv(a_pos)
    c_pos = conv(c_pos)
    out = np.empty(int(nnz_out), dtype=np.float64)
    if b_data is None:
        bp, bpp = None, None
    else:
        b_data = _f64(b_data)
        b_pos = conv(b_pos)
        bp, bpp = _p(b_data, f64p), _p(b_pos, ip)
    fn(_p(a_data, f64p), bp, _p(a_pos, ip), bpp,
       _p(c_pos, ip), len(a_pos), float(alpha),
       _p(out, f64p), int(nnz_out))
    return out


def gather_fill_native(src, idx, fill):
    """out[k] = src[idx[k]] if idx[k] >= 0 else fill.  Returns the array
    or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f64p = ctypes.POINTER(ctypes.c_double)
    src = _f64(src)
    if getattr(idx, "dtype", None) == np.int32:
        idx = np.ascontiguousarray(idx)
        ip, fn = ctypes.POINTER(ctypes.c_int32), lib.gather_fill_i32
    else:
        idx = _i64(idx)
        ip, fn = ctypes.POINTER(ctypes.c_int64), lib.gather_fill
    out = np.empty(len(idx), dtype=np.float64)
    fn(_p(src, f64p), _p(idx, ip), len(idx), float(fill), _p(out, f64p))
    return out


def plan_triples32_native(a_indptr, a_indices, b_indptr, b_indices,
                          c_indptr, c_indices, n_cols, lump=False):
    """Like plan_triples_native/plan_triples_lump_native but emits int32
    position arrays directly (half the triple-stream memory; valid for
    single-host nnz counts).  Returns (a_pos, b_pos, c_pos) or None."""
    lib = get_lib()
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    arrs = (a_indptr, a_indices, b_indptr, b_indices, c_indptr, c_indices)
    if all(getattr(a, "dtype", None) == np.int32 for a in arrs):
        ip = i32p
        count = lib.plan_count_i32
        fill = (lib.plan_fill_lump32_i32 if lump else lib.plan_fill32_i32)
        arrs = tuple(np.ascontiguousarray(a) for a in arrs)
    else:
        ip = ctypes.POINTER(ctypes.c_int64)
        count = lib.plan_count
        fill = lib.plan_fill_lump32 if lump else lib.plan_fill32
        arrs = tuple(_i64(a) for a in arrs)
    a_indptr, a_indices, b_indptr, b_indices, c_indptr, c_indices = arrs
    n_rows = len(a_indptr) - 1
    total = count(_p(a_indptr, ip), _p(a_indices, ip),
                  _p(b_indptr, ip), n_rows)
    if total >= 2**31:
        return (plan_triples_lump_native if lump else plan_triples_native)(
            a_indptr, a_indices, b_indptr, b_indices, c_indptr, c_indices,
            n_cols)
    a_pos = np.empty(total, dtype=np.int32)
    b_pos = np.empty(total, dtype=np.int32)
    c_pos = np.empty(total, dtype=np.int32)
    kept = fill(_p(a_indptr, ip), _p(a_indices, ip),
                _p(b_indptr, ip), _p(b_indices, ip),
                _p(c_indptr, ip), _p(c_indices, ip), n_rows, int(n_cols),
                _p(a_pos, i32p), _p(b_pos, i32p), _p(c_pos, i32p))
    return a_pos[:kept], b_pos[:kept], c_pos[:kept]


def symmetrize_pattern_native(S):
    """Union pattern S | S^T with unit values (the strength-matrix
    symmetrization whose values are overwritten to 1.0; reference:
    src/SAbs.F90 S + S^T).  Returns a sorted csr or None."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    n = S.shape[0]
    if S.shape[1] != n:
        return None
    i32 = (S.indptr.dtype == np.int32 and S.indices.dtype == np.int32)
    idt = np.int32 if i32 else np.int64
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    vdt, vp, f32 = _val_dispatch(S.data)
    count = lib.sym_union_count_i32 if i32 else lib.sym_union_count
    fill = _vfn(lib, "sym_union_fill", i32, f32)
    indptr = np.ascontiguousarray(S.indptr, dtype=idt)
    indices = np.ascontiguousarray(S.indices, dtype=idt)
    t_indptr = np.empty(n + 1, dtype=idt)
    t_indices = _scratch(("symT", idt), max(S.nnz, 1), idt)
    rowcnt = np.empty(n, dtype=idt)
    total = count(_p(indptr, ip), _p(indices, ip), n,
                  _p(t_indptr, ip), _p(t_indices, ip), _p(rowcnt, ip))
    out_indptr = np.zeros(n + 1, dtype=idt)
    np.cumsum(rowcnt, out=out_indptr[1:])
    out_indices = np.empty(total, dtype=idt)
    out_data = np.empty(total, dtype=vdt)
    fill(_p(indptr, ip), _p(indices, ip), _p(t_indptr, ip),
         _p(t_indices, ip), n, _p(out_indptr, ip), _p(out_indices, ip),
         _p(out_data, vp))
    out = sp.csr_matrix((out_data, out_indices, out_indptr), shape=S.shape)
    out.has_sorted_indices = True
    return out


def one_point_strongest_native(A):
    """W: one strongest-|entry| column per row (lowest-column tie-break;
    reference: src/Grid_Transfer.F90:26).  Returns a sorted unit-valued
    csr, or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    n_rows = A.shape[0]
    i32 = (A.indptr.dtype == np.int32 and A.indices.dtype == np.int32)
    idt = np.int32 if i32 else np.int64
    ip = ctypes.POINTER(ctypes.c_int32 if i32 else ctypes.c_int64)
    vdt, vp, f32 = _val_dispatch(A.data)
    fn = _vfn(lib, "one_point_strongest", i32, f32)
    indptr = np.ascontiguousarray(A.indptr, dtype=idt)
    indices = np.ascontiguousarray(A.indices, dtype=idt)
    data = np.ascontiguousarray(A.data, dtype=vdt)
    out_cols = np.empty(n_rows, dtype=idt)
    cnt = fn(_p(indptr, ip), _p(indices, ip), _p(data, vp), n_rows,
             _p(out_cols, ip))
    keep = out_cols >= 0
    out_indptr = np.zeros(n_rows + 1, dtype=idt)
    np.cumsum(keep, out=out_indptr[1:], dtype=idt)
    W = sp.csr_matrix((np.ones(int(cnt), dtype=A.data.dtype),
                       out_cols[keep], out_indptr), shape=A.shape)
    W.has_sorted_indices = True
    return W
