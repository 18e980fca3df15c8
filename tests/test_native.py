"""Native C++ host kernels vs numpy reference implementations.

The debug-compare analogue of the reference's PFLARE_KOKKOS_DEBUG mode
(reference: docs/dev/kokkos.md): both implementations run on the same
inputs and must agree exactly."""

import os

import numpy as np
import pytest

import pflare_tpu.native as native
from pflare_tpu.cf import strength_matrix, pmisr
from pflare_tpu.problems import adv_diff_2d, random_diag_dominant
from pflare_tpu.sparse import SparsityPattern, build_spgemm_plan, ELL
from pflare_tpu.sparse.ops import diag_dominance_ratio


def _force(native_on: bool):
    if native_on:
        os.environ.pop("PFLARE_NO_NATIVE", None)
    else:
        os.environ["PFLARE_NO_NATIVE"] = "1"
    native._TRIED = False
    native._LIB = None


@pytest.fixture(autouse=True)
def _restore():
    yield
    _force(True)


def test_native_available():
    _force(True)
    assert native.get_lib() is not None, "native kernels failed to build"


def test_pmisr_native_matches_numpy():
    A = adv_diff_2d(30, curved_velocity=True)
    S = strength_matrix(A, 0.5, symmetrize=True)
    for steps in (-1, 3):
        _force(True)
        cf_nat = pmisr(S, steps)
        _force(False)
        cf_np = pmisr(S, steps)
        assert np.array_equal(cf_nat, cf_np), f"steps={steps}"


def test_dd_ratio_native_matches_numpy():
    A = adv_diff_2d(25, curved_velocity=True)
    rng = np.random.default_rng(0)
    f_mask = rng.random(A.shape[0]) < 0.6
    _force(True)
    r_nat = diag_dominance_ratio(A, f_mask)
    _force(False)
    r_np = diag_dominance_ratio(A, f_mask)
    assert np.allclose(r_nat, r_np)


def test_plan_triples_native_matches_numpy():
    import scipy.sparse as sp

    A = sp.csr_matrix(random_diag_dominant(60, 0.1, seed=2))
    pa = SparsityPattern.from_scipy(A)
    _force(True)
    plan_nat = build_spgemm_plan(pa, pa, pa)
    _force(False)
    plan_np = build_spgemm_plan(pa, pa, pa)
    EA = ELL.from_scipy(A)
    C1 = plan_nat.execute(EA, EA).to_scipy()
    C2 = plan_np.execute(EA, EA).to_scipy()
    assert np.allclose(C1.toarray(), C2.toarray(), atol=1e-13)


def test_spgemm_onto_pattern_matches_match():
    """Fused C|_P = (A@B)|_P with lump == full product + match (the
    numeric-only MAT_REUSE_MATRIX re-product, reference:
    src/AIR_Operators_Setup.F90:1038-1082)."""
    import numpy as np
    import scipy.sparse as sp
    from pflare_tpu.native import spgemm_onto_pattern_native
    from pflare_tpu.sparse.ops import (remove_from_sparse_match,
                                       remove_small_from_sparse)

    rng = np.random.RandomState(7)
    A = sp.random(150, 140, density=0.05, random_state=rng, format="csr")
    A = sp.csr_matrix(A + sp.diags(np.full(140, 2.0), shape=(150, 140)))
    B = sp.random(140, 150, density=0.06, random_state=rng, format="csr")
    B = sp.csr_matrix(B + sp.diags(np.full(140, 1.5), shape=(140, 150)))
    A.sort_indices(); B.sort_indices()
    full = sp.csr_matrix(A @ B)
    P = remove_small_from_sparse(full, 0.2, relative_max_row_tol=1)
    for lump in (False, True):
        ref = remove_from_sparse_match(full, P, lump=lump)
        got = spgemm_onto_pattern_native(A, B, P, lump=lump)
        if got is None:
            import pytest
            pytest.skip("native unavailable")
        assert got.nnz == ref.nnz
        assert abs(got - ref).max() < 1e-12, lump


def test_split_cf_matches_scipy_slicing():
    """One-pass native CF submatrix split == scipy double fancy-indexing
    (the MatCreateSubMatrix extraction of the four CF blocks, reference:
    src/AIR_Operators_Setup.F90:196-227)."""
    import numpy as np
    import scipy.sparse as sp
    from pflare_tpu.native import split_cf_native

    rng = np.random.RandomState(3)
    A = sp.random(220, 220, density=0.04, random_state=rng, format="csr")
    A = sp.csr_matrix(A + sp.eye(220))
    A.sort_indices()
    cf = rng.rand(220) < 0.45
    fine = np.nonzero(cf)[0]
    coarse = np.nonzero(~cf)[0]
    got = split_cf_native(A, fine, coarse, True)
    if got is None:
        import pytest
        pytest.skip("native unavailable")
    Af, Ac = A[fine], A[coarse]
    refs = (sp.csr_matrix(Af[:, fine]), sp.csr_matrix(Af[:, coarse]),
            sp.csr_matrix(Ac[:, fine]), sp.csr_matrix(Ac[:, coarse]))
    for M, R in zip(got, refs):
        R.sort_indices()
        assert M.nnz == R.nnz
        assert (M != R).nnz == 0
        assert M.has_sorted_indices
    # f32 values stream through the f32 kernel variant without upcast
    got32 = split_cf_native(A.astype(np.float32), fine, coarse, False)
    assert got32[0].dtype == np.float32
    assert abs(got32[0] - refs[0].astype(np.float32)).nnz == 0


def test_ap_onepoint_matches_scipy_product():
    """Streaming one-point AP product == scipy A@P for a P with at most
    one entry per row (the one-point classical prolongator structure,
    reference: src/AIR_Operators_Setup.F90:1006-1033), across index and
    value dtypes, empty P rows included."""
    import scipy.sparse as sp
    from pflare_tpu.native import ap_onepoint_native

    rng = np.random.RandomState(3)
    A = sp.random(120, 120, density=0.08, random_state=rng, format="csr")
    A = sp.csr_matrix(A + sp.diags(np.full(120, 2.0)))
    A.sort_indices()
    # P: one entry in most rows, some empty rows, duplicate target cols
    pcol = rng.randint(0, 40, size=120)
    keep = rng.random(120) > 0.15
    rows = np.flatnonzero(keep)
    P = sp.csr_matrix((rng.randn(len(rows)), (rows, pcol[rows])),
                      shape=(120, 40))
    P.sort_indices()
    assert np.diff(P.indptr).max() == 1
    for idt in (np.int32, np.int64):
        for vdt in (np.float64, np.float32):
            Ad = sp.csr_matrix(
                (A.data.astype(vdt), A.indices.astype(idt),
                 A.indptr.astype(idt)), shape=A.shape)
            Pd = sp.csr_matrix(
                (P.data.astype(vdt), P.indices.astype(idt),
                 P.indptr.astype(idt)), shape=P.shape)
            got = ap_onepoint_native(Ad, Pd)
            if got is None:
                pytest.skip("native unavailable")
            ref = sp.csr_matrix(Ad.astype(np.float64)
                                @ Pd.astype(np.float64))
            ref.sort_indices()
            assert got.nnz == ref.nnz, (idt, vdt)
            assert np.array_equal(got.indices.astype(np.int64),
                                  ref.indices.astype(np.int64))
            tol = 1e-12 if vdt == np.float64 else 1e-5
            assert abs(got.astype(np.float64) - ref).max() < tol


@pytest.mark.smoke
def test_csr_to_ell_native_matches_numpy():
    import scipy.sparse as sp

    rng = np.random.default_rng(7)
    mats = [adv_diff_2d(20),
            sp.random(60, 60, density=0.15, random_state=rng, format="csr"),
            sp.csr_matrix((5, 5))]  # empty pattern
    for A in mats:
        A = sp.csr_matrix(A)
        A.sort_indices()
        _force(True)
        p_nat = SparsityPattern(A.indptr, A.indices, A.shape)
        ec_nat, sp_nat = p_nat.ell_cols, p_nat.slot_of_pos
        _force(False)
        p_np = SparsityPattern(A.indptr, A.indices, A.shape)
        ec_np, sp_np = p_np.ell_cols, p_np.slot_of_pos
        assert np.array_equal(ec_nat, ec_np)
        assert np.array_equal(sp_nat, sp_np)
