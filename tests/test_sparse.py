"""Sparse container + ops tests against scipy oracles."""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from pflare_tpu.sparse import (
    ELL,
    SparsityPattern,
    remove_small_from_sparse,
    remove_from_sparse_match,
    one_point_strongest,
    build_spgemm_plan,
    FixedSparsityPolyPlan,
    diag_dominance_ratio,
)
from pflare_tpu.problems import adv_diff_2d, random_diag_dominant


def rand_csr(m, n, density=0.2, seed=0):
    A = sp.random(m, n, density=density, random_state=np.random.RandomState(seed),
                  format="csr")
    A.data = A.data - 0.5
    A.sort_indices()
    return A


def test_ell_roundtrip_and_spmv():
    A = rand_csr(40, 40, 0.15, 1)
    E = ELL.from_scipy(A)
    assert np.allclose(E.to_scipy().toarray(), A.toarray())
    x = np.random.default_rng(0).random(40)
    y = E.matvec(jnp.asarray(x))
    assert np.allclose(np.asarray(y), A @ x, atol=1e-12)
    # transpose matvec
    yt = E.matvec_t(jnp.asarray(x))
    assert np.allclose(np.asarray(yt), A.T @ x, atol=1e-12)


def test_ell_rect_and_diag():
    A = rand_csr(30, 50, 0.2, 2)
    E = ELL.from_scipy(A)
    x = np.random.default_rng(1).random(50)
    assert np.allclose(np.asarray(E.matvec(jnp.asarray(x))), A @ x, atol=1e-12)
    B = rand_csr(20, 20, 0.3, 3) + sp.eye(20)
    EB = ELL.from_scipy(sp.csr_matrix(B))
    assert np.allclose(np.asarray(EB.diagonal()), B.diagonal(), atol=1e-14)


def test_remove_small_absolute():
    A = sp.csr_matrix(np.array([[2.0, 0.05, 0.0], [0.05, 1.0, 0.5],
                                [0.2, 0.0, 0.01]]))
    out = remove_small_from_sparse(A, 0.1)
    dense = out.toarray()
    # small off-diagonals dropped, diagonal kept even when small
    assert dense[0, 1] == 0.0
    assert dense[2, 2] == 0.01  # diagonal never dropped by default
    assert dense[1, 2] == 0.5


def test_remove_small_relative_and_lump():
    A = rand_csr(50, 50, 0.2, 4) + 2 * sp.eye(50)
    A = sp.csr_matrix(A)
    out = remove_small_from_sparse(A, 0.5, relative_max_row_tol=1, lump=True)
    # row sums preserved by lumping
    assert np.allclose(out.sum(axis=1), A.sum(axis=1), atol=1e-12)
    # fewer nonzeros
    assert out.nnz < A.nnz


def test_remove_small_always_drop_diag():
    A = sp.csr_matrix(np.array([[2.0, 1.0], [1.0, 3.0]]))
    out = remove_small_from_sparse(A, 0.0, drop_diagonal=-1)
    assert np.allclose(out.toarray(), [[0, 1], [1, 0]])


def test_sparse_match():
    A = rand_csr(30, 30, 0.3, 5)
    patt = remove_small_from_sparse(A, 0.2, relative_max_row_tol=1)
    out = remove_from_sparse_match(2 * A, patt)
    # values replaced with 2*A on pattern
    diff = out - 2 * A.multiply(patt.astype(bool).astype(float))
    assert abs(diff).max() < 1e-12


def test_sparse_match_lump():
    A = sp.csr_matrix(np.array([[2.0, 0.3, 0.0], [0.0, 1.0, 0.4],
                                [0.1, 0.0, 1.5]]))
    patt = sp.csr_matrix(np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0],
                                   [0.0, 0.0, 1.0]]))
    out = remove_from_sparse_match(A, patt, lump=True)
    # dropped 0.3 added to row0 diag; dropped 0.1 added to row2 diag
    assert np.isclose(out[0, 0], 2.3)
    assert np.isclose(out[2, 2], 1.6)
    assert np.isclose(out[1, 2], 0.4)


def test_one_point_strongest():
    A = sp.csr_matrix(np.array([[0.1, -2.0, 0.5], [0.0, 0.0, 0.0],
                                [3.0, 1.0, -3.0]]))
    W = one_point_strongest(A)
    assert np.allclose(W.toarray(), [[0, 1, 0], [0, 0, 0], [1, 0, 0]])


def test_spgemm_plan_full_product():
    A = rand_csr(25, 30, 0.2, 6)
    B = rand_csr(30, 20, 0.2, 7)
    pa = SparsityPattern.from_scipy(A)
    pb = SparsityPattern.from_scipy(B)
    plan = build_spgemm_plan(pa, pb)
    EA = ELL.from_scipy(A)
    EB = ELL.from_scipy(B)
    C = plan.execute(EA, EB)
    assert np.allclose(C.to_scipy().toarray(), (A @ B).toarray(), atol=1e-12)


def test_spgemm_plan_restricted():
    A = rand_csr(25, 25, 0.25, 8)
    pa = SparsityPattern.from_scipy(A)
    plan = build_spgemm_plan(pa, pa, pa)  # (A@A) restricted onto A's pattern
    EA = ELL.from_scipy(A)
    C = plan.execute(EA, EA)
    full = (A @ A).toarray()
    mask = A.toarray() != 0
    assert np.allclose(C.to_scipy().toarray(), np.where(mask, full, 0.0),
                       atol=1e-12)


def test_fixed_sparsity_poly():
    A = sp.csr_matrix(random_diag_dominant(40, 0.1))
    E = ELL.from_scipy(A)
    coeffs = np.array([0.5, -0.25, 0.125])
    plan = FixedSparsityPolyPlan(E.pattern, 2, 2)
    M = plan.execute(E, jnp.asarray(coeffs))
    dense = (0.5 * np.eye(40) - 0.25 * A.toarray()
             + 0.125 * (A @ A).toarray())
    # pattern of A^2 contains everything here (sparsity_order=2)
    mask = ((A @ A).toarray() != 0) | np.eye(40, dtype=bool)
    assert np.allclose(M.to_scipy().toarray(), np.where(mask, dense, 0.0),
                       atol=1e-12)


def test_fixed_sparsity_poly_order1():
    A = sp.csr_matrix(random_diag_dominant(30, 0.15))
    E = ELL.from_scipy(A)
    coeffs = np.array([1.0, 2.0, 3.0])  # order 2, sparsity 1
    plan = FixedSparsityPolyPlan(E.pattern, 2, 1)
    M = plan.execute(E, jnp.asarray(coeffs))
    # A2 restricted to S(A)+diag pattern
    mask = (A.toarray() != 0) | np.eye(30, dtype=bool)
    A2r = np.where(mask, (A @ A).toarray(), 0.0)
    dense = 1.0 * np.eye(30) + 2.0 * A.toarray() + 3.0 * A2r
    assert np.allclose(M.to_scipy().toarray(), np.where(mask, dense, 0.0),
                       atol=1e-12)


def test_diag_dominance_ratio():
    A = sp.csr_matrix(np.array([
        [4.0, 1.0, 1.0, 0.0],
        [1.0, 3.0, 0.0, 1.0],
        [0.0, 0.0, 2.0, 0.5],
        [1.0, 0.0, 0.0, 5.0],
    ]))
    f_mask = np.array([True, True, False, True])
    r = diag_dominance_ratio(A, f_mask)
    # F rows 0,1,3; F cols only
    assert np.allclose(r, [1.0 / 4.0, 2.0 / 3.0, 1.0 / 5.0])


def test_adv_diff_generator_structure():
    A = adv_diff_2d(5)
    assert A.shape == (25, 25)
    # dirichlet rows: i==0 or j==0
    for j in range(5):
        for i in range(5):
            row = j * 5 + i
            if i == 0 or j == 0:
                assert A[row].nnz == 1
                assert np.isclose(A[row, row], 1.0)
    # interior rows: 3 entries, zero row sums for pure advection at pi/4
    row = 2 * 5 + 2
    assert A[row].nnz == 3
    assert np.isclose(A[row].sum(), 0.0)


@pytest.mark.smoke
def test_restrict_plan_matches_direct_product():
    """restrict_plan/apply_restrict_plan vs the one-shot restricted
    product AND a dense scipy oracle, on a rectangular X @ A."""
    from pflare_tpu.sparse.dell import (DELL, apply_restrict_plan,
                                        restrict_plan, restricted_product)

    A = rand_csr(80, 80, density=0.12, seed=3) + sp.eye(80)
    A = sp.csr_matrix(A)
    A.sort_indices()
    X = rand_csr(60, 80, density=0.15, seed=4)
    Ad = DELL.from_scipy(A, dtype=jnp.float64)
    Xd = DELL.from_scipy(X, dtype=jnp.float64)

    direct = restricted_product(Xd.cols, Xd.data, Ad)
    T = restrict_plan(Xd.cols, Ad)
    plan = apply_restrict_plan(T, Xd.data)
    assert np.max(np.abs(np.asarray(direct - plan))) < 1e-12

    dense = (X @ A).toarray()
    want = np.where(np.abs(X.toarray()) > 0, dense, 0.0)
    got = DELL(plan, Xd.cols, 80).to_scipy().toarray()
    assert np.max(np.abs(got - want)) < 1e-12


def test_dia_fused_matvec_matches(monkeypatch):
    """The fused multi-offset Pallas DIA SpMV (sparse/dia.py::_dia_fused,
    the >=50%-of-HBM-peak solve kernel) computes the identical matvec to
    the portable XLA path and to scipy; exercised here through the
    interpreter with a shrunk size gate."""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from pflare_tpu.sparse import dia as dia_mod

    monkeypatch.setattr(dia_mod, "_FUSED_MIN_ROWS", 4096)
    monkeypatch.setenv("PFLARE_DIA_FUSED", "force")
    rng = np.random.default_rng(0)
    # n=8192 divides by an offset-covering TR -> ALIGNED (pad-free)
    # variant; n=4224 has no suitable divisor -> padded variant
    for n, want_aligned in ((8192, True), (4224, False)):
        offs = [-64, -1, 0, 1, 64]
        A = sp.diags([rng.random(n - abs(o)) + 0.1 for o in offs], offs,
                     format="csr")
        monkeypatch.setenv("PFLARE_DIA_FUSED", "force")
        D = dia_mod.DIA.from_scipy(A, dtype=np.float32)
        tr, sub, aligned = D._tr
        assert aligned == want_aligned, (n, D._tr)
        assert D.data.shape[1] % (tr * sub) == 0
        x = rng.random(n).astype(np.float32)
        y = np.asarray(D.matvec(jnp.asarray(x)))
        y_ref = (A @ x).astype(np.float32)
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-6, (n, rel)
        # XLA fallback on the padded container matches too
        monkeypatch.setenv("PFLARE_DIA_FUSED", "0")
        y2 = np.asarray(D.matvec(jnp.asarray(x)))
        assert np.linalg.norm(y2 - y_ref) / np.linalg.norm(y_ref) < 1e-6
        # round trip keeps only the real rows
        assert abs(D.to_scipy()
                   - sp.csr_matrix(A, dtype=np.float32)).max() < 1e-7
        assert D.nnz == A.nnz
