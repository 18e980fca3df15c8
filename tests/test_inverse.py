"""PCPFLAREINV-equivalent tests: one-level approximate-inverse solves.

Oracles mirror the reference's iteration caps (reference: tests/Makefile:119,
127: default 6th-order polys on the hyperbolic streaming matrix converge
within 21 GMRES its at rtol 1e-5; Newton mf within 13)."""

import os

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from pflare_tpu import (
    ELL,
    InverseType,
    adv_1d,
    build_inverse,
    gmres,
    random_diag_dominant,
    read_petsc_matrix,
)
from pflare_tpu.inverse import (
    coefficients_power,
    coefficients_arnoldi,
    modified_leja,
    newton_roots,
    sai_inverse,
)

DATA_DIR = os.environ.get("PFLARE_DATA", "/root/reference/tests/data")
STREAM = os.path.join(DATA_DIR, "mat_stream_2364")

needs_stream = pytest.mark.skipif(
    not os.path.exists(STREAM), reason="reference data not available"
)


def make_rhs(n, seed=3):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(n))


def solve_with_inverse(A_sp, inv, rtol=1e-5, max_it=100, b=None):
    E = ELL.from_scipy(A_sp)
    if b is None:
        b = make_rhs(A_sp.shape[0])
    return gmres(E, jnp.asarray(b), M=inv.apply, rtol=rtol, max_it=max_it)


def load_stream():
    """Streaming matrix + its physical RHS (the reference drivers solve
    with the stored b, reference: tests/ex6.c '-b_in_f')."""
    A, vecs = read_petsc_matrix(STREAM, return_vecs=True)
    return A, vecs[0]


# ~~~~~~~~~~~~~~ coefficient correctness ~~~~~~~~~~~~~~

def test_power_equals_arnoldi_low_order():
    """Power and Arnoldi bases minimise the same LS problem -> identical
    polynomials at low order (different bases of the same Krylov space)."""
    A = random_diag_dominant(60, 0.1, seed=5)
    E = ELL.from_scipy(A)
    cp = coefficients_power(E.matvec, 60, 3, seed=11)
    ca = coefficients_arnoldi(E.matvec, 60, 3, seed=11)
    assert np.allclose(cp, ca, rtol=1e-6, atol=1e-10)


def test_poly_inverse_exact_for_small_matrix():
    """For order+1 >= n the GMRES polynomial is an exact inverse."""
    n = 8
    A = random_diag_dominant(n, 0.4, seed=2)
    E = ELL.from_scipy(A)
    inv = build_inverse(E, InverseType.ARNOLDI, poly_order=n, matrix_free=True)
    x = make_rhs(n)
    y = inv.apply(x)
    assert np.allclose(np.asarray(E.matvec(y)), np.asarray(x), atol=1e-8)


def test_assembled_matches_matrix_free_full_sparsity():
    A = random_diag_dominant(40, 0.08, seed=3)
    E = ELL.from_scipy(A)
    coeffs = coefficients_arnoldi(E.matvec, 40, 3, seed=11)
    mf = build_inverse(E, InverseType.ARNOLDI, poly_order=3, matrix_free=True,
                       coefficients=coeffs)
    asm = build_inverse(E, InverseType.ARNOLDI, poly_order=3,
                        sparsity_order=3, coefficients=coeffs)
    x = make_rhs(40)
    assert np.allclose(np.asarray(mf.apply(x)), np.asarray(asm.apply(x)),
                       atol=1e-10)


def test_diag_scaled_assembled_matches_mf():
    A = random_diag_dominant(40, 0.08, seed=9)
    E = ELL.from_scipy(A)
    mf = build_inverse(E, InverseType.POWER, poly_order=3, matrix_free=True,
                       diag_scale=True, seed=13)
    asm = build_inverse(E, InverseType.POWER, poly_order=3, sparsity_order=3,
                        diag_scale=True, seed=13)
    x = make_rhs(40)
    assert np.allclose(np.asarray(mf.apply(x)), np.asarray(asm.apply(x)),
                       atol=1e-9)


def test_modified_leja_ordering():
    rr = np.array([1.0, 5.0, 3.0])
    ri = np.zeros(3)
    idx = modified_leja(rr, ri)
    assert idx[0] == 1  # largest magnitude first
    # next is the farthest from 5 -> 1
    assert idx[1] == 0


def test_newton_roots_diagonal_matrix():
    """Roots of a diagonal matrix's GMRES poly contain the distinct
    eigenvalues (order+1 = #distinct evals -> exact)."""
    d = np.array([1.0, 2.0, 4.0, 8.0] * 5)
    A = sp.diags(d).tocsr()
    E = ELL.from_scipy(A)
    wr, wi = newton_roots(E.matvec, 20, 3, jnp.float64)
    real_roots = np.sort(wr[(wr != 0) & (np.abs(wi) < 1e-8)])
    for ev in (1.0, 2.0, 4.0, 8.0):
        assert np.min(np.abs(real_roots - ev)) < 1e-6, (wr, wi)


# ~~~~~~~~~~~~~~ solve oracles ~~~~~~~~~~~~~~

def test_adv1d_arnoldi_mf_high_order():
    """30th-order Arnoldi mf poly on 1D advection (reference:
    tests/adv_1d.c).  GMRES stagnates on pure 1D upwind advection; the
    degree-30 polynomial packs ~31 fine matvecs per outer iteration, cutting
    outer its from ~100 (unpreconditioned) to ~25 at rtol 1e-10."""
    A = adv_1d(100)
    E = ELL.from_scipy(A)
    inv = build_inverse(E, InverseType.ARNOLDI, poly_order=30,
                        matrix_free=True)
    res = solve_with_inverse(A, inv, rtol=1e-10, max_it=40)
    assert res.converged
    assert res.iterations <= 30


def test_random_default_arnoldi_assembled():
    A = random_diag_dominant(200, 0.03, seed=4)
    inv = build_inverse(ELL.from_scipy(A), InverseType.ARNOLDI)
    res = solve_with_inverse(A, inv, max_it=30)
    assert res.converged and res.iterations <= 10


def test_neumann_assembled_and_mf():
    A = random_diag_dominant(100, 0.05, seed=6)
    E = ELL.from_scipy(A)
    for mf in (True, False):
        inv = build_inverse(E, InverseType.NEUMANN, poly_order=4,
                            sparsity_order=2, matrix_free=mf)
        res = solve_with_inverse(A, inv, max_it=40)
        assert res.converged, f"neumann mf={mf} failed"


def test_jacobi_weights():
    A = random_diag_dominant(50, 0.1, seed=7)
    E = ELL.from_scipy(A)
    inv_w = build_inverse(E, InverseType.WJACOBI)
    inv_u = build_inverse(E, InverseType.JACOBI)
    d = A.diagonal()
    Dm = sp.diags(1.0 / np.sqrt(np.abs(d)))
    norm_inf = abs(Dm @ A @ Dm).sum(axis=1).max()
    w = 3.0 / (4.0 * norm_inf)
    assert np.allclose(np.asarray(inv_w.diag), w / d, rtol=1e-10)
    assert np.allclose(np.asarray(inv_u.diag), 1.0 / d, rtol=1e-12)
    res = solve_with_inverse(A, inv_w, max_it=200)
    assert res.converged


def test_sai_exact_with_full_pattern():
    A = random_diag_dominant(20, 0.3, seed=8)
    dense_pattern = sp.csr_matrix(np.ones((20, 20)))
    M = sai_inverse(A, incomplete=False, sparsity=dense_pattern)
    assert np.allclose((M @ A).toarray(), np.eye(20), atol=1e-8)


def test_sai_isai_solve():
    A = random_diag_dominant(150, 0.04, seed=9)
    E = ELL.from_scipy(A)
    for t in (InverseType.SAI, InverseType.ISAI):
        inv = build_inverse(E, t, sparsity_order=1)
        res = solve_with_inverse(A, inv, max_it=60)
        assert res.converged, f"{t.name} failed"


@needs_stream
def test_stream_power_order6():
    """reference: tests/Makefile:121 -- <= 21 its at default rtol 1e-5."""
    A, b = load_stream()
    inv = build_inverse(ELL.from_scipy(A), InverseType.POWER)
    res = solve_with_inverse(A, inv, max_it=21, b=b)
    assert res.converged, f"its={res.iterations}"


@needs_stream
def test_stream_arnoldi_default():
    """reference: tests/Makefile:119 -- default pflareinv (arnoldi)."""
    A, b = load_stream()
    inv = build_inverse(ELL.from_scipy(A), InverseType.ARNOLDI)
    res = solve_with_inverse(A, inv, max_it=21, b=b)
    assert res.converged, f"its={res.iterations}"


@needs_stream
def test_stream_newton_mf():
    """reference: tests/Makefile:127 -- newton mf <= 13 its."""
    A, b = load_stream()
    inv = build_inverse(ELL.from_scipy(A), InverseType.NEWTON,
                        matrix_free=True)
    res = solve_with_inverse(A, inv, max_it=13, b=b)
    assert res.converged, f"its={res.iterations}"


@needs_stream
def test_stream_newton_assembled():
    """reference: tests/Makefile:123 -- newton assembled <= 21 its."""
    A, b = load_stream()
    inv = build_inverse(ELL.from_scipy(A), InverseType.NEWTON)
    res = solve_with_inverse(A, inv, max_it=21, b=b)
    assert res.converged, f"its={res.iterations}"


def test_coefficient_reuse_protocol():
    """Get/SetPolyCoeffs semantics (reference: tests/ex6_getcoeffs.c):
    rebuilding from saved coefficients reproduces the preconditioner."""
    A = random_diag_dominant(80, 0.05, seed=10)
    E = ELL.from_scipy(A)
    inv1 = build_inverse(E, InverseType.ARNOLDI, poly_order=4,
                         matrix_free=True)
    coeffs = np.asarray(inv1.coefficients)
    inv2 = build_inverse(E, InverseType.ARNOLDI, poly_order=4,
                         matrix_free=True, coefficients=coeffs)
    x = make_rhs(80)
    assert np.allclose(np.asarray(inv1.apply(x)), np.asarray(inv2.apply(x)),
                       atol=1e-14)


BUS = os.path.join(DATA_DIR, "1138_bus")
E05 = os.path.join(DATA_DIR, "e05r0100_petsc")


@pytest.mark.skipif(not os.path.exists(BUS), reason="data not available")
def test_bus_newton_order60_mf():
    """reference: tests/Makefile:199 -- Newton order 60 matrix-free on
    1138_bus, unpreconditioned norm (right PC here), <= 6 its."""
    A = read_petsc_matrix(BUS)
    b = jnp.asarray(A @ np.ones(A.shape[0]))
    E = ELL.from_scipy(A)
    inv = build_inverse(E, InverseType.NEWTON, poly_order=60,
                        matrix_free=True, A_scipy=A)
    res = gmres(E, b, M=inv.apply, rtol=1e-5, max_it=6, side="right")
    assert res.converged, res.iterations


@pytest.mark.skipif(not os.path.exists(BUS), reason="data not available")
def test_bus_newton_order60_assembled():
    """reference: tests/Makefile:201 -- Newton order 60 assembled
    (Newton-basis fixed-sparsity accumulation)."""
    A = read_petsc_matrix(BUS)
    b = jnp.asarray(A @ np.ones(A.shape[0]))
    E = ELL.from_scipy(A)
    inv = build_inverse(E, InverseType.NEWTON, poly_order=60, A_scipy=A)
    res = gmres(E, b, M=inv.apply, rtol=1e-5, max_it=6, side="right")
    assert res.converged, res.iterations


def test_sai_batched_matches_loop_oracle():
    """Batched padded-QR SAI/ISAI == per-row solves, incl. empty rows and
    the rank-deficient min-norm fallback (reference: src/SAI_Z.F90)."""
    from pflare_tpu.inverse.sai import sai_z, _sai_z_loop

    rng = np.random.RandomState(21)
    n_f, n_c = 90, 30
    A_ff = sp.csr_matrix(
        sp.random(n_f, n_f, density=0.07, random_state=rng)
        + sp.diags(2.0 + rng.rand(n_f))
    )
    A_ff.sort_indices()
    A_cf = sp.csr_matrix(sp.random(n_c, n_f, density=0.1, random_state=rng))
    A_cf = sp.vstack([A_cf[: n_c - 1], sp.csr_matrix((1, n_f))]).tocsr()
    A_cf.sort_indices()
    S = sp.csr_matrix(
        (np.ones(A_cf.nnz), A_cf.indices, A_cf.indptr), shape=A_cf.shape
    )
    for inc in (True, False):
        Zb = sai_z(A_ff, A_cf, S, inc, batched=True)
        Zl = _sai_z_loop(A_ff, A_cf, S, inc)
        assert (Zb.indptr == Zl.indptr).all()
        assert (Zb.indices == Zl.indices).all()
        assert np.allclose(Zb.data, Zl.data, atol=1e-9)

    # force a rank-deficient local block via an empty A_ff row
    A2 = A_ff.tolil()
    A2[3, :] = 0
    A2 = A2.tocsr()
    A2.eliminate_zeros()
    A2.sort_indices()
    Zb = sai_z(A2, A_cf, S, True, batched=True)
    Zl = _sai_z_loop(A2, A_cf, S, True)
    assert (Zb.indices == Zl.indices).all()
    assert np.allclose(Zb.data, Zl.data, atol=1e-8)


def test_sai_device_matches_host():
    """Device-jitted batched SAI solves == host numpy path (the Kokkos
    debug-compare analogue for SAI_Zk, reference: src/SAI_Zk.kokkos.cxx)."""
    import numpy as np
    import scipy.sparse as sp
    from pflare_tpu.inverse.sai import sai_z

    rng = np.random.default_rng(4)
    A_ff = sp.random(120, 120, density=0.05, random_state=7, format="csr")
    A_ff = sp.csr_matrix(A_ff + sp.diags(np.full(120, 3.0)))
    A_ff.sort_indices()
    A_cf = sp.random(60, 120, density=0.06, random_state=8, format="csr")
    A_cf.sort_indices()
    for incomplete in (False, True):
        Zh = sai_z(A_ff, A_cf, A_cf, incomplete=incomplete, device=False)
        Zd = sai_z(A_ff, A_cf, A_cf, incomplete=incomplete, device=True)
        assert Zh.nnz == Zd.nnz
        assert abs(Zh - Zd).max() < 1e-9, incomplete
