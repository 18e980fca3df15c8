"""PCPFLAREINV front-end + ILU triangle-factor solves.

reference: tests/ilu_factors.c -- triangle factors from an ILU(0) are
strongly asymmetric; AIRG solves each factor with Richardson to rtol 1e-6."""

import os

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import jax.numpy as jnp
import pytest

from pflare_tpu import (
    AIROptions,
    InverseType,
    PCAIR,
    PCPFLAREINV,
    random_diag_dominant,
)
from pflare_tpu.problems import read_petsc_matrix

DATA_DIR = os.environ.get("PFLARE_DATA", "/root/reference/tests/data")
STREAM = os.path.join(DATA_DIR, "mat_stream_2364")
needs_stream = pytest.mark.skipif(
    not os.path.exists(STREAM), reason="reference data not available"
)


def test_pcpflareinv_basic():
    A = random_diag_dominant(150, 0.04, seed=3)
    pc = PCPFLAREINV()
    pc.setup(A)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(150))
    res = pc.solve(b, max_it=25)
    assert res.converged


def test_pcpflareinv_coeff_roundtrip():
    """Get/SetPolyCoeffs protocol (reference: tests/ex6_getcoeffs.c)."""
    A = random_diag_dominant(100, 0.05, seed=4)
    pc = PCPFLAREINV(matrix_free=True)
    pc.setup(A)
    coeffs = pc.get_poly_coeffs()
    assert coeffs is not None and len(coeffs) == 7

    pc2 = PCPFLAREINV(matrix_free=True)
    pc2.set_poly_coeffs(coeffs)
    pc2.setup(A, structure="same") if pc2._ell is not None else pc2.setup(A)
    # inject + setup skips iteration; fresh setup here computes identical
    b = jnp.asarray(np.random.default_rng(1).standard_normal(100))
    y1 = np.asarray(pc.apply(b))
    pc3 = PCPFLAREINV(matrix_free=True)
    pc3.setup(A)
    pc3.set_poly_coeffs(coeffs)
    y3 = np.asarray(pc3.apply(b))
    assert np.allclose(y1, y3, atol=1e-13)


def test_pcpflareinv_get_inverse_mat():
    A = random_diag_dominant(80, 0.06, seed=5)
    pc = PCPFLAREINV()  # assembled by default
    pc.setup(A)
    M = pc.get_inverse_mat()
    assert M is not None
    b = jnp.asarray(np.random.default_rng(2).standard_normal(80))
    assert np.allclose(np.asarray(M.matvec(b)), np.asarray(pc.apply(b)))


def test_pcpflareinv_freeze_and_reset():
    A = random_diag_dominant(60, 0.08, seed=6)
    pc = PCPFLAREINV()
    pc.setup(A)
    inv1 = pc.inverse
    pc.freeze(True)
    pc.setup(2.0 * A)
    assert pc.inverse is inv1
    pc.freeze(False)
    pc.set_options(poly_order=4)
    assert pc.inverse is None


@needs_stream
def test_ilu_triangle_factors_airg():
    """reference: tests/Makefile:107 (ilu_factors): AIRG solves ILU(0)
    triangle factors with Richardson, unpreconditioned norm, rtol 1e-6."""
    A = read_petsc_matrix(STREAM)
    ilu = spla.spilu(A.tocsc(), fill_factor=1.0, drop_tol=0.0)
    L = sp.csr_matrix(ilu.L)
    U = sp.csr_matrix(ilu.U)
    rng = np.random.default_rng(7)
    for factor in (L, U):
        pc = PCAIR(AIROptions(a_drop=1e-3, inverse_type=InverseType.POWER),
                   jit=False)
        pc.setup(factor)
        b = jnp.asarray(rng.standard_normal(factor.shape[0]))
        res = pc.solve(b, ksp="richardson", rtol=1e-6, max_it=100)
        assert res.converged, res.iterations


def test_option_reset_correctness():
    """matrandom_check_reset analogue (reference:
    tests/matrandom_check_reset.F90): mutating an option resets the PC and
    the rebuilt preconditioner reflects the new option."""
    A = random_diag_dominant(120, 0.05, seed=11)
    pc = PCPFLAREINV(poly_order=2)
    pc.setup(A)
    c2 = pc.get_poly_coeffs()
    assert len(c2) == 3
    pc.set_options(poly_order=5)
    assert pc.inverse is None  # reset
    pc.setup(A)
    c5 = pc.get_poly_coeffs()
    assert len(c5) == 6


SPRING = os.path.join(DATA_DIR, "spring_chain_40")


@pytest.mark.skipif(not os.path.exists(SPRING), reason="data not available")
def test_spring_chain_load():
    """reference load-test data: spring chain system solves with AIR."""
    import jax.numpy as jnp
    from pflare_tpu.problems import read_petsc_matrix

    A, vecs = read_petsc_matrix(SPRING, return_vecs=True)
    b = jnp.asarray(vecs[0]) if vecs else jnp.asarray(
        A @ np.ones(A.shape[0]))
    pc = PCAIR(AIROptions(coarsest_inverse_type=InverseType.LU), jit=False)
    pc.setup(A)
    res = pc.solve(b, rtol=1e-5, max_it=30)
    assert res.converged, res.iterations
