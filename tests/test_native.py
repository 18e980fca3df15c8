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
