"""PCAIR end-to-end solver oracles.

Every test mirrors a reference driver + iteration cap from tests/Makefile
(the reference's test strategy: if the method regresses, the solve exceeds
the cap, reference: docs/dev/testing.md)."""

import os

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from pflare_tpu import (
    AIROptions,
    CFSplittingType,
    InverseType,
    PCAIR,
    ZType,
    adv_diff_2d,
    adv_diff_3d,
    random_diag_dominant,
)
from pflare_tpu.problems import read_petsc_matrix

DATA_DIR = os.environ.get("PFLARE_DATA", "/root/reference/tests/data")
STREAM = os.path.join(DATA_DIR, "mat_stream_2364")
needs_stream = pytest.mark.skipif(
    not os.path.exists(STREAM), reason="reference data not available"
)


def rhs(n, seed=3):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(n))


def stream():
    A, vecs = read_petsc_matrix(STREAM, return_vecs=True)
    return A, jnp.asarray(vecs[0])


# ~~~~~~~~~~~~~~ run_check analogues ~~~~~~~~~~~~~~

def test_check_adv_diff_25():
    """reference: tests/Makefile:1323 -- adv_diff 25^2, default AIR,
    <= 5 its."""
    A = adv_diff_2d(25)
    pc = PCAIR().setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=5)
    assert res.converged, res.iterations


def test_check_matrandom():
    """reference: tests/Makefile:1319 -- random diag-dominant, <= 5 its."""
    A = random_diag_dominant(300, 0.02, seed=11)
    pc = PCAIR().setup(A)
    res = pc.solve(rhs(300), rtol=1e-5, max_it=5)
    assert res.converged, res.iterations


def test_medium_scaling_100():
    """reference: tests/Makefile:1117-1131 -- right-PC GMRES rtol 1e-10,
    a_lump, a_drop 1e-5, strong_threshold 0.99: <= 6 its at 100^2."""
    A = adv_diff_2d(100)
    pc = PCAIR(AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99))
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-10, atol=1e-50, max_it=6,
                   side="right")
    assert res.converged, res.iterations


@pytest.mark.slow
@pytest.mark.parametrize("n_grid", [200, 400, 800])
def test_medium_scaling_large(n_grid):
    """reference: tests/Makefile:1117-1140 -- the medium scaling study:
    iteration counts stay flat (<= 6 its, rtol 1e-10) from 100^2 to 800^2.
    Residual history is checked for monotone contraction."""
    A = adv_diff_2d(n_grid)
    pc = PCAIR(AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99))
    pc.setup(A)
    # the reference driver solves with zero RHS from x0 = 1
    # (reference: tests/adv_diff_fd.c:178,325) -- rtol is then relative to
    # ||r0|| = ||A 1||, PETSc's zero-rhs convention
    b = jnp.zeros(A.shape[0])
    x0 = jnp.ones(A.shape[0])
    res = pc.solve(b, x0=x0, rtol=1e-10, atol=1e-50, max_it=6,
                   side="right")
    assert res.converged, (n_grid, res.iterations)
    hist = res.history
    rel = hist / hist[0]
    # monotone contraction: every iteration reduces the residual
    assert np.all(rel[1:] < rel[:-1]), rel
    assert rel[-1] <= 1e-10, rel


def test_grid_complexity_bound():
    """reference: python/run_parse_tests.py:7 -- grid complexity < 3.0."""
    A = adv_diff_2d(40)
    pc = PCAIR().setup(A)
    s = pc.stats()
    assert s["grid_complexity"] < 3.0, s


# ~~~~~~~~~~~~~~ streaming-matrix configs ~~~~~~~~~~~~~~

@needs_stream
def test_stream_airg_default():
    """reference: tests/Makefile:89 -- default AIRG <= 5 its."""
    A, b = stream()
    pc = PCAIR().setup(A)
    res = pc.solve(b, rtol=1e-5, max_it=5)
    assert res.converged, res.iterations


@needs_stream
def test_stream_airg_power():
    """reference: tests/Makefile:91 -- a_drop 1e-3, power basis, <= 5 its."""
    A, b = stream()
    pc = PCAIR(AIROptions(a_drop=1e-3, inverse_type=InverseType.POWER))
    pc.setup(A)
    res = pc.solve(b, rtol=1e-5, max_it=5)
    assert res.converged, res.iterations


@needs_stream
def test_stream_airg_fcf():
    """reference: tests/Makefile:93 -- fcf smoothing."""
    A, b = stream()
    pc = PCAIR(AIROptions(a_drop=1e-3, inverse_type=InverseType.POWER)
               .with_smooth_type("fcf"))
    pc.setup(A)
    res = pc.solve(b, rtol=1e-5, max_it=5)
    assert res.converged, res.iterations


@needs_stream
def test_stream_airg_matrix_free():
    """reference: tests/Makefile:95 -- matrix-free poly smoothing."""
    A, b = stream()
    pc = PCAIR(AIROptions(a_drop=1e-3, inverse_type=InverseType.POWER,
                          matrix_free_polys=True))
    pc.setup(A)
    res = pc.solve(b, rtol=1e-5, max_it=5)
    assert res.converged, res.iterations


@needs_stream
def test_stream_lair():
    """reference: tests/Makefile:113 -- lAIR z."""
    A, b = stream()
    pc = PCAIR(AIROptions(a_drop=1e-3, inverse_type=InverseType.POWER,
                          z_type=ZType.LAIR))
    pc.setup(A)
    res = pc.solve(b, rtol=1e-5, max_it=5)
    assert res.converged, res.iterations


@needs_stream
def test_stream_lair_strong_r():
    """reference: tests/Makefile:115 -- lAIR + strong R threshold 0.01."""
    A, b = stream()
    pc = PCAIR(AIROptions(a_drop=1e-3, inverse_type=InverseType.POWER,
                          z_type=ZType.LAIR, strong_r_threshold=0.01))
    pc.setup(A)
    res = pc.solve(b, rtol=1e-5, max_it=5)
    assert res.converged, res.iterations


@needs_stream
def test_stream_newton_low_order():
    """reference: tests/Makefile:163-165 -- newton-basis AIR poly_order 2/3
    <= 5 its (matrix-free, Newton is mf-only for smoothing)."""
    A, b = stream()
    for order in (2, 3):
        pc = PCAIR(AIROptions(inverse_type=InverseType.NEWTON, poly_order=order,
                              matrix_free_polys=True))
        pc.setup(A)
        res = pc.solve(b, rtol=1e-5, max_it=5)
        assert res.converged, (order, res.iterations)


@needs_stream
def test_stream_airg_exact_solver():
    """reference: tests/Makefile:131-135 -- strong_threshold 0 gives
    diagonal A_ff; AIRG becomes an exact solver up to the coarse solve."""
    A, b = stream()
    pc = PCAIR(AIROptions(strong_threshold=0.0, a_drop=0.0, r_drop=0.0,
                          inverse_type=InverseType.JACOBI, max_levels=30,
                          coarsest_inverse_type=InverseType.ARNOLDI,
                          coarsest_poly_order=18,
                          coarsest_matrix_free_polys=True))
    pc.setup(A)
    res = pc.solve(b, ksp="richardson", rtol=1e-5, max_it=10)
    assert res.converged, res.iterations


# ~~~~~~~~~~~~~~ option/variant coverage ~~~~~~~~~~~~~~

def test_ideal_prolongator():
    A = adv_diff_2d(25)
    pc = PCAIR(AIROptions(one_point_classical_prolong=False))
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=6)
    assert res.converged, res.iterations


def test_full_smoothing():
    A = adv_diff_2d(20, alpha=1.0)
    pc = PCAIR(AIROptions(full_smoothing_up_and_down=True,
                          inverse_type=InverseType.ARNOLDI))
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=25)
    assert res.converged, res.iterations


def test_symmetric_ptap():
    A = adv_diff_2d(20, alpha=1.0)
    pc = PCAIR(AIROptions(symmetric=True))
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=25)
    assert res.converged, res.iterations


def test_improve_and_constrain():
    """Constraints on a strongly advective operator: the smoothed
    near-nullspace decays to noise and the reference's absolute
    sigma-drop cutoff (src/PETSc_Helper.F90 pseudo_inv +
    PFLARE_TOL_SIGMA_DROP) zeroes the corrections -- convergence then
    matches the unconstrained ideal-W setup."""
    A = adv_diff_2d(20)
    pc = PCAIR(AIROptions(one_point_classical_prolong=False,
                          improve_w_its=2, improve_z_its=2,
                          constrain_z=True, constrain_w=True))
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=10)
    assert res.converged, res.iterations


def test_constrain_grid_transfer_projector():
    """constrain_grid_transfer enforces W B_c = B_f exactly on every row
    whose support can represent the target (reference:
    src/Constrain_Z_or_W.F90:223-330), and zeroes the correction when the
    candidate vectors have decayed to noise (the reference's absolute
    sigma-drop cutoff in pseudo_inv)."""
    from pflare_tpu.air.constrain import constrain_grid_transfer

    rng = np.random.default_rng(5)
    W = sp.random(80, 30, density=0.2, random_state=9, format="csr")
    W.sort_indices()
    b_c = [rng.standard_normal(30) + 2.0]
    b_f = [rng.standard_normal(80)]
    Wc = constrain_grid_transfer(W, b_f, b_c, is_z=False)
    # same sparsity, and the constraint holds row-wise where support exists
    assert Wc.nnz == W.nnz
    r = np.abs(Wc @ b_c[0] - b_f[0])
    nz = np.diff(W.indptr) > 0
    assert r[nz].max() < 1e-10, r[nz].max()
    # decayed candidates: correction is dropped entirely
    tiny_c = [v * 1e-12 for v in b_c]
    tiny_f = [v * 1e-12 for v in b_f]
    Wt = constrain_grid_transfer(W, tiny_f, tiny_c, is_z=False)
    assert abs(Wt - W).max() == 0.0


def test_adv_diff_3d():
    """reference: tests/adv_diff_fd.c -dim 3."""
    A = adv_diff_3d(10)
    pc = PCAIR().setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=6)
    assert res.converged, res.iterations


def test_cf_splitting_variants_in_air():
    A = adv_diff_2d(20)
    for t in (CFSplittingType.PMIS, CFSplittingType.PMIS_DIST2,
              CFSplittingType.AGG):
        pc = PCAIR(AIROptions(cf_splitting_type=t))
        pc.setup(A)
        res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=30)
        assert res.converged, (t, res.iterations)


def test_diag_scale_polys():
    A = adv_diff_2d(20)
    pc = PCAIR(AIROptions(diag_scale_polys=True))
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=8)
    assert res.converged, res.iterations


def test_bench_truncated_config():
    """The headline bench configuration (bench.py): reference medium
    scaling options + TPU-shaped truncation -- 5 levels with an order-32
    matrix-free Newton coarse solve (reference accelerator guidance:
    docs/gpus.md:34-40).  Guards the benchmark config against hierarchy
    regressions at a test-sized grid."""
    A = adv_diff_2d(128)
    pc = PCAIR(AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99,
                          max_levels=5,
                          coarsest_inverse_type=InverseType.NEWTON,
                          coarsest_poly_order=32,
                          coarsest_matrix_free_polys=True))
    pc.setup(A)
    assert pc.n_levels <= 5
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=10)
    assert res.converged, res.iterations
    x = np.asarray(res.x)
    b = np.asarray(rhs(A.shape[0]))
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-4


def test_auto_truncate():
    A = adv_diff_2d(20)
    pc = PCAIR(AIROptions(auto_truncate_start_level=2,
                          auto_truncate_tol=1e-2,
                          coarsest_poly_order=12))
    pc.setup(A)
    pc_full = PCAIR().setup(A)
    # truncation must not increase levels
    assert pc.n_levels <= pc_full.n_levels
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=10)
    assert res.converged, res.iterations


# ~~~~~~~~~~~~~~ reuse semantics ~~~~~~~~~~~~~~

def test_reuse_same_pattern():
    """reference: tests/reuse_preconditioner.c + docs/reuse.md -- re-setup
    with SAME pattern reuses the CF splitting and every stored sparsity;
    complexities must be identical across the rebuild."""
    A = adv_diff_2d(25)
    pc = PCAIR(AIROptions(reuse_sparsity=True))
    pc.setup(A)
    s1 = pc.stats()
    its1 = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=10).iterations

    A2 = A.copy()
    A2.data = A2.data * 1.1  # same pattern, new values
    pc.setup(A2, structure="same")
    s2 = pc.stats()
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=10)
    assert res.converged
    assert s1["levels"] == s2["levels"]
    assert np.isclose(s1["grid_complexity"], s2["grid_complexity"])


def test_reuse_poly_coeffs_identical():
    """Frozen coefficients + same matrix reproduce the preconditioner
    exactly (reference: tests/ex6f_getcoeffs.F90 semantics)."""
    A = adv_diff_2d(20)
    pc = PCAIR(AIROptions(reuse_sparsity=True, reuse_poly_coeffs=True))
    pc.setup(A)
    h1 = pc.solve(rhs(A.shape[0]), rtol=1e-8, max_it=20).history
    pc.setup(A, structure="same")
    h2 = pc.solve(rhs(A.shape[0]), rtol=1e-8, max_it=20).history
    assert len(h1) == len(h2)
    assert np.allclose(h1, h2, rtol=1e-8)


def test_host_fast_resetup_matches_generic():
    """The cached-index-plan numeric re-setup (air/host_resetup.py) must
    reproduce the generic pattern-reusing path's values (reference
    MAT_REUSE semantics, src/PETSc_Helper.F90:490): same pinned patterns,
    same numerics up to summation order."""
    from pflare_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native kernels unavailable (PFLARE_NO_NATIVE)")
    A = adv_diff_2d(40)
    opts = AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99,
                      reuse_sparsity=True, reuse_amount=2,
                      reuse_poly_coeffs=True)
    rng = np.random.default_rng(11)
    A2 = A.copy()
    A2.data = A2.data * (1.0 + 0.01 * rng.standard_normal(A2.nnz))

    pc = PCAIR(opts)
    pc.setup(A)
    assert any("host_fast" in lv.patterns for lv in pc.hierarchy.levels), \
        "fast-path plans not built for the default AIRG config"
    pc.setup(A2, structure="same")

    pc_gen = PCAIR(opts)
    pc_gen.setup(A)
    for lv in pc_gen.hierarchy.levels:
        lv.patterns.pop("host_fast", None)   # force the generic path
    pc_gen.setup(A2, structure="same")

    assert pc.n_levels == pc_gen.n_levels
    for li, (l1, l2) in enumerate(zip(pc.hierarchy.levels,
                                      pc_gen.hierarchy.levels)):
        for name in ("A_ff", "A_fc", "R"):
            d = abs(getattr(l1, name) - getattr(l2, name)).max()
            assert d < 1e-11, (li, name, d)
        d = abs(l1.patterns["coarse_A"] - l2.patterns["coarse_A"]).max()
        assert d < 1e-10, (li, "coarse_A", d)
        if l1.inv_Aff_host is not None and l2.inv_Aff_host is not None:
            d = abs(l1.inv_Aff_host - l2.inv_Aff_host).max()
            assert d < 1e-11, (li, "inv", d)
    # and the rebuilt preconditioner still solves the perturbed system
    r1 = pc.solve(rhs(A.shape[0]), rtol=1e-8, max_it=12)
    r2 = pc_gen.solve(rhs(A.shape[0]), rtol=1e-8, max_it=12)
    assert r1.converged and r2.converged
    assert r1.iterations == r2.iterations


def test_host_fast_resetup_reiterates_coefficients():
    """Without reuse_poly_coeffs the fast path must RE-ITERATE the
    polynomial coefficients on the new values (reference:
    src/Approx_Inverse_Setup.F90:52-64 -- coefficients are only reused
    when explicitly restored)."""
    from pflare_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native kernels unavailable (PFLARE_NO_NATIVE)")
    A = adv_diff_2d(30)
    opts = AIROptions(reuse_sparsity=True, reuse_amount=2)
    pc = PCAIR(opts)
    pc.setup(A)
    lv = next((l for l in pc.hierarchy.levels
               if l.inv_Aff.kind == "assembled"), None)
    if lv is None:
        pytest.skip("no assembled level in this hierarchy")
    c1 = np.asarray(lv.inv_Aff.coefficients).copy()
    A2 = A.copy()
    A2.data = A2.data * 2.0          # scaling halves the inverse's coeffs
    pc.setup(A2, structure="same")
    lv2 = pc.hierarchy.levels[pc.hierarchy.levels.index(
        next(l for l in pc.hierarchy.levels
             if l.inv_Aff.kind == "assembled"))]
    c2 = np.asarray(lv2.inv_Aff.coefficients)
    assert not np.allclose(c1, c2), "coefficients were frozen"
    res = pc.solve(rhs(A.shape[0]), rtol=1e-6, max_it=10)
    assert res.converged


def test_freeze_preconditioner():
    """KSPSetReusePreconditioner analogue (reference: src/PCAIR.c:150-166)."""
    A = adv_diff_2d(20)
    pc = PCAIR().setup(A)
    lv = pc.hierarchy
    pc.freeze(True)
    A2 = A.copy()
    A2.data = A2.data * 2.0
    pc.setup(A2)
    assert pc.hierarchy is lv  # untouched while frozen
    pc.freeze(False)
    pc.setup(A2)
    assert pc.hierarchy is not lv


# ~~~~~~~~~~~~~~ BASELINE.json config coverage ~~~~~~~~~~~~~~

def test_unstructured_dg_upwind_lair():
    """lAIR distance-2 + PMISR-DDC on unstructured DG upwind advection
    (reference: tests/adv_dg_upwind.c, richardson <= 8 its at rtol 1e-10)."""
    from pflare_tpu.problems import dg_upwind_advection_unstructured

    A = dg_upwind_advection_unstructured(24)
    b = rhs(A.shape[0])
    for z in (ZType.PRODUCT, ZType.LAIR):
        pc = PCAIR(AIROptions(z_type=z, inverse_type=InverseType.POWER,
                              a_drop=1e-3), jit=False)
        pc.setup(A)
        res = pc.solve(b, rtol=1e-10, max_it=8)
        assert res.converged, (z, res.iterations)


def test_unstructured_dg_upwind_curved():
    from pflare_tpu.problems import dg_upwind_advection_unstructured

    A = dg_upwind_advection_unstructured(20, curved_velocity=True)
    pc = PCAIR(AIROptions(a_drop=1e-3), jit=False).setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-10, max_it=10)
    assert res.converged, res.iterations


def test_anisotropic_diffusion():
    """Heavily anisotropic diffusion (BASELINE.json config list)."""
    from pflare_tpu.problems import anisotropic_diffusion_2d

    A = anisotropic_diffusion_2d(24, epsilon=1e-3)
    pc = PCAIR(AIROptions(strong_threshold=0.2).with_smooth_type("ffc"),
               jit=False)
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-8, max_it=40)
    assert res.converged, res.iterations


def test_two_concurrent_airg():
    """Two independent PCAIR instances coexist (reference:
    tests/ex6_two_airg.c)."""
    A1 = adv_diff_2d(15)
    A2 = adv_diff_2d(17, curved_velocity=True)
    pc1 = PCAIR(jit=False).setup(A1)
    pc2 = PCAIR(jit=False).setup(A2)
    r1 = pc1.solve(rhs(A1.shape[0]), rtol=1e-5, max_it=8)
    r2 = pc2.solve(rhs(A2.shape[0]), rtol=1e-5, max_it=8)
    assert r1.converged and r2.converged
    # applying pc1 again after pc2 was built must give identical results
    y1 = np.asarray(pc1.apply(rhs(A1.shape[0], seed=5)))
    y1b = np.asarray(pc1.apply(rhs(A1.shape[0], seed=5)))
    assert np.array_equal(y1, y1b)


def test_view_and_timers(capsys):
    from pflare_tpu.utils.timers import reset_timers

    reset_timers()
    A = adv_diff_2d(12)
    pc = PCAIR(AIROptions(print_stats_timings=True), jit=False)
    pc.setup(A)
    out = capsys.readouterr().out
    assert "Grid complexity" in out
    assert "CF splitting time" in out
    txt = pc.view(out=lambda s: None)
    assert "PCAIR" in txt and "ARNOLDI" in txt


def test_cr_splitting_in_air():
    """CR-based CF splitting driving a full AIR solve
    (reference: -pc_air_cf_splitting_type 6 family)."""
    A = random_diag_dominant(250, 0.03, seed=13)
    pc = PCAIR(AIROptions(cf_splitting_type=CFSplittingType.CR,
                          strong_threshold=0.4), jit=False)
    pc.setup(A)
    res = pc.solve(rhs(250), rtol=1e-6, max_it=20)
    assert res.converged, res.iterations


def test_dtype_f32_solve():
    A = adv_diff_2d(20)
    pc = PCAIR(jit=False, dtype=jnp.float32).setup(A)
    y = pc.apply(jnp.ones(400, dtype=jnp.float32))
    assert y.dtype == jnp.float32
    res = pc.solve(rhs(400), rtol=1e-4, max_it=8)
    assert res.converged


E05 = os.path.join(DATA_DIR, "e05r0100_petsc")


@pytest.mark.skipif(not os.path.exists(E05), reason="data not available")
def test_e05_airg_power():
    """reference: tests/Makefile:157 -- e05r0100 (driven-cavity, 74
    zero-diagonal saddle rows), AIRG power a_drop 1e-3, <= 26 its.

    The indefinite coarsest grid needs the exact coarse solve (the
    reference's -mg_coarse_pc_type lu, tests/Makefile:149): a degree-6
    polynomial cannot invert a spectrum surrounding zero.  Converges in
    ~6 its."""
    A = read_petsc_matrix(E05)
    pc = PCAIR(AIROptions(a_drop=1e-3, inverse_type=InverseType.POWER,
                          coarsest_inverse_type=InverseType.LU),
               jit=False)
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=26)
    assert res.converged, res.iterations


def test_host_memory_economy():
    """Without sparsity reuse, device materialisation releases host CSR
    copies beyond the finest operator (reference memory economy:
    src/AIR_MG_Setup.F90:614-639 matshell placeholder) -- and the
    storage complexity stays in the documented band (reference:
    docs/faq.md:150: 10-13 structured)."""
    from pflare_tpu.air.hierarchy import _HostShim

    A = adv_diff_2d(32)
    pc = PCAIR(AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99))
    pc.setup(A)
    s0 = pc.stats()
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=8)  # materialises
    assert res.converged
    assert isinstance(pc.hierarchy.levels[1].A, _HostShim)
    assert isinstance(pc.hierarchy.levels[0].A_ff, _HostShim)
    assert not isinstance(pc.hierarchy.levels[0].A, _HostShim)  # top kept
    # stats identical after compaction (shims carry the nnz census)
    s1 = pc.stats()
    assert s0 == s1
    assert s1["storage_complexity"] < 14.0


def test_reuse_keeps_host_state():
    """With reuse_sparsity the host state must survive device
    materialisation (same-pattern re-setups consume it)."""
    A = adv_diff_2d(32)
    pc = PCAIR(AIROptions(reuse_sparsity=True, reuse_amount=3))
    pc.setup(A)
    pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=8)
    assert sp.issparse(pc.hierarchy.levels[1].A)
    A2 = A.copy(); A2.data = A2.data * 1.05
    pc.setup(A2, structure="same")
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=8)
    assert res.converged


def test_per_level_smooth_orders():
    """reference: smooth_order_levels (src/AIR_Data_Type.F90:333) --
    per-level smoothing orders, last entry repeating on deeper levels."""
    A = adv_diff_2d(24)
    pc = PCAIR(AIROptions().replace(
        smooth_order_levels=("fcf", "ff", "f")))
    assert pc.options.smooth_order_levels == ((1, -1, 1), (2,), (1,))
    assert pc.options.any_c_smooths          # level 0 has a C smooth
    pc.setup(A)
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=8)
    assert res.converged, res.iterations


def test_c_smoother_defaults_follow_f():
    """reference: src/AIR_Data_Type.F90:192-200 -- unset C-smoother
    settings inherit the F smoother's."""
    o = AIROptions(inverse_type=InverseType.POWER, poly_order=4)
    assert o.c_inverse_type_eff == InverseType.POWER
    assert o.c_poly_order_eff == 4
    o2 = o.replace(c_inverse_type=InverseType.JACOBI, c_poly_order=1)
    assert o2.c_inverse_type_eff == InverseType.JACOBI
    assert o2.c_poly_order_eff == 1
    A = adv_diff_2d(20)
    pc = PCAIR(AIROptions(inverse_type=InverseType.POWER)
               .with_smooth_type("fc"))
    pc.setup(A)
    lvl = pc.hierarchy.levels[0]
    assert lvl.inv_Acc is not None
    res = pc.solve(rhs(A.shape[0]), rtol=1e-5, max_it=10)
    assert res.converged, res.iterations


def test_rcm_reorder_solve():
    """reorder="rcm" bands the operator (docs/tpu.md: slice SpMV vs TPU
    gather) and the permutation is transparent to the user: the returned
    x solves the ORIGINAL system."""
    from pflare_tpu.sparse.banded import BandedSpMV

    A = adv_diff_2d(24)
    # scramble the ordering to emulate an unstructured numbering
    rng = np.random.default_rng(8)
    p = rng.permutation(A.shape[0])
    As = sp.csr_matrix(A[p][:, p])
    assert BandedSpMV.bandwidth(As) > 500     # scrambled: no band

    pc = PCAIR(AIROptions(reorder="rcm"))
    pc.setup(As)
    bw = BandedSpMV.bandwidth(pc.hierarchy.levels[0].A)
    assert bw < 60, bw                        # re-banded by RCM
    b = rhs(As.shape[0])
    res = pc.solve(b, rtol=1e-6, max_it=10)
    assert res.converged, res.iterations
    x = np.asarray(res.x)
    r = np.linalg.norm(As @ x - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    assert r < 1e-5, r
    # apply() is also in the original space
    y = np.asarray(pc.apply(b))
    assert y.shape == x.shape


def test_set_poly_coefficients_exact_reproduction():
    """PCAIRSetPolyCoeffs exact-reproduction protocol (reference:
    include/pflare.h:244, docs/reuse.md:216-390, tests/ex6f_getcoeffs.F90):
    extract every level's coefficients from a built PC, inject them into a
    FRESH PC before setup, and the rebuilt preconditioner reproduces the
    original residual history exactly (the coefficient iterations are
    skipped, not re-run)."""
    A = adv_diff_2d(32)
    b = rhs(A.shape[0])
    for inv_type in (InverseType.POWER, InverseType.ARNOLDI,
                     InverseType.NEWTON):
        opts = AIROptions(inverse_type=inv_type, poly_order=4,
                          coarsest_inverse_type=inv_type)
        pc1 = PCAIR(opts)
        pc1.setup(A)
        res1 = pc1.solve(b, rtol=1e-10, max_it=20)

        pc2 = PCAIR(opts)
        for lvl in range(pc1.n_levels - 1):
            c = pc1.get_poly_coefficients(lvl)
            if c is not None:
                pc2.set_poly_coefficients(lvl, c)
        cc = pc1.get_poly_coefficients(-1)
        if cc is not None:
            pc2.set_poly_coefficients(-1, cc)
        pc2.setup(A)
        res2 = pc2.solve(b, rtol=1e-10, max_it=20)

        assert res2.iterations == res1.iterations, inv_type
        np.testing.assert_allclose(res2.history, res1.history,
                                   rtol=1e-12, err_msg=str(inv_type))
        # and the coefficients embedded in the rebuilt PC match
        for lvl in range(pc1.n_levels - 1):
            c1 = pc1.get_poly_coefficients(lvl)
            c2 = pc2.get_poly_coefficients(lvl)
            if c1 is not None:
                np.testing.assert_allclose(c2, c1, rtol=1e-14)


def test_ideal_w_with_mf_smoother_uses_real_inverse():
    """Ideal (non-one-point) W with a matrix-free smoother or non-PRODUCT
    z_type must build an ASSEMBLED inverse of A_ff for the prolongator --
    a matrix-free Inverse carries the OPERATOR itself as .mat, and
    falling through to it silently computed W = -(A_ff @ A_fc)."""
    from pflare_tpu import ZType

    A = adv_diff_2d(24)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    for kw in (dict(z_type=ZType.LAIR, matrix_free_polys=True),
               dict(matrix_free_polys=True)):
        opts = AIROptions(one_point_classical_prolong=False, max_levels=4,
                          **kw)
        pc = PCAIR(opts)
        pc.setup(A)
        r = pc.solve(b, rtol=1e-8, max_it=25)
        assert r.converged, kw
        x = np.asarray(r.x)
        res = (np.linalg.norm(A @ x - np.asarray(b))
               / np.linalg.norm(np.asarray(b)))
        assert res < 1e-6, (kw, res)


def test_default_solve_jit_first(monkeypatch):
    """VERDICT r4 #6: the default ``pc.solve()`` runs as ONE jitted XLA
    program -- the eager per-iteration driver (which syncs a norm to host
    every iteration) is never entered, and the per-iteration host-sync
    count is 0 (the dispatch-count probe).  Parity with the eager debug
    path is checked on iterations and solution."""
    import pflare_tpu.solvers as solvers
    import pflare_tpu.solvers.krylov as krylov
    from pflare_tpu import PCAIR, adv_diff_2d

    A = adv_diff_2d(50)
    pc = PCAIR().setup(A)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    res_e = pc.solve(b, rtol=1e-8, max_it=20, eager=True)
    res_er = pc.solve(b, rtol=1e-8, max_it=20, side="right", eager=True)

    sync_calls = []
    monkeypatch.setattr(krylov, "_norm",
                        lambda v: sync_calls.append(1) or 0.0)

    def boom(*a, **k):
        raise AssertionError("eager gmres entered on the default path")

    monkeypatch.setattr(solvers, "gmres", boom)
    res_j = pc.solve(b, rtol=1e-8, max_it=20)
    assert not sync_calls, "default solve must not sync per iteration"
    assert res_j.converged
    assert abs(res_j.iterations - res_e.iterations) <= 1, \
        (res_j.iterations, res_e.iterations)
    rel = float(jnp.linalg.norm(res_j.x - res_e.x)
                / jnp.linalg.norm(res_e.x))
    assert rel < 1e-6, rel
    # right-preconditioned variant agrees with its eager sibling too
    res_jr = pc.solve(b, rtol=1e-8, max_it=20, side="right")
    assert res_jr.converged and abs(res_jr.iterations
                                    - res_er.iterations) <= 1
