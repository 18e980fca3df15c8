"""Fully-jitted device numeric re-setup (air/device_resetup.py).

The reference re-runs numeric setup on stored symbolic state
(reference: src/AIR_MG_Setup.F90 reuse branches, docs/reuse.md); here the
whole numeric re-setup is ONE compiled device program.  These tests check
it reproduces the host re-setup bitwise-closely across configurations.
"""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from pflare_tpu import AIROptions, InverseType, PCAIR
from pflare_tpu.problems import adv_diff_2d


def _perturbed(A, seed=3, eps=0.05):
    rng = np.random.default_rng(seed)
    A2 = A.copy()
    A2.data = A2.data * (1.0 + eps * rng.standard_normal(A2.nnz))
    return A2


def _base_opts(**kw):
    return AIROptions(reuse_sparsity=True, reuse_amount=3,
                      reuse_poly_coeffs=True, max_levels=5, **kw)


def test_device_resetup_matches_host_values():
    """Every rebuilt device operator equals the host re-setup's."""
    A = adv_diff_2d(40)
    A2 = _perturbed(A)
    pc = PCAIR(_base_opts(), jit=False)
    pc.setup(A)
    plan = pc.build_device_resetup()
    new_levels, new_cinv = plan(A2)

    pc.setup(A2, structure="same")
    ref_levels = pc.hierarchy.device_levels
    for li, (nl, rl) in enumerate(zip(new_levels, ref_levels)):
        for key in ("A_ff", "A_fc", "R"):
            d = np.abs(np.asarray(nl[key].data)
                       - np.asarray(rl[key].data)).max()
            assert d < 1e-10, (li, key, d)
        ninv, rinv = nl["inv_Aff"], rl["inv_Aff"]
        assert ninv.kind == rinv.kind
        if ninv.kind == "assembled":
            d = abs(sp.csr_matrix(ninv.mat.to_scipy())
                    - sp.csr_matrix(rinv.mat.to_scipy())).max()
        else:
            d = np.abs(np.asarray(ninv.diag) - np.asarray(rinv.diag)).max()
        assert d < 1e-10, (li, ninv.kind, d)
    hc = pc.hierarchy.coarse_inv
    assert new_cinv.kind == hc.kind
    if new_cinv.kind == "assembled":
        d = abs(sp.csr_matrix(new_cinv.mat.to_scipy())
                - sp.csr_matrix(hc.mat.to_scipy())).max()
        assert d < 1e-8


CONFIGS = {
    "lump": dict(a_lump=True, a_drop=1e-4),
    "mf_smooth": dict(matrix_free_polys=True),
    "fcf_c_smooth": dict(smooth_order=(1, -1, 1)),
    "newton_mf_coarse": dict(coarsest_inverse_type=InverseType.NEWTON,
                             coarsest_matrix_free_polys=True,
                             coarsest_poly_order=10),
    "lu_coarse": dict(coarsest_inverse_type=InverseType.LU),
    "ideal_w": dict(one_point_classical_prolong=False),
    "ideal_w_mf": dict(one_point_classical_prolong=False,
                       matrix_free_polys=True),
    "newton_assembled": dict(inverse_type=InverseType.NEWTON,
                             poly_order=4),
    "newton_assembled_coarse": dict(
        coarsest_inverse_type=InverseType.NEWTON, coarsest_poly_order=6),
    "newton_mf_smooth_sep": dict(inverse_type=InverseType.NEWTON,
                                 matrix_free_polys=True, poly_order=4),
    "strong_r": dict(strong_r_threshold=0.01),
    "strong_r_mf": dict(strong_r_threshold=0.01, matrix_free_polys=True),
    "strong_r_dense": dict(strong_r_threshold=1e-6),
    "improve_z": dict(improve_z_its=2),
    "symmetric_ptap": dict(symmetric=True),
    "lair": dict(z_type=__import__("pflare_tpu").ZType.LAIR),
    "sai_lair": dict(z_type=__import__("pflare_tpu").ZType.LAIR_SAI),
    "sai_smoother": dict(inverse_type=InverseType.SAI),
    "isai_smoother": dict(inverse_type=InverseType.ISAI),
    "constrain_z": dict(constrain_z=True),
    "constrain_wz_ideal": dict(one_point_classical_prolong=False,
                               constrain_w=True, constrain_z=True),
    "improve_wz_ideal": dict(one_point_classical_prolong=False,
                             improve_w_its=2, improve_z_its=1),
    "strong_r_ideal_w": dict(strong_r_threshold=0.01,
                             one_point_classical_prolong=False),
    "full_smooth": dict(full_smoothing_up_and_down=True),
    "full_smooth_mf": dict(full_smoothing_up_and_down=True,
                           matrix_free_polys=True),
    "full_smooth_jac": dict(full_smoothing_up_and_down=True,
                            inverse_type=InverseType.JACOBI),
    "full_smooth_ideal": dict(full_smoothing_up_and_down=True,
                              one_point_classical_prolong=False),
    "full_smooth_sym": dict(full_smoothing_up_and_down=True,
                            symmetric=True),
    "lair_improve_z": dict(z_type=__import__("pflare_tpu").ZType.LAIR,
                           improve_z_its=2),
    "lair_improve_z_mf": dict(z_type=__import__("pflare_tpu").ZType.LAIR,
                              improve_z_its=2, matrix_free_polys=True),
    "sai_lair_improve_z": dict(
        z_type=__import__("pflare_tpu").ZType.LAIR_SAI, improve_z_its=1),
    "lair_improve_z_sai_inv": dict(
        z_type=__import__("pflare_tpu").ZType.LAIR,
        inverse_type=InverseType.SAI, improve_z_its=1),
    "fs_lair_improve_z": dict(z_type=__import__("pflare_tpu").ZType.LAIR,
                              improve_z_its=2,
                              full_smoothing_up_and_down=True),
    "fs_lair_improve_z_jac": dict(
        z_type=__import__("pflare_tpu").ZType.LAIR, improve_z_its=2,
        inverse_type=InverseType.JACOBI,
        full_smoothing_up_and_down=True),
    "fs_lair_improve_z_mf": dict(
        z_type=__import__("pflare_tpu").ZType.LAIR, improve_z_its=2,
        matrix_free_polys=True, full_smoothing_up_and_down=True),
    "fs_lair_improve_z_sai": dict(
        z_type=__import__("pflare_tpu").ZType.LAIR, improve_z_its=1,
        inverse_type=InverseType.SAI, full_smoothing_up_and_down=True),
    # SAI/ISAI inverses have no polynomial plan: the ideal-W and
    # product-Z improve paths must map through the inverse's own
    # (solve sparsity) pattern instead (regression: KeyError at plan
    # build for both)
    "sai_ideal_w": dict(inverse_type=InverseType.SAI,
                        one_point_classical_prolong=False),
    "sai_improve_z": dict(inverse_type=InverseType.SAI, improve_z_its=1),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_device_resetup_solve_parity(name):
    """install() + solve reproduces the host re-setup solve exactly."""
    A = adv_diff_2d(40)
    A2 = _perturbed(A)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    opts = _base_opts(**CONFIGS[name])

    pc = PCAIR(opts, jit=False)
    pc.setup(A)
    plan = pc.build_device_resetup()
    plan.install(pc, A2)
    r_dev = pc.solve(b, rtol=1e-8, max_it=80)

    pc_ref = PCAIR(opts, jit=False)
    pc_ref.setup(A)
    pc_ref.setup(A2, structure="same")
    r_ref = pc_ref.solve(b, rtol=1e-8, max_it=80)

    assert r_dev.converged and r_ref.converged
    assert r_dev.iterations == r_ref.iterations
    dx = (np.linalg.norm(np.asarray(r_dev.x) - np.asarray(r_ref.x))
          / np.linalg.norm(np.asarray(r_ref.x)))
    assert dx < 1e-8, (name, dx)


def test_device_resetup_repeated_installs():
    """Time-dependent use: repeated re-setups stay correct (plan reuse)."""
    A = adv_diff_2d(30)
    pc = PCAIR(_base_opts(), jit=False)
    pc.setup(A)
    plan = pc.build_device_resetup()
    b = jnp.asarray(np.ones(A.shape[0]))
    for step in range(3):
        A2 = _perturbed(A, seed=10 + step, eps=0.02 * (step + 1))
        plan.install(pc, A2)
        r = pc.solve(b, rtol=1e-7, max_it=20)
        assert r.converged, step
        x = np.asarray(r.x)
        tr = np.linalg.norm(A2 @ x - 1.0) / np.sqrt(A.shape[0])
        assert tr < 1e-5, (step, tr)


def test_device_resetup_validation():
    """Unsupported configurations raise with a reason."""
    A = adv_diff_2d(25)
    pc = PCAIR(AIROptions(), jit=False)   # no reuse state
    pc.setup(A)
    with pytest.raises(ValueError, match="reuse_sparsity"):
        pc.build_device_resetup()
    pc2 = PCAIR(AIROptions(reuse_sparsity=True, reuse_amount=3,
                           z_type=__import__("pflare_tpu").ZType.LAIR,
                           symmetric=True), jit=False)
    pc2.setup(A)
    with pytest.raises(ValueError, match="lair with symmetric"):
        pc2.build_device_resetup()
    pc3 = PCAIR(AIROptions(), jit=False)
    with pytest.raises(RuntimeError):
        pc3.build_device_resetup()
    # assembled Newton smoothing runs the factored accumulation over the
    # stored (X@A)|_S step plan -- supported since round 2
    pc4 = PCAIR(_base_opts(inverse_type=InverseType.NEWTON), jit=False)
    pc4.setup(A)
    assert pc4.build_device_resetup() is not None


def test_device_resetup_rejects_wrong_pattern():
    A = adv_diff_2d(25)
    pc = PCAIR(_base_opts(), jit=False)
    pc.setup(A)
    plan = pc.build_device_resetup()
    A_bad = sp.csr_matrix(sp.eye(A.shape[0]))
    with pytest.raises(ValueError, match="SAME sparsity"):
        plan(A_bad)
    with pytest.raises(ValueError, match="nnz"):
        plan(np.ones(3))


def test_device_resetup_auto_truncated():
    """Auto-truncated hierarchies re-setup on device: the truncation
    level is stored structure (kept fixed), the coarse inverse rebuilds
    from the new values, and the truncation probe re-runs ON DEVICE --
    its quality matches the host probe (reference truncation test:
    src/AIR_MG_Setup.F90:158-256)."""
    from pflare_tpu.air.hierarchy import _coarse_solver_quality

    A = adv_diff_2d(20)
    opts = _base_opts(auto_truncate_start_level=2, auto_truncate_tol=0.5,
                      coarsest_poly_order=12)
    pc = PCAIR(opts, jit=False)
    pc.setup(A)
    assert pc.hierarchy.auto_truncated, "config no longer truncates"
    n_lvls = pc.n_levels

    A2 = _perturbed(A, eps=0.01)
    plan = pc.build_device_resetup()
    plan.install(pc, A2)
    assert pc.n_levels == n_lvls           # structure fixed
    assert plan.probe_quality is not None

    # probe parity vs the host quality on an identically rebuilt coarse
    pc_ref = PCAIR(opts, jit=False)
    pc_ref.setup(A2)
    if pc_ref.hierarchy.auto_truncated:
        q_host = _coarse_solver_quality(pc_ref.hierarchy.coarse_matrix,
                                        pc_ref.hierarchy.coarse_inv,
                                        opts.seed)
        assert abs(plan.probe_quality - q_host) < 5e-2

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(A.shape[0]))
    # tol 0.5 accepts a weak coarse solve by design, so the cap is loose
    res = pc.solve(b, rtol=1e-5, max_it=40)
    assert res.converged, int(res.iterations)
    x = np.asarray(res.x)
    rr = np.linalg.norm(A2 @ x - np.asarray(b)) / np.linalg.norm(
        np.asarray(b))
    assert rr < 1e-4, rr
