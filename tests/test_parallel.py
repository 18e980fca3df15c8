"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pflare_tpu import ELL, PCAIR, AIROptions, adv_diff_2d
from pflare_tpu.parallel import (
    make_mesh,
    shard_ell,
    shard_vec,
    shard_hierarchy,
)
from pflare_tpu.air.smooth import vcycle_kaskade


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_spmv_matches():
    A = adv_diff_2d(16)  # 256 rows, divisible by 8
    E = ELL.from_scipy(A)
    mesh = make_mesh(8)
    E_sh = shard_ell(E, mesh)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(256))
    x_sh = shard_vec(x, mesh)
    y = jax.jit(lambda m, v: m.matvec(v))(E_sh, x_sh)
    assert np.allclose(np.asarray(y), A @ np.asarray(x), atol=1e-12)


def test_sharded_spmv_padded():
    A = adv_diff_2d(15)  # 225 rows, NOT divisible by 8 -> padded
    E = ELL.from_scipy(A)
    mesh = make_mesh(8)
    E_sh = shard_ell(E, mesh)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(225))
    y = np.asarray(E_sh.matvec(x))
    assert np.allclose(y[:225], A @ np.asarray(x), atol=1e-12)
    assert np.all(y[225:] == 0.0)


def test_sharded_vcycle_step():
    """Full preconditioned step over the mesh must match the single-device
    result bitwise-close (GSPMD only changes the layout)."""
    A = adv_diff_2d(16)
    pc = PCAIR().setup(A)
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal(256))

    y_single = np.asarray(pc.apply(r))

    mesh = make_mesh(8)
    levels, coarse_inv = shard_hierarchy(pc.hierarchy, mesh)
    r_sh = shard_vec(r, mesh)
    smooth_order = pc.options.smooth_order
    y_sharded = np.asarray(
        jax.jit(lambda lv, ci, rr: vcycle_kaskade(lv, ci, rr, smooth_order))(
            levels, coarse_inv, r_sh
        )
    )
    assert np.allclose(y_sharded, y_single, rtol=1e-10, atol=1e-12)


def test_mesh_sizes():
    for n in (2, 4, 8):
        mesh = make_mesh(n)
        assert mesh.devices.size == n


def test_distributed_tsqr():
    """Local QR + deterministic R-combine reproduces the serial QR and the
    power-basis coefficients exactly (the reference's single-reduction TSQR,
    reference: src/TSQR.F90)."""
    from pflare_tpu.parallel.tsqr import tsqr_r, make_qr_reduce
    from pflare_tpu.inverse import coefficients_power
    from pflare_tpu.problems import random_diag_dominant

    mesh = make_mesh(8)
    K = jnp.asarray(np.random.default_rng(0).standard_normal((256, 7)))
    R = np.asarray(tsqr_r(K, mesh))
    R0 = np.linalg.qr(np.asarray(K), mode="r")
    assert np.allclose(np.abs(R), np.abs(R0), atol=1e-10)

    A = random_diag_dominant(256, 0.03, seed=1)
    E = ELL.from_scipy(A)
    c_ref = coefficients_power(E.matvec, 256, 5, seed=9)
    c_tsqr = coefficients_power(E.matvec, 256, 5, seed=9,
                                qr_reduce=make_qr_reduce(mesh))
    assert np.allclose(c_ref, c_tsqr, rtol=1e-8)


def test_halo_spmv_matches_scipy():
    """Explicit ppermute halo-exchange SpMV == scipy on the 8-shard mesh
    (reference: PetscSF neighbour exchange, SURVEY.md 2.4)."""
    from pflare_tpu.parallel import HaloSpMV

    mesh = make_mesh(8)
    A = adv_diff_2d(32)
    h = HaloSpMV(A, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[0])
    assert np.allclose(np.asarray(h @ x), A @ x, atol=1e-12)
    # non-divisible row count pads transparently
    A2 = adv_diff_2d(30)
    h2 = HaloSpMV(A2, mesh)
    x2 = rng.standard_normal(A2.shape[0])
    assert np.allclose(np.asarray(h2 @ x2), A2 @ x2, atol=1e-12)


def test_halo_spmv_rejects_wide_band():
    from pflare_tpu.parallel import HaloSpMV
    import scipy.sparse as sp
    import pytest as _pt

    mesh = make_mesh(8)
    Abad = sp.random(512, 512, density=0.02,
                     random_state=np.random.RandomState(0), format="csr")
    with _pt.raises(ValueError, match="banded"):
        HaloSpMV(Abad, mesh)


def test_halo_spgemm_parity_and_neighbour_only_hlo():
    """The sharded setup product takes the NEIGHBOUR-ONLY halo path for
    banded partitions: values match the serial fused product exactly and
    the compiled HLO contains collective-permutes but NO all-gather /
    all-to-all of the operator (reference: PetscSF neighbour semantics,
    src/PMISR_Module.F90:476-643; distributed MatMatMult,
    src/AIR_Operators_Setup.F90:993-1033)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pflare_tpu import adv_diff_2d
    from pflare_tpu.parallel import make_mesh
    from pflare_tpu.parallel.halo_spgemm import (_halo_spgemm_core,
                                                 halo_mesh_for,
                                                 spgemm_drop_halo)
    from pflare_tpu.parallel.mesh import row_sharding
    from pflare_tpu.sparse.dell import DELL, spgemm_drop_dell

    A = adv_diff_2d(48)                       # 2304 rows; banded (5-point)
    d = DELL.from_scipy(A, dtype=jnp.float64)
    mesh = make_mesh(8)
    sh = row_sharding(mesh)
    d_sh = DELL(jax.device_put(d.data, sh), jax.device_put(d.cols, sh),
                d.n_cols)
    assert halo_mesh_for(d_sh, d_sh) is not None

    # parity: sharded halo product == serial fused product (A @ A, drop)
    C_ser = spgemm_drop_dell(d, d, 0.1, True, False)
    C_sh = spgemm_drop_dell(d_sh, d_sh, 0.1, True, False)
    assert abs(C_sh.to_scipy() - C_ser.to_scipy()).max() < 1e-13

    # HLO inspection: neighbour-only collectives
    dor = jnp.arange(d.data.shape[0], dtype=jnp.int32)
    lowered = _halo_spgemm_core.lower(d_sh, d_sh, jax.device_put(dor, sh),
                                      0.1, relative=True, lump=False,
                                      mesh=mesh)
    txt = lowered.as_text()
    assert "collective_permute" in txt or "collective-permute" in txt, \
        "halo product must exchange via ppermute"
    for bad in ("all_gather", "all-gather", "all_to_all", "all-to-all"):
        assert bad not in txt, f"halo product must not {bad}"


def test_distributed_setup_spgemms_sharded():
    """setup(A, mesh=...) routes the per-level W/Z/AP/RAP products
    through row-SHARDED DELL products (the distributed MPI MatMatMult
    analogue, reference: src/AIR_Operators_Setup.F90:993-1033) and the
    hierarchy is identical to the serial host one."""
    import numpy as np
    from pflare_tpu import PCAIR, AIROptions, InverseType, adv_diff_2d
    from pflare_tpu.air import operators as ops_mod
    from pflare_tpu.parallel import make_mesh

    A = adv_diff_2d(32)
    # ideal W exercises the W product too
    opts = AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99,
                      max_levels=4, one_point_classical_prolong=False)
    pc_serial = PCAIR(opts)
    pc_serial.setup(A)
    log = []
    ops_mod.MESH_PRODUCT_LOG = log
    try:
        pc_dist = PCAIR(opts)
        pc_dist.setup(A, mesh=make_mesh(8))
    finally:
        ops_mod.MESH_PRODUCT_LOG = None

    names = {name for name, _ in log}
    assert {"W", "Z", "AP", "RAP"} <= names, names
    assert all(sharded for _, sharded in log), log
    # identical hierarchy (same patterns; values to fp-order accuracy)
    assert pc_dist.n_levels == pc_serial.n_levels
    for ls, ld in zip(pc_serial.hierarchy.levels,
                      pc_dist.hierarchy.levels):
        np.testing.assert_array_equal(ls.fine, ld.fine)
        assert ls.R.nnz == ld.R.nnz
        np.testing.assert_allclose(ls.R.data, ld.R.data, rtol=1e-11,
                                   atol=1e-13)
        cs = ls.patterns["coarse_A"]
        cd = ld.patterns["coarse_A"]
        if hasattr(cs, "tocsr"):
            assert cs.nnz == cd.nnz
            assert abs(cs - cd).max() < 1e-11


def test_distributed_setup_slice_identical_hierarchy():
    """VERDICT slice: an 8-shard setup (device PMISR over the mesh +
    distributed TSQR power coefficients) produces the IDENTICAL hierarchy
    to the host path (reference: src/PMISR_Module.F90:476-643,
    src/TSQR.F90:65)."""
    import numpy as np
    import jax.numpy as jnp
    from pflare_tpu import PCAIR, AIROptions, InverseType, adv_diff_2d
    from pflare_tpu.parallel import make_mesh

    A = adv_diff_2d(32)
    opts = AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99,
                      max_levels=4, inverse_type=InverseType.POWER,
                      coarsest_inverse_type=InverseType.POWER)
    pc_serial = PCAIR(opts)
    pc_serial.setup(A)
    pc_dist = PCAIR(opts)
    pc_dist.setup(A, mesh=make_mesh(8))

    assert pc_dist.n_levels == pc_serial.n_levels
    for ls, ld in zip(pc_serial.hierarchy.levels, pc_dist.hierarchy.levels):
        np.testing.assert_array_equal(ls.fine, ld.fine)
        np.testing.assert_array_equal(ls.coarse, ld.coarse)
        assert ls.R.nnz == ld.R.nnz
        np.testing.assert_allclose(ls.R.data, ld.R.data, rtol=1e-12,
                                   atol=1e-14)
        if ls.inv_Aff.coefficients is not None:
            # the distributed TSQR's log-depth butterfly combine rounds
            # differently than one big host QR; the power basis is
            # ill-conditioned, so individual coefficients agree only to
            # reduction accuracy -- the OPERATOR the coefficients define
            # is checked through the solve below
            np.testing.assert_allclose(
                np.asarray(ls.inv_Aff.coefficients),
                np.asarray(ld.inv_Aff.coefficients),
                rtol=5e-2, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pc_serial.hierarchy.coarse_inv.coefficients),
        np.asarray(pc_dist.hierarchy.coarse_inv.coefficients),
        rtol=5e-2, atol=1e-5)
    # the preconditioners are equivalent in action: same iteration count
    # and a converged true residual
    b = jnp.asarray(np.random.default_rng(3).standard_normal(A.shape[0]))
    rs = pc_serial.solve(b, rtol=1e-8, max_it=20)
    rd = pc_dist.solve(b, rtol=1e-8, max_it=20)
    assert rs.converged and rd.converged
    assert rs.iterations == rd.iterations


def test_halo_extraction_parity_and_neighbour_only_hlo():
    """Sharded submatrix extraction takes the NEIGHBOUR-ONLY halo path
    for banded partitions: the extracted operator matches the serial
    one exactly and the compiled HLO contains collective-permutes but
    no all-gather / all-to-all (the distributed MatCreateSubMatrix
    analogue, reference: src/PETSc_Helperk.kokkos.cxx:1801-2403)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pflare_tpu import adv_diff_2d
    from pflare_tpu.parallel import make_mesh
    from pflare_tpu.parallel.halo_spgemm import (_halo_extract_core,
                                                 extract_halo)
    from pflare_tpu.parallel.mesh import row_sharding
    from pflare_tpu.sparse.dell import DELL, PADCOL, extract_dell

    A = adv_diff_2d(48)
    d = DELL.from_scipy(A, dtype=jnp.float64)
    mesh = make_mesh(8)
    sh = row_sharding(mesh)
    d_sh = DELL(jax.device_put(d.data, sh), jax.device_put(d.cols, sh),
                d.n_cols)
    rng = np.random.default_rng(0)
    n = A.shape[0]
    is_f = rng.random(n) < 0.6
    n_f = int(is_f.sum())
    fine_idx = jnp.asarray(np.nonzero(is_f)[0].astype(np.int32))
    f_mask = jnp.asarray(is_f)
    f_new = jnp.asarray((np.cumsum(is_f) - 1).astype(np.int32))

    for ed in (True, False):
        ref = extract_dell(d, fine_idx, f_mask, f_new, n_f, ensure_diag=ed)
        assert extract_halo(d_sh, fine_idx, f_mask, f_new, ed,
                            mesh) is not None
        got = extract_dell(d_sh, fine_idx, f_mask, f_new, n_f,
                           ensure_diag=ed)
        diff = abs(got.to_scipy() - ref.to_scipy())
        assert (diff.max() if diff.nnz else 0.0) < 1e-14

    w_out = -(-n_f // 8)
    ridx_pad = jnp.pad(fine_idx, (0, 8 * w_out - n_f),
                       constant_values=PADCOL)
    txt = _halo_extract_core.lower(d_sh, ridx_pad, f_mask, f_new, True,
                                   mesh=mesh).as_text()
    assert "collective_permute" in txt or "collective-permute" in txt
    for bad in ("all_gather", "all-gather", "all_to_all", "all-to-all"):
        assert bad not in txt, bad


def test_halo_extraction_rejects_rectangular():
    """A rectangular row-sharded operator (col space != row space, e.g.
    the coarse-compressed RAP source) must NOT take the halo path: its
    5-block column window is indexed in row-block units.  The guard
    falls back to the GSPMD gather and extraction stays exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    from pflare_tpu.parallel import make_mesh
    from pflare_tpu.parallel.halo_spgemm import extract_halo
    from pflare_tpu.parallel.mesh import row_sharding
    from pflare_tpu.sparse.dell import DELL, extract_dell

    rng = np.random.default_rng(1)
    n_r, n_c_sp = 16, 32
    A = sp.random(n_r, n_c_sp, density=0.2, random_state=1, format="csr")
    A = sp.csr_matrix(A + sp.eye(n_r, n_c_sp))
    A.sort_indices()
    d = DELL.from_scipy(A, dtype=jnp.float64)
    mesh = make_mesh(8)
    sh = row_sharding(mesh)
    d_sh = DELL(jax.device_put(d.data, sh), jax.device_put(d.cols, sh),
                d.n_cols)
    keep = rng.random(n_c_sp) < 0.7
    cmask = jnp.asarray(keep)
    cnew = jnp.asarray((np.cumsum(keep) - 1).astype(np.int32))
    ridx = jnp.arange(n_r, dtype=jnp.int32)
    assert extract_halo(d_sh, ridx, cmask, cnew, False, mesh) is None
    ref = extract_dell(d, ridx, cmask, cnew, int(keep.sum()))
    got = extract_dell(d_sh, ridx, cmask, cnew, int(keep.sum()))
    diff = abs(got.to_scipy() - ref.to_scipy())
    assert (diff.max() if diff.nnz else 0.0) < 1e-14


def test_auto_reorder_unstructured_neighbour_only():
    """reorder='auto' is the ParMETIS-repartition stand-in (reference:
    src/C_PETSc_Routines.c:17-175, src/Repartition.F90:69-110): an
    unstructured gmsh DG operator (natural bandwidth ~n) is RCM-banded at
    setup so the distributed solve's top matvec takes the NEIGHBOUR-ONLY
    HaloELL path -- collective-permutes only, no all-gather of the
    operator -- while banded operators keep their natural order."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pflare_tpu import PCAIR, AIROptions, adv_diff_2d
    from pflare_tpu.problems import dg_upwind_advection_unstructured
    from pflare_tpu.parallel import make_mesh
    from pflare_tpu.parallel.halo import HaloELL

    A = dg_upwind_advection_unstructured(24)       # 1058 rows, bw 928
    mesh = make_mesh(8)
    pc = PCAIR(AIROptions(reorder="auto", strong_threshold=0.99))
    pc.setup(A)
    assert pc._perm is not None, "auto reorder must engage (bw ~n)"
    E, _, _ = pc._distributed_state(mesh)
    assert isinstance(E, HaloELL), \
        "banded partition must take the halo-exchange top operator"

    # neighbour-only collectives in the top matvec's compiled HLO
    x = jax.device_put(
        jnp.zeros(E.data.shape[0]),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec("rows")))
    lowered = jax.jit(lambda e, v: e.matvec(v)).lower(E, x)
    txt = lowered.as_text()
    assert "collective_permute" in txt or "collective-permute" in txt
    for bad in ("all_gather", "all-gather", "all_to_all", "all-to-all"):
        assert bad not in txt, f"top matvec must not {bad}"

    # the reordered distributed solve matches the natural-order serial one
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    x_m, _ = pc.solve_device(b, max_it=20, mesh=mesh)
    tr = np.linalg.norm(A @ np.asarray(x_m) - np.asarray(b)) \
        / np.linalg.norm(np.asarray(b))
    assert tr < 1e-10, tr

    # structured operators keep natural order under "auto"
    pc2 = PCAIR(AIROptions(reorder="auto"))
    pc2.setup(adv_diff_2d(32))
    assert pc2._perm is None


def test_distributed_agg_splitting_parity():
    """AGG / PMIS_AGG with mesh= run boundary-PMIS + shard-local
    aggregation (reference: src/CF_Splitting.F90:162-225) instead of
    silently computing a serial splitting.  Statistical parity: the
    coarsening fraction matches the serial aggregation within a few
    percent and the resulting PCAIR still converges."""
    import numpy as np
    import jax.numpy as jnp
    from pflare_tpu import (AIROptions, CFSplittingType, PCAIR,
                            adv_diff_2d, compute_cf_splitting)
    from pflare_tpu.parallel import make_mesh

    A = adv_diff_2d(48)
    mesh = make_mesh(8)
    for t in (CFSplittingType.AGG, CFSplittingType.PMIS_AGG):
        f_ser, c_ser = compute_cf_splitting(A, cf_splitting_type=t)
        f_m, c_m = compute_cf_splitting(A, cf_splitting_type=t, mesh=mesh)
        frac_ser = len(c_ser) / A.shape[0]
        frac_m = len(c_m) / A.shape[0]
        assert abs(frac_ser - frac_m) < 0.08, (t, frac_ser, frac_m)
        # the distributed splitting must differ from the serial one ONLY
        # through block-local decisions -- i.e. be a genuine splitting:
        # every node assigned
        assert len(f_m) + len(c_m) == A.shape[0]

        pc = PCAIR(AIROptions(cf_splitting_type=t, max_levels=3))
        pc.setup(A, mesh=mesh)
        b = jnp.asarray(np.random.default_rng(0).standard_normal(
            A.shape[0]))
        res = pc.solve(b, rtol=1e-5, max_it=25)
        assert res.converged, (t, res.iterations)


def test_coarse_level_repartition_neighbour_only():
    """Graph-aware coarse-level repartition (the ParMETIS stand-in;
    reference: src/C_PETSc_Routines.c:17-175, src/Repartition.F90:69-110):
    on the unstructured gmsh DG operator with reorder='auto', coarse
    levels whose natural order fails the neighbour-band check are
    RCM-repartitioned (hierarchy LevelData.coarse_order) so their sharded
    full-space operators take the HaloELL neighbour-exchange path -- the
    compiled level matvec contains collective-permutes and NO
    all-gather/all-to-all -- and the distributed solve still matches the
    operator to machine precision."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pflare_tpu import PCAIR, AIROptions
    from pflare_tpu.problems import dg_upwind_advection_unstructured
    from pflare_tpu.parallel import make_mesh
    from pflare_tpu.parallel.halo import HaloELL

    A = dg_upwind_advection_unstructured(24)       # 1058 rows, bw 928
    mesh = make_mesh(8)
    # natural (user) ordering kept: the coarse-level repartition is the
    # internal fix -- natural coarse bandwidth here is ~n (measured 525
    # at 601 rows), RCM takes it to ~45
    pc = PCAIR(AIROptions(strong_threshold=0.99, max_levels=4,
                          coarse_repartition=True))
    pc.setup(A)
    # at least one coarse level must have engaged the repartition
    reparted = [i for i, lv in enumerate(pc.hierarchy.levels)
                if lv.coarse_order is not None]
    assert reparted, "coarse repartition must engage on the DG operator"

    levels, _ = pc._distributed_state(mesh)[1:]
    # the level AFTER a repartitioned one is banded in its new order:
    # its operators shard onto the halo-exchange path
    lv_next = levels[reparted[0] + 1]
    halo_ops = [k for k, v in lv_next.items() if isinstance(v, HaloELL)]
    assert halo_ops, f"no HaloELL ops on level {reparted[0] + 1}"

    # neighbour-only collectives in a repartitioned level matvec's HLO
    E = lv_next[halo_ops[0]]
    x = jax.device_put(
        jnp.zeros(E.data.shape[0]),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec("rows")))
    txt = jax.jit(lambda e, v: e.matvec(v)).lower(E, x).as_text()
    assert "collective_permute" in txt or "collective-permute" in txt
    for bad in ("all_gather", "all-gather", "all_to_all", "all-to-all"):
        assert bad not in txt, f"repartitioned level matvec must not {bad}"

    # distributed solve parity on the repartitioned hierarchy
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    x_m, _ = pc.solve_device(b, max_it=25, mesh=mesh)
    x_s, _ = pc.solve_device(b, max_it=25)
    assert float(jnp.linalg.norm(x_m - x_s)
                 / jnp.linalg.norm(x_s)) < 1e-12
    tr = np.linalg.norm(A @ np.asarray(x_m) - np.asarray(b)) \
        / np.linalg.norm(np.asarray(b))
    assert tr < 1e-8, tr


def test_coarse_repartition_reuse_stable():
    """Same-pattern re-setup keeps the stored coarse permutation, so
    patterns stay aligned across setups and the solve converges
    identically (reference: the repartition IS slots of the reuse system,
    src/AIR_Data_Type.F90:388-422)."""
    import jax.numpy as jnp
    import numpy as np
    from pflare_tpu import PCAIR, AIROptions
    from pflare_tpu.problems import dg_upwind_advection_unstructured

    A = dg_upwind_advection_unstructured(24)
    opts = AIROptions(strong_threshold=0.99, max_levels=4,
                      coarse_repartition=True,
                      reuse_sparsity=True, reuse_amount=2)
    pc = PCAIR(opts)
    pc.setup(A)
    perms = [None if lv.coarse_order is None else lv.coarse_order.copy()
             for lv in pc.hierarchy.levels]
    assert any(p is not None for p in perms)
    A2 = A.copy()
    A2.data = A2.data * (1 + 1e-4 * np.random.default_rng(1).standard_normal(A.nnz))
    pc.setup(A2, structure="same")
    for p_old, lv in zip(perms, pc.hierarchy.levels):
        if p_old is None:
            assert lv.coarse_order is None
        else:
            assert np.array_equal(p_old, lv.coarse_order)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    res = pc.solve(b, rtol=1e-8, max_it=40)
    assert res.converged, res.iterations
