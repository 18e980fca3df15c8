"""AIR hierarchy setup: the level loop.

Reference: src/AIR_MG_Setup.F90:44-1231 (setup_air_pcmg).  The setup is split
TPU-style: a host symbolic+numeric phase (CF splitting, submatrix extraction,
SpGEMMs, dropping -- producing static patterns) and the device hierarchy
pytree consumed by the jitted cycle.  On a same-pattern re-setup the stored
patterns short-circuit the symbolic work (the reference's reuse_sparsity
system, docs/reuse.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..params import InverseType, ZType, tolerances
from ..options import AIROptions
from ..sparse import ELL
from ..sparse.ops import (
    remove_from_sparse_match,
    remove_small_from_sparse,
    one_point_strongest,
)
from ..cf.splitting import compute_cf_splitting
from ..inverse import build_inverse
from ..inverse.build import Inverse
from .operators import (
    assemble_p,
    assemble_r,
    compute_coarse_matrix,
    compute_w_ideal,
    compute_z_airg,
    compute_z_lair,
    extract_submatrices,
    improve_transfer,
    strong_r_drop,
)
from ..utils.timers import timer
from .constrain import constrain_grid_transfer, smooth_near_nullspace


@dataclass
class LevelData:
    """Host-side record of one level (kept for reuse and stats)."""

    n: int
    fine: np.ndarray
    coarse: np.ndarray
    A: sp.csr_matrix               # level operator (host)
    A_ff: sp.csr_matrix
    A_fc: sp.csr_matrix
    A_cf: sp.csr_matrix | None
    A_cc: sp.csr_matrix | None
    R: sp.csr_matrix
    P: sp.csr_matrix
    inv_Aff: Inverse
    inv_Acc: Inverse | None
    inv_Aff_host: sp.csr_matrix | None = None  # assembled copy when available
    # stored patterns for reuse (reference: reuse_amount >= 2 slots)
    patterns: dict = field(default_factory=dict)
    device: dict | None = None
    # graph-aware coarse repartition (the ParMETIS stand-in): when set,
    # the NEXT level lives in this permuted coarse order and the transfer
    # gathers embody the basis change; all level-local operators keep the
    # natural sorted-coarse convention (see setup_hierarchy)
    coarse_order: np.ndarray | None = None

    def to_device(self, opts: AIROptions, dtype=None):
        if not opts.full_smoothing_up_and_down:
            from .fullspace import build_fullspace_level

            d = build_fullspace_level(self, opts, dtype=dtype)
            self.device = d
            return d
        # full-smoothing branch: honour the requested device dtype here
        # too (the fullspace builder above already does)
        self.inv_Aff._mat_dtype = dtype
        d = {
            "fine": jnp.asarray(self.fine, dtype=jnp.int32),
            "coarse": jnp.asarray(self.coarse, dtype=jnp.int32),
            "A_ff": ELL.from_scipy(self.A_ff, dtype=dtype),
            "A_fc": ELL.from_scipy(self.A_fc, dtype=dtype),
            "inv_Aff": self.inv_Aff,
            "R": ELL.from_scipy(self.R, dtype=dtype),
            "P": ELL.from_scipy(self.P, dtype=dtype),
            "A": ELL.from_scipy(self.A, dtype=dtype),
        }
        if opts.any_c_smooths and self.A_cc is not None:
            d["A_cf"] = ELL.from_scipy(self.A_cf, dtype=dtype)
            d["A_cc"] = ELL.from_scipy(self.A_cc, dtype=dtype)
            d["inv_Acc"] = self.inv_Acc
        self.device = d
        return d


class _HostShim:
    """nnz/shape placeholder for a freed host matrix -- the reference
    destroys the level matrix and substitutes a matshell when only
    F-smoothing needs it (reference: src/AIR_MG_Setup.F90:614-639).
    Stats keep working; the memory is released."""

    __slots__ = ("nnz", "shape")

    def __init__(self, M):
        self.nnz = int(M.nnz)
        self.shape = tuple(M.shape)


@dataclass
class Hierarchy:
    levels: list            # list[LevelData]
    coarse_matrix: sp.csr_matrix
    coarse_inv: Inverse
    options: AIROptions
    auto_truncated: bool = False
    _device_levels: list | None = None
    near_nullspace: list | None = None

    @property
    def n_levels(self):
        return len(self.levels) + 1

    device_dtype = None  # set by PCAIR(dtype=...) for f32/bf16 solves

    @property
    def device_levels(self):
        """Device pytree of the hierarchy, uploaded lazily on first use
        (the h2d copy belongs to the warmup phase, like the reference's
        prelim-solve "gpu copy stage", reference: tests/adv_diff_fd.c:327)."""
        if self._device_levels is None:
            self._device_levels = [
                lvl.to_device(self.options, dtype=self.device_dtype)
                for lvl in self.levels
            ]
            if not self.options.reuse_sparsity:
                self.compact_host()
        return self._device_levels

    def compact_host(self):
        """Release host CSR copies the live configuration can no longer
        need (no sparsity reuse): every matrix except the finest operator
        is replaced by an nnz/shape shim once its device form exists
        (reference memory economy: src/AIR_MG_Setup.F90:614-639)."""
        for i, lvl in enumerate(self.levels):
            if lvl.device is None:
                continue
            for name in ("A_ff", "A_fc", "A_cf", "A_cc", "R", "P"):
                M = getattr(lvl, name)
                if M is not None and not isinstance(M, _HostShim):
                    setattr(lvl, name, _HostShim(M))
            if i > 0 and not isinstance(lvl.A, _HostShim):
                lvl.A = _HostShim(lvl.A)
            lvl.inv_Aff_host = None
            if isinstance(lvl.patterns.get("coarse_A"), sp.csr_matrix):
                lvl.patterns["coarse_A"] = _HostShim(
                    lvl.patterns["coarse_A"])
            for key in ("W_drop", "Z_drop", "RAP_drop"):
                if isinstance(lvl.patterns.get(key), sp.csr_matrix):
                    lvl.patterns[key] = _HostShim(lvl.patterns[key])

    @device_levels.setter
    def device_levels(self, value):
        self._device_levels = value


def _is_diagonal_only(A: sp.csr_matrix) -> bool:
    """MATDIAGONAL fast path detection (reference:
    src/C_PETSc_Routines.c:324, src/AIR_MG_Setup.F90:405-522)."""
    # a canonical CSR with more entries than rows must hold an
    # off-diagonal -- O(1) short-circuit for every real operator
    if A.nnz > A.shape[0]:
        return False
    rows = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    return bool(np.all(rows == A.indices))


def _diag_inverse(A: sp.csr_matrix) -> Inverse:
    d = np.where(A.diagonal() != 0, 1.0 / A.diagonal(), 0.0)
    inv = Inverse("diagonal", diag=jnp.asarray(d))
    inv.host_diag = d
    return inv


def _build_aff_inverse(A_ff, opts: AIROptions, inverse_type, poly_order,
                       sparsity_order, matrix_free, coefficients=None,
                       patterns=None, plan_key=None, qr_reduce=None):
    if _is_diagonal_only(A_ff):
        return _diag_inverse(A_ff)
    poly_plan = None
    if patterns is not None and plan_key is not None:
        poly_plan = patterns.get(plan_key)
    inv = build_inverse(
        None, inverse_type, poly_order=poly_order, sparsity_order=sparsity_order,
        matrix_free=matrix_free, diag_scale=opts.diag_scale_polys,
        coefficients=coefficients, A_scipy=A_ff, seed=opts.seed,
        poly_plan=poly_plan, qr_reduce=qr_reduce,
    )
    # cache a numeric plan for assembled polynomial rebuilds on reuse
    # (NEWTON assembled shares the plan's S pattern + (X@A)|_S step plan;
    # its device rebuild runs the factored accumulation over that plan,
    # device_resetup._exec_newton_poly)
    if (patterns is not None and plan_key is not None and poly_plan is None
        and opts.reuse_sparsity and opts.reuse_amount >= 3
            and inv.kind == "assembled" and inverse_type in (
                InverseType.POWER, InverseType.ARNOLDI,
                InverseType.NEWTON, InverseType.NEWTON_NO_EXTRA)):
        from ..sparse.pattern import SparsityPattern
        from ..sparse.spgemm import FixedSparsityPolyPlan

        pa = SparsityPattern(A_ff.indptr, A_ff.indices, A_ff.shape)
        patterns[plan_key] = FixedSparsityPolyPlan(
            pa, max(1, min(poly_order, max(A_ff.shape[0] - 1, 0))),
            sparsity_order)
    return inv


def _coarse_solver_quality(A: sp.csr_matrix, inv: Inverse, seed: int) -> float:
    """Relative residual of the coarse solver on a random RHS (the
    auto-truncation probe, reference: src/AIR_MG_Setup.F90:158-256)."""
    rng = np.random.default_rng(seed + 101)
    b = jnp.asarray(rng.standard_normal(A.shape[0]))
    x = inv.apply(b)
    r = b - jnp.asarray(A @ np.asarray(x))
    return float(jnp.linalg.norm(r) / jnp.linalg.norm(b))


def setup_hierarchy(A: sp.csr_matrix, opts: AIROptions,
                    previous: Hierarchy | None = None,
                    near_nullspace=None, mesh=None,
                    injected_coeffs: dict | None = None) -> Hierarchy:
    """Build (or numerically rebuild, when ``previous`` is given and the
    pattern is unchanged) the full AIR hierarchy.

    ``mesh``: distributed-setup slice -- the PMISR Luby rounds run on
    device over the mesh (reference: the PetscSF halo exchange inside
    PMISR, src/PMISR_Module.F90:476-643) and power-basis coefficients use
    the distributed TSQR reduction (reference: src/TSQR.F90:65,
    src/Gmres_Poly.F90:552-776).  The produced hierarchy is IDENTICAL to
    the serial one (same measures, deterministic combines)."""
    A = sp.csr_matrix(A)
    A.sort_indices()
    tol = tolerances(A.dtype)
    levels: list[LevelData] = []
    reuse = previous is not None
    auto_truncated = False

    # near-nullspace vectors for constraints (reference:
    # src/Constrain_Z_or_W.F90:19-118)
    left_nulls = right_nulls = None
    if opts.constrain_z or opts.constrain_w:
        if near_nullspace is None:
            near_nullspace = [np.ones(A.shape[0])]
        if opts.constrain_z:
            left_nulls = [v.copy() for v in near_nullspace]
        if opts.constrain_w:
            right_nulls = [v.copy() for v in near_nullspace]

    qr_reduce = None
    if mesh is not None and (opts.inverse_type == InverseType.POWER
                             or opts.coarsest_inverse_type
                             == InverseType.POWER):
        from ..parallel.tsqr import make_qr_reduce

        qr_reduce = make_qr_reduce(mesh)

    level_idx = 0
    while level_idx < opts.max_levels - 1:
        n = A.shape[0]

        # ~~~~~~~~~~ auto-truncation probe ~~~~~~~~~~
        if (opts.auto_truncate_start_level > 0
                and level_idx + 1 >= opts.auto_truncate_start_level):
            with timer("air_inverse"):
                probe_inv = build_inverse(
                    None, opts.coarsest_inverse_type,
                    poly_order=opts.coarsest_poly_order,
                    sparsity_order=opts.coarsest_inverse_sparsity_order,
                    matrix_free=opts.coarsest_matrix_free_polys,
                    diag_scale=opts.coarsest_diag_scale_polys,
                    A_scipy=A, seed=opts.seed,
                )
            if _coarse_solver_quality(A, probe_inv, opts.seed) <= \
                    opts.auto_truncate_tol:
                auto_truncated = True
                coarse_inv = probe_inv
                break

        # ~~~~~~~~~~ CF splitting ~~~~~~~~~~
        if reuse and level_idx < len(previous.levels):
            fine = previous.levels[level_idx].fine
            coarse = previous.levels[level_idx].coarse
        else:
            with timer("air_coarsen"):
                fine, coarse = compute_cf_splitting(
                    A, opts.symmetric, opts.strong_threshold,
                    opts.max_luby_steps, opts.cf_splitting_type,
                    opts.ddc_its, opts.ddc_fraction, seed=opts.seed,
                    cr_inverse_type=opts.inverse_type,
                    cr_poly_order=opts.poly_order,
                    cr_sparsity_order=opts.inverse_sparsity_order,
                    cr_diag_scale=opts.diag_scale_polys,
                    mesh=mesh,
                )

        # coarsen-or-stop (reference: src/AIR_MG_Setup.F90:316-363)
        if len(coarse) <= opts.coarse_eq_limit or len(fine) == 0:
            break

        prev_lvl = previous.levels[level_idx] if (
            reuse and level_idx < len(previous.levels)) else None
        # reuse_amount gating (reference: AIR_Data_Type.F90:388-422):
        # 1 keeps only the CF splitting; >=2 also the stored patterns
        if prev_lvl is not None and opts.reuse_amount < 2:
            prev_lvl = None
        injected = (injected_coeffs or {}).get(level_idx)
        if (prev_lvl is not None and injected is None and mesh is None
                and "host_fast" in prev_lvl.patterns):
            # numeric-only rebuild from the cached index plans (the
            # MAT_REUSE fast path, see host_resetup.py)
            from .host_resetup import rebuild_level

            lvl = rebuild_level(A, prev_lvl, opts)
        else:
            lvl = _build_level(A, fine, coarse, opts, prev_lvl,
                               left_nulls, right_nulls,
                               qr_reduce=qr_reduce, injected=injected,
                               mesh=mesh)
        levels.append(lvl)
        # ~~~~~~~~~~ graph-aware coarse-level repartition ~~~~~~~~~~
        # The ParMETIS stand-in (reference: src/C_PETSc_Routines.c:17-175,
        # src/Repartition.F90:69-110): when the natural coarse order fails
        # the neighbour-band check, RCM-band the next level's operator so
        # its distributed full-space operators compile to neighbour
        # collectives (docs/tpu.md).  The basis change lives entirely in
        # the transfer array (``coarse_order``); every level-local object
        # and stored reuse pattern keeps the sorted-coarse convention, and
        # on re-setups the stored permutation is reapplied so patterns
        # stay aligned across setups.
        perm = None
        _cr = opts.coarse_repartition
        if _cr is None:
            _cr = opts.reorder in ("auto", "rcm")
        if prev_lvl is not None and "coarse_perm" in prev_lvl.patterns:
            perm = prev_lvl.patterns["coarse_perm"]
        elif (_cr and mesh is None
              and not opts.full_smoothing_up_and_down
              and isinstance(lvl.patterns.get("coarse_A"), sp.csr_matrix)):
            from ..parallel.repartition import coarse_repartition_perm

            perm = coarse_repartition_perm(lvl.patterns["coarse_A"])
        coarse_used = coarse
        if perm is not None:
            lvl.coarse_order = np.asarray(lvl.coarse)[perm]
            lvl.patterns["coarse_perm"] = perm
            Ap = sp.csr_matrix(lvl.patterns["coarse_A"][perm][:, perm])
            Ap.sort_indices()
            lvl.patterns["coarse_A"] = Ap
            coarse_used = lvl.coarse_order
        # restrict near-nullspace vectors to the coarse grid
        if left_nulls is not None:
            left_nulls = [v[coarse_used] for v in left_nulls]
        if right_nulls is not None:
            right_nulls = [v[coarse_used] for v in right_nulls]
        A = lvl.patterns["coarse_A"]
        level_idx += 1

    # ~~~~~~~~~~ coarse solve ~~~~~~~~~~
    if not auto_truncated:
        with timer("air_inverse"):
            if _is_diagonal_only(A):
                coarse_inv = _diag_inverse(A)
            else:
                prev_coeffs = (injected_coeffs or {}).get(-1)
                if (prev_coeffs is None and reuse and opts.reuse_poly_coeffs
                        and previous.coarse_inv is not None):
                    prev_coeffs = np.asarray(previous.coarse_inv.coefficients)
                coarse_inv = build_inverse(
                    None, opts.coarsest_inverse_type,
                    poly_order=opts.coarsest_poly_order,
                    sparsity_order=opts.coarsest_inverse_sparsity_order,
                    matrix_free=opts.coarsest_matrix_free_polys,
                    diag_scale=opts.coarsest_diag_scale_polys,
                    A_scipy=A, seed=opts.seed, coefficients=prev_coeffs,
                    qr_reduce=qr_reduce,
                )

    h = Hierarchy(levels, A, coarse_inv, opts,
                  auto_truncated=auto_truncated)
    h.near_nullspace = near_nullspace     # device re-setup re-smooths these
    return h


def _build_level(A, fine, coarse, opts: AIROptions, prev: LevelData,
                 left_nulls=None, right_nulls=None,
                 qr_reduce=None, injected=None, mesh=None) -> LevelData:
    """Build one level's operators (reference:
    src/AIR_Operators_Setup.F90:36-1082).

    ``mesh``: the W/Z/AP/RAP SpGEMMs run as row-sharded device products
    over the mesh (operators.mesh_matmat_drop -- the distributed MPI
    MatMatMult analogue, reference: src/AIR_Operators_Setup.F90:993-1033)
    instead of serial host products."""
    n = A.shape[0]
    patterns = prev.patterns if prev is not None else {}

    if (opts.constrain_z or opts.constrain_w) and (
            left_nulls is not None or right_nulls is not None):
        with timer("air_constrain"):
            smooth_near_nullspace(A, left_nulls, right_nulls)

    with timer("air_extract"):
        need_acc = opts.any_c_smooths and not opts.full_smoothing_up_and_down
        A_ff, A_fc, A_cf, A_cc = extract_submatrices(A, fine, coarse,
                                                     need_acc=need_acc)

    # START the power-basis coefficient reduction as soon as A_ff exists,
    # so the strong-R drops below overlap the in-flight distributed TSQR
    # (reference: the non-blocking coefficient comms posted before the
    # remaining submatrix work, src/AIR_Operators_Setup.F90:112-153,
    # src/TSQR.F90:65); finished at the inverse build.
    pending_coeffs = None
    smooth_mat = A if opts.full_smoothing_up_and_down else A_ff
    _have_coeffs = (injected is not None
                    or (prev is not None and opts.reuse_poly_coeffs
                        and prev.inv_Aff.coefficients is not None))
    if (qr_reduce is not None and not _have_coeffs
            and opts.inverse_type == InverseType.POWER
            and not _is_diagonal_only(smooth_mat)):
        from ..inverse.build import _clamp_orders
        from ..inverse.gmres_poly import coefficients_power_start

        with timer("air_inverse"):
            import jax as _jax

            n_s = smooth_mat.shape[0]
            order_c, _ = _clamp_orders(n_s, opts.poly_order,
                                       opts.inverse_sparsity_order)
            # mirror build_inverse's host path exactly: diagonal scaling
            # fits the coefficients to D^-1 A, and the matrix dtype is
            # respected (an f32 end-to-end setup must not upcast the
            # Krylov basis)
            _dt = (None if (smooth_mat.data.dtype == np.float64
                            and not _jax.config.jax_enable_x64)
                   else smooth_mat.data.dtype)
            if opts.diag_scale_polys:
                _d = np.asarray(smooth_mat.diagonal())
                _mv = (lambda M, d: (lambda v: (M @ v) / d))(smooth_mat, _d)
            else:
                _mv = (lambda M: (lambda v: M @ v))(smooth_mat)
            pending_coeffs = coefficients_power_start(
                _mv, n_s, order_c, dtype=_dt,
                seed=opts.seed, qr_reduce=qr_reduce, xp=np)

    # strong-R dropped copies used only for the grid transfers.  On a
    # same-pattern re-setup the DROPPED patterns are reuse slots: values
    # restrict onto the stored structure instead of re-discovering it
    # (reference: the MAT_*_DROP reuse slots, src/AIR_Data_Type.F90:388;
    # remove_from_sparse_match src/PETSc_Helper.F90:490)
    with timer("air_drop"):
        if (prev is not None and opts.strong_r_threshold != 0.0
                and "Aff_drop" in patterns):
            A_ff_drop = remove_from_sparse_match(A_ff, patterns["Aff_drop"])
            A_cf_drop = remove_from_sparse_match(A_cf, patterns["Acf_drop"])
            A_fc_drop = (remove_from_sparse_match(A_fc,
                                                  patterns["Afc_drop"])
                         if patterns.get("Afc_drop") is not None else None)
        else:
            A_ff_drop, A_cf_drop, A_fc_drop = strong_r_drop(
                A, fine, coarse, opts.strong_r_threshold,
                need_afc=not opts.one_point_classical_prolong,
            )
            if (A_ff_drop is not None and opts.reuse_sparsity
                    and opts.reuse_amount >= 2):
                patterns["Aff_drop"] = A_ff_drop
                patterns["Acf_drop"] = A_cf_drop
                patterns["Afc_drop"] = A_fc_drop
    if A_ff_drop is None:
        A_ff_drop, A_cf_drop, A_fc_drop = A_ff, A_cf, A_fc

    # ~~~~~~~~~~ approximate inverse of A_ff (smoother) ~~~~~~~~~~
    with timer("air_inverse"):
        # PCAIRSetPolyCoeffs injection wins over reuse_poly_coeffs
        # (reference: include/pflare.h:244, docs/reuse.md:216-390)
        prev_coeffs = injected
        if prev_coeffs is None and prev is not None and opts.reuse_poly_coeffs:
            prev_coeffs = (np.asarray(prev.inv_Aff.coefficients)
                           if prev.inv_Aff.coefficients is not None else None)
        if prev_coeffs is None and pending_coeffs is not None:
            # FINISH the reduction posted before the drops: the only
            # blocking point of the overlapped coefficient computation
            from ..inverse.gmres_poly import coefficients_power_finish

            prev_coeffs = coefficients_power_finish(pending_coeffs)
        inv_Aff = _build_aff_inverse(
            smooth_mat, opts, opts.inverse_type, opts.poly_order,
            opts.inverse_sparsity_order, opts.matrix_free_polys,
            coefficients=prev_coeffs, patterns=patterns,
            plan_key="inv_aff_poly_plan", qr_reduce=qr_reduce,
        )

        # AIRG needs an *assembled* inverse of the dropped A_ff for Z
        # (reference: src/AIR_Operators_Setup.F90:406-475).  The ideal
        # (non-one-point) W needs one too, for ANY z_type: a matrix-free
        # smoother's Inverse carries the operator itself as .mat, so
        # falling through to _assembled_host(inv_Aff) would silently
        # compute W = -(A_ff @ A_fc), and a full-smoothing inverse acts
        # on the whole matrix (wrong shape).
        inv_Aff_host = None
        needs_assembled = (opts.z_type == ZType.PRODUCT
                           or (not opts.symmetric
                               and not opts.one_point_classical_prolong))
        if needs_assembled:
            if (opts.strong_r_threshold != 0.0
                    or opts.full_smoothing_up_and_down
                    or opts.matrix_free_polys
                    or inv_Aff.kind != "assembled" and inv_Aff.kind != "diagonal"):
                prev_drop = None
                if (injected is None and prev is not None
                        and opts.reuse_poly_coeffs):
                    prev_drop = patterns.get("inv_dropped_coeffs")
                inv_dropped = _build_aff_inverse(
                    A_ff_drop, opts, opts.inverse_type, opts.poly_order,
                    opts.inverse_sparsity_order, matrix_free=False,
                    coefficients=prev_drop,
                    patterns=patterns, plan_key="inv_aff_drop_poly_plan",
                )
                if inv_dropped.coefficients is not None:
                    patterns["inv_dropped_coeffs"] = np.asarray(
                        inv_dropped.coefficients)
            else:
                inv_dropped = inv_Aff
            inv_Aff_host = _assembled_host(inv_dropped)

    # ~~~~~~~~~~ C-point smoother inverse ~~~~~~~~~~
    inv_Acc = None
    if need_acc:
        with timer("air_inverse"):
            inv_Acc = _build_aff_inverse(
                A_cc, opts, opts.c_inverse_type_eff, opts.c_poly_order_eff,
                opts.c_inverse_sparsity_order_eff, opts.matrix_free_polys,
                patterns=patterns, plan_key="inv_acc_poly_plan",
            )

    inv_diag_Aff = None
    if opts.improve_w_its > 0 or opts.improve_z_its > 0:
        # reference: the diagonal of the approximate inverse itself
        # (src/Grid_Transfer_Improve.F90:60-66)
        if inv_Aff_host is not None:
            inv_diag_Aff = np.asarray(inv_Aff_host.diagonal())
        elif inv_Aff.kind in ("assembled", "diagonal"):
            inv_diag_Aff = np.asarray(_assembled_host(inv_Aff).diagonal())
            if inv_diag_Aff.shape[0] != A_ff.shape[0]:
                # full-smoothing inverse acts on the WHOLE matrix; the
                # improvement wants diag(A_ff_inv) at the fine points only
                inv_diag_Aff = inv_diag_Aff[np.asarray(fine)]
        else:
            d = A_ff.diagonal()
            inv_diag_Aff = np.where(d != 0, 1.0 / d, 0.0)

    # ~~~~~~~~~~ W (prolongator component) ~~~~~~~~~~
    W_drop = None
    if not opts.symmetric:
        with timer("air_prolong"):
            if opts.one_point_classical_prolong:
                if prev is not None and "W_drop" in patterns:
                    W_drop = patterns["W_drop"]  # never changes on reuse
                else:
                    W_drop = one_point_strongest(A_fc)
            else:
                inv_w = (inv_Aff_host if inv_Aff_host is not None
                         else _assembled_host(inv_Aff))
                if mesh is not None:
                    from .operators import mesh_matmat_drop

                    W = mesh_matmat_drop(inv_w, A_fc_drop, 0.0, False,
                                         mesh, name="W")
                    W.data *= -1.0
                else:
                    W = compute_w_ideal(inv_w, A_fc_drop)
                if opts.improve_w_its > 0:
                    W = improve_transfer(W, A_ff, A_fc, inv_diag_Aff,
                                         opts.improve_w_its, is_z=False)
                # (improve keeps W's pattern fixed, so the plan stays
                # valid with improve_w_its > 0)
                if (opts.reuse_sparsity and opts.reuse_amount >= 3
                        and inv_Aff_host is not None
                        and "W_numeric_plan" not in patterns):
                    # plans feed the DEVICE re-setup only (amount >= 3)
                    patterns["W_numeric_plan"] = _make_product_plan(
                        inv_Aff_host, A_fc_drop, W)
                if prev is not None and "W_drop" in patterns:
                    W_drop = remove_from_sparse_match(W, patterns["W_drop"])
                else:
                    W_drop = remove_small_from_sparse(
                        W, opts.r_drop, relative_max_row_tol=1)
            if opts.constrain_w and right_nulls is not None:
                with timer("air_constrain"):
                    W_drop = constrain_grid_transfer(
                        W_drop, [v[fine] for v in right_nulls],
                        [v[coarse] for v in right_nulls], is_z=False)
            patterns["W_drop"] = W_drop

    # ~~~~~~~~~~ Z (restrictor component) ~~~~~~~~~~
    z_pre_dropped = None
    with timer("air_restrict"):
        if opts.z_type == ZType.PRODUCT:
            if (prev is None and opts.improve_z_its == 0
                    and not (opts.reuse_sparsity
                             and opts.reuse_amount >= 3)):
                # nothing downstream needs the un-dropped Z (amount 2
                # stores only the DROPPED pattern; the triple plans of
                # amount >= 3 are what need the full product): fuse the
                # -A_cf@inv product with the r_drop into one sweep --
                # row-sharded over the mesh when one is given, else the
                # native host kernel
                if mesh is not None:
                    from .operators import mesh_matmat_drop

                    zd = mesh_matmat_drop(A_cf_drop, inv_Aff_host,
                                          opts.r_drop, False, mesh,
                                          name="Z")
                else:
                    from ..native import spgemm_drop_native

                    zd = spgemm_drop_native(A_cf_drop, inv_Aff_host,
                                            opts.r_drop, relative=1,
                                            lump=0)
                if zd is not None:
                    zd.data *= -1.0
                    z_pre_dropped = zd
            elif (prev is not None
                    and patterns.get("Z_numeric_plan") is None
                    and opts.improve_z_its == 0
                    and not (opts.constrain_z and left_nulls is not None)
                    and "Z_drop" in patterns
                    and sp.issparse(patterns["Z_drop"])):
                # numeric-only re-product straight onto the stored Z_drop
                # pattern (MAT_REUSE_MATRIX semantics) -- never
                # materialises the undropped Z, whose allocation
                # dominated re-setup wall time
                from ..native import spgemm_onto_pattern_native

                zd = spgemm_onto_pattern_native(
                    A_cf_drop, inv_Aff_host, patterns["Z_drop"],
                    lump=False)
                if zd is not None:
                    zd.data *= -1.0
                    z_pre_dropped = zd
            zplan = patterns.get("Z_numeric_plan")
            if z_pre_dropped is not None:
                Z = None
            elif (prev is not None and zplan is not None
                    and zplan.pat_A.nnz == A_cf_drop.nnz
                    and zplan.pat_B.nnz == inv_Aff_host.nnz):
                # amount>=3: execute the stored plan so the host re-setup
                # stays bitwise-paired with the device re-setup (both
                # reproduce the plan's value-pruned product pattern)
                Z = _plan_product_host(zplan, A_cf_drop, inv_Aff_host)
                Z.data *= -1.0
            else:
                # fresh fused product on re-setup as well: the inputs'
                # patterns are unchanged (structure='same'), so the
                # product pattern is reproduced exactly and the stored
                # Z_drop match below gives the reference's
                # MAT_REUSE_MATRIX result.  (The triple-plan bincount
                # re-product measured SLOWER than Gustavson at 512^2 --
                # plans are built only for the DEVICE re-setup, gated
                # at reuse_amount >= 3.)
                if mesh is not None:
                    from .operators import mesh_matmat_drop

                    Z = mesh_matmat_drop(A_cf_drop, inv_Aff_host, 0.0,
                                         False, mesh, name="Z")
                    Z.data *= -1.0
                else:
                    Z = compute_z_airg(A_cf_drop, inv_Aff_host)
                if (opts.reuse_sparsity and opts.reuse_amount >= 3
                        and "Z_numeric_plan" not in patterns):
                    patterns["Z_numeric_plan"] = _make_product_plan(
                        A_cf_drop, inv_Aff_host, Z)
        else:
            lair_pat = patterns.get("Z_lair_sparsity")
            Z = compute_z_lair(A_ff, A_cf, A_ff_drop, A_cf_drop,
                               opts.lair_distance,
                               incomplete=(opts.z_type == ZType.LAIR),
                               sparsity=lair_pat)
            if (lair_pat is None and opts.reuse_sparsity
                    and opts.reuse_amount >= 2):
                patterns["Z_lair_sparsity"] = sp.csr_matrix(
                    (np.ones(Z.nnz), Z.indices.copy(), Z.indptr.copy()),
                    shape=Z.shape)
        if opts.improve_z_its > 0:
            Z = improve_transfer(Z, A_ff, A_cf, inv_diag_Aff,
                                 opts.improve_z_its, is_z=True)

    with timer("air_drop"):
        if z_pre_dropped is not None:
            Z_drop = z_pre_dropped
        elif prev is not None and "Z_drop" in patterns:
            Z_drop = remove_from_sparse_match(Z, patterns["Z_drop"])
        else:
            Z_drop = remove_small_from_sparse(Z, opts.r_drop,
                                              relative_max_row_tol=1)
        patterns["Z_drop"] = Z_drop
    if opts.constrain_z and left_nulls is not None:
        with timer("air_constrain"):
            Z_drop = constrain_grid_transfer(
                Z_drop, [v[fine] for v in left_nulls],
                [v[coarse] for v in left_nulls], is_z=True)

    # ~~~~~~~~~~ assemble R, P ~~~~~~~~~~
    with timer("air_restrict"):
        R = assemble_r(Z_drop, fine, coarse, n)
    with timer("air_prolong"):
        if opts.symmetric:
            P = sp.csr_matrix(R.T)
        else:
            P = assemble_p(W_drop, fine, coarse, n)

    # ~~~~~~~~~~ RAP ~~~~~~~~~~
    AP = None
    with timer("air_rap"):
        ap_plan = patterns.get("AP_numeric_plan")
        rap_plan = patterns.get("RAP_numeric_plan")
        if (prev is not None and "RAP_drop" in patterns
                and ap_plan is not None
                and ap_plan.pat_A.nnz == A.nnz
                and ap_plan.pat_B.nnz == P.nnz):
            # amount>=3: execute the stored plans -- bitwise-paired with
            # the device re-setup (same value-pruned product patterns)
            AP = _plan_product_host(ap_plan, A, P)
            RAP = _plan_product_host(rap_plan, R, AP)
            coarse_A = remove_from_sparse_match(RAP, patterns["RAP_drop"],
                                                lump=opts.a_lump)
        elif prev is not None and "RAP_drop" in patterns:
            # amount 2: numeric-only re-product straight onto the stored
            # dropped pattern with fused lumping (MAT_REUSE_MATRIX
            # semantics; the undropped RAP is never materialised -- its
            # allocation dominated re-setup wall time)
            from ..native import spgemm_onto_pattern_native

            Rm = sp.csr_matrix(P.T).tocsr() if opts.symmetric else R
            from .operators import ap_product

            AP = ap_product(A, P)
            coarse_A = (spgemm_onto_pattern_native(
                Rm, AP, patterns["RAP_drop"], lump=opts.a_lump)
                if sp.issparse(patterns["RAP_drop"]) else None)
            if coarse_A is None:      # numpy fallback (PFLARE_NO_NATIVE)
                RAP = sp.csr_matrix(Rm @ AP)
                coarse_A = remove_from_sparse_match(
                    RAP, patterns["RAP_drop"], lump=opts.a_lump)
        else:
            # symmetric PtAP shares the plan structure: P = R^T exactly,
            # so RAP = P^T (A P) = R (A P) -- same two products
            want_plans = (opts.reuse_sparsity and opts.reuse_amount >= 3)
            if mesh is not None and not opts.symmetric:
                from .operators import mesh_matmat_drop

                AP = mesh_matmat_drop(A, P, 0.0, False, mesh, name="AP")
                coarse_A = mesh_matmat_drop(R, AP, opts.a_drop,
                                            opts.a_lump, mesh, name="RAP")
                RAP = sp.csr_matrix(R @ AP) if want_plans else None
                if RAP is not None:
                    RAP.sort_indices()
            else:
                coarse_A, RAP, AP = compute_coarse_matrix(
                    A, R, P, opts.a_drop, opts.a_lump, opts.symmetric,
                    need_rap=want_plans)
            patterns["RAP_drop"] = coarse_A
            if want_plans:
                patterns["AP_numeric_plan"] = _make_product_plan(A, P, AP)
                patterns["RAP_numeric_plan"] = _make_product_plan(R, AP, RAP)
    patterns["coarse_A"] = coarse_A

    lvl = LevelData(
        n=n, fine=fine, coarse=coarse, A=A, A_ff=A_ff, A_fc=A_fc,
        A_cf=A_cf if need_acc else None, A_cc=A_cc, R=R, P=P,
        inv_Aff=inv_Aff, inv_Acc=inv_Acc, inv_Aff_host=inv_Aff_host,
        patterns=patterns,
    )
    if (prev is None and mesh is None and injected is None
            and opts.reuse_sparsity and opts.reuse_amount >= 2):
        from .host_resetup import build_plan, eligible

        if eligible(opts) and AP is not None:
            with timer("air_reuse_plan"):
                build_plan(lvl, A, AP, opts)
    return lvl


def _make_product_plan(A: sp.csr_matrix, B: sp.csr_matrix,
                       C: sp.csr_matrix):
    """Numeric SpGEMM plan C = A@B against C's fixed pattern (built once on
    the first reuse-enabled setup; numeric re-execution is a segment sum).

    NOTE: the plan pattern deliberately keys on the FIRST setup's C --
    scipy's matmul prunes value-dependent zeros, so C can be a subset of
    the structural product; the device re-setup reproduces exactly this
    pruned pattern, and the amount>=3 HOST re-setup executes the same
    plan so both sides stay bitwise-paired (the reference pins the
    MAT_REUSE pattern the same way)."""
    from ..sparse.pattern import SparsityPattern
    from ..sparse.spgemm import build_spgemm_plan

    pa = SparsityPattern(A.indptr, A.indices, A.shape)
    pb = SparsityPattern(B.indptr, B.indices, B.shape)
    pc_ = SparsityPattern(C.indptr, C.indices, C.shape)
    return build_spgemm_plan(pa, pb, pc_)


def _plan_product_host(plan, A: sp.csr_matrix, B: sp.csr_matrix
                       ) -> sp.csr_matrix:
    """Execute a stored numeric plan on host csr values (the amount>=3
    re-setup product, bitwise-paired with the device re-setup)."""
    vals = plan.execute_host(A.data, B.data)
    out = sp.csr_matrix(
        (vals, plan.pat_C.indices.astype(np.int64), plan.pat_C.indptr),
        shape=plan.pat_C.shape,
    )
    return out


def _assembled_host(inv: Inverse) -> sp.csr_matrix:
    """Host copy of an assembled inverse WITHOUT a device->host transfer
    when the setup-phase scipy copy is available (d2h through the TPU
    tunnel is catastrophically slow)."""
    if inv.kind == "diagonal":
        d = getattr(inv, "host_diag", None)
        if d is None:
            d = np.asarray(inv.diag)
        return sp.diags(d).tocsr()
    if getattr(inv, "host_csr", None) is not None:
        return inv.host_csr
    return inv.mat.to_scipy()
