"""Hierarchy statistics: grid/operator/cycle/storage complexities.

Reference: src/AIR_MG_Stats.F90:17-421.  Complexities are relative to the
finest grid; cycle complexity counts the nnz touched by one V-cycle
(including matrix-free polynomial matvecs) relative to nnz(A).
"""

from __future__ import annotations

import numpy as np


def _nnz(M):
    return M.nnz if M is not None else 0


def _inv_nnz(inv, fallback_mat):
    """nnz cost of one application of an approximate inverse."""
    if inv is None:
        return 0
    if inv.kind == "assembled":
        return inv.mat.nnz
    if inv.kind == "dense":
        return int(inv.mat.shape[0]) ** 2
    if inv.kind == "diagonal":
        return int(inv.diag.shape[0])
    # matrix-free: matvecs * nnz of the operator
    return inv.num_matvecs * (fallback_mat.nnz if fallback_mat is not None else 0)


def compute_stats(hierarchy) -> dict:
    levels = hierarchy.levels
    opts = hierarchy.options
    if not levels:
        return {"levels": 1, "grid_complexity": 1.0,
                "operator_complexity": 1.0, "cycle_complexity": 1.0,
                "storage_complexity": 1.0, "reuse_storage_complexity": 0.0}

    n_fine = levels[0].n
    nnz_fine = levels[0].A.nnz

    rows = [lvl.n for lvl in levels] + [hierarchy.coarse_matrix.shape[0]]
    nnz_A = [lvl.A.nnz for lvl in levels] + [hierarchy.coarse_matrix.nnz]

    grid_complexity = sum(rows) / n_fine
    operator_complexity = sum(nnz_A) / nnz_fine

    # ~~~~~~~~~~ per-V-cycle nnz model (reference:
    # src/AIR_MG_Stats.F90:79-255) ~~~~~~~~~~
    cycle_nnz = 0
    storage_nnz = 0
    for lvl in levels:
        # restrict + prolong
        cycle_nnz += lvl.R.nnz + lvl.P.nnz
        smooth_nnz = 0
        for group in opts.smooth_order:
            its = abs(group)
            if group > 0:
                per_it = lvl.A_ff.nnz + _inv_nnz(lvl.inv_Aff, lvl.A_ff)
                smooth_nnz += _nnz(lvl.A_fc) + its * per_it
            elif group < 0:
                per_it = _nnz(lvl.A_cc) + _inv_nnz(lvl.inv_Acc, lvl.A_cc)
                smooth_nnz += _nnz(lvl.A_cf) + its * per_it
        cycle_nnz += smooth_nnz
        storage_nnz += (lvl.R.nnz + lvl.P.nnz + lvl.A_ff.nnz
                        + _nnz(lvl.A_fc) + _nnz(lvl.A_cf) + _nnz(lvl.A_cc)
                        + _inv_storage(lvl.inv_Aff) + _inv_storage(lvl.inv_Acc))
    # coarse solve
    cm = hierarchy.coarse_matrix
    ci = hierarchy.coarse_inv
    cycle_nnz += _inv_nnz(ci, _Wrap(cm))
    storage_nnz += _inv_storage(ci) + cm.nnz

    reuse_nnz = 0
    for lvl in levels:
        for key in ("W_drop", "Z_drop", "RAP_drop"):
            if key in lvl.patterns:
                reuse_nnz += lvl.patterns[key].nnz

    return {
        "levels": len(levels) + 1,
        "rows": rows,
        "nnz": nnz_A,
        "grid_complexity": grid_complexity,
        "operator_complexity": operator_complexity,
        "cycle_complexity": cycle_nnz / nnz_fine,
        "storage_complexity": storage_nnz / nnz_fine,
        "reuse_storage_complexity": (
            reuse_nnz / nnz_fine if opts.reuse_sparsity else 0.0
        ),
    }


def _inv_storage(inv):
    if inv is None:
        return 0
    if inv.kind == "assembled":
        return inv.mat.nnz
    if inv.kind == "dense":
        return int(inv.mat.shape[0]) ** 2
    if inv.kind == "diagonal":
        return int(inv.diag.shape[0])
    return 0  # matrix-free stores only coefficients


class _Wrap:
    def __init__(self, m):
        self.nnz = m.nnz


def print_stats(hierarchy):
    s = compute_stats(hierarchy)
    print(f" Number of levels: {s['levels']}")
    print(f" Grid complexity: {s['grid_complexity']:.6f}")
    print(f" Operator complexity: {s['operator_complexity']:.6f}")
    print(f" Cycle complexity: {s['cycle_complexity']:.6f}")
    print(f" Storage complexity: {s['storage_complexity']:.6f}")
    print(f" Reuse storage complexity: {s['reuse_storage_complexity']:.6f}")
    return s
