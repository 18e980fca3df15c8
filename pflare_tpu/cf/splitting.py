"""CF splitting driver + diagonally-dominant submatrix extraction.

Reference: src/CF_Splitting.F90:88-460 and src/MatDiagDomSubmatrix.F90.
Public API mirrors the reference's ``compute_cf_splitting`` /
``compute_diag_dom_submatrix`` (include/pflare.h:113-121).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..params import CFSplittingType, C_POINT, F_POINT, InverseType
from .strength import strength_matrix
from .pmisr import pmisr
from .ddc import ddc
from .aggregation import serial_aggregation
from .cr import cr_pass, CR_MAX_ITS, CR_POLY_ORDER


def first_pass_splitting(A, symmetric: bool, strong_threshold: float,
                         max_luby_steps: int, cf_splitting_type,
                         seed: int = 5, mesh=None) -> np.ndarray:
    """Strength matrix + first-pass splitting (reference:
    src/CF_Splitting.F90:88-230).

    ``mesh``: run the Luby rounds ON DEVICE over the mesh's row axis --
    the distributed splitting path (reference: the PetscSF halo exchange
    inside PMISR, src/PMISR_Module.F90:476-643; here GSPMD inserts the
    neighbour collectives for the padded-graph gathers).  The measure is
    host-seeded identically to the serial path, so the markers match."""
    t = CFSplittingType(cf_splitting_type)
    if t == CFSplittingType.PMIS_DIST2:
        S = strength_matrix(A, strong_threshold, symmetrize=True, square=True)
    elif t == CFSplittingType.PMIS:
        S = strength_matrix(A, strong_threshold, symmetrize=True, square=False)
    else:
        S = strength_matrix(A, strong_threshold, symmetrize=not symmetric,
                            square=False)

    # the Luby pass skips re-symmetrizing: PMIS/PMIS_DIST2 symmetrize
    # above, and for symmetric A the reference ITSELF skips the
    # symmetrization (".NOT. symmetric", reference:
    # src/CF_Splitting.F90:142-154) -- the per-row relative threshold can
    # still produce an asymmetric pattern there, and we keep the
    # reference's behaviour exactly
    if t in (CFSplittingType.PMISR_DDC, CFSplittingType.DIAG_DOM):
        if mesh is not None:
            return _pmisr_sharded(S, max_luby_steps, pmis=False, seed=seed,
                                  mesh=mesh)
        return pmisr(S, max_luby_steps, pmis=False, seed=seed,
                     assume_symmetric=True)
    if t in (CFSplittingType.PMIS, CFSplittingType.PMIS_DIST2):
        if mesh is not None:
            return _pmisr_sharded(S, max_luby_steps, pmis=True, seed=seed,
                                  mesh=mesh)
        return pmisr(S, max_luby_steps, pmis=True, seed=seed,
                     assume_symmetric=True)
    if t == CFSplittingType.AGG:
        if mesh is not None:
            return _agg_sharded(S, mesh, boundary_pmis=False,
                                max_luby_steps=max_luby_steps, seed=seed)
        cf, _ = serial_aggregation(S)
        return cf
    if t == CFSplittingType.PMIS_AGG:
        if mesh is not None:
            return _agg_sharded(S, mesh, boundary_pmis=True,
                                max_luby_steps=max_luby_steps, seed=seed)
        # single-shard: the boundary PMIS pass is empty, pure aggregation
        # (reference: src/CF_Splitting.F90:178-206 -- the PMIS applies only
        # to processor-boundary nodes)
        cf, _ = serial_aggregation(S)
        return cf
    raise ValueError(f"unknown CF splitting {t}")


def _agg_sharded(S, mesh, boundary_pmis: bool, max_luby_steps: int,
                 seed: int) -> np.ndarray:
    """Distributed aggregation over the mesh's row blocks (reference:
    src/CF_Splitting.F90:162-225): PMIS_AGG first runs PMIS over the
    SHARD-BOUNDARY nodes (nodes with a strong connection crossing a block
    edge -- the processor-boundary set the reference marks through its
    halo exchange), then each shard aggregates its LOCAL diagonal block
    with the boundary markers pinned; plain AGG skips the boundary pass,
    matching the reference's rank-local aggregation."""
    S = sp.csr_matrix(S)
    n = S.shape[0]
    n_dev = mesh.devices.size
    bounds = np.linspace(0, n, n_dev + 1).astype(np.int64)
    shard_of = np.searchsorted(bounds, np.arange(n), side="right") - 1
    rows = np.repeat(np.arange(n), np.diff(S.indptr))
    cross = shard_of[rows] != shard_of[S.indices]

    cf = np.zeros(n, dtype=np.int64)
    if boundary_pmis and cross.any():
        boundary = np.zeros(n, dtype=bool)
        boundary[rows[cross]] = True
        boundary[S.indices[cross]] = True
        bidx = np.nonzero(boundary)[0]
        S_bb = sp.csr_matrix(S[bidx][:, bidx])
        cf_b = pmisr(S_bb, max_luby_steps, pmis=True, seed=seed,
                     assume_symmetric=True)
        cf[bidx] = cf_b
    for s in range(n_dev):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        if hi <= lo:
            continue
        S_loc = sp.csr_matrix(S[lo:hi, lo:hi])
        cf_loc, _ = serial_aggregation(S_loc, cf_markers=cf[lo:hi])
        cf[lo:hi] = cf_loc
    return cf


def _pmisr_sharded(S, max_luby_steps, pmis, seed, mesh):
    """Device PMISR over the mesh: padded-graph arrays row-sharded, the
    jitted Luby rounds compiled SPMD (cf/device.py::pmisr_device).

    Markers match the host path exactly when f64 is enabled (the tested
    configuration).  With x64 disabled the measure downcasts to f32 on
    device, and nodes whose f64 measures differ by less than an f32 ulp
    fall back to the index tie-break -- a possible marker difference vs
    the host on very large graphs."""
    import jax
    import jax.numpy as jnp
    from ..parallel.mesh import row_sharding, replicated
    from .device import graph_to_device, pmisr_device

    S = sp.csr_matrix(S)
    n = S.shape[0]
    cols, mask = graph_to_device(S)
    rng = np.random.default_rng(seed)
    measure = rng.random(n) + np.diff(S.indptr)
    if pmis:
        measure = -measure
    n_dev = mesh.devices.size
    rounds = max_luby_steps if max_luby_steps > 0 else 25
    if n % n_dev == 0:
        rs = row_sharding(mesh)
        cols = jax.device_put(cols, rs)
        mask = jax.device_put(mask, rs)
        cf0 = jax.device_put(jnp.zeros(n, dtype=jnp.int32), rs)
        meas = jax.device_put(jnp.asarray(measure), replicated(mesh))
    else:
        cf0 = jnp.zeros(n, dtype=jnp.int32)
        meas = jnp.asarray(measure)
    cf = pmisr_device(cols, mask, meas, cf0, max_luby_steps=rounds,
                      pmis=pmis)
    cf = np.asarray(cf, dtype=np.int64)
    if pmis:
        cf = -cf
    return cf


def compute_cf_splitting(A, symmetric: bool = False,
                         strong_threshold: float = 0.5,
                         max_luby_steps: int = -1,
                         cf_splitting_type=CFSplittingType.PMISR_DDC,
                         ddc_its: int = 1, fraction_swap: float = 0.1,
                         seed: int = 5,
                         cr_inverse_type=InverseType.ARNOLDI,
                         cr_poly_order: int = CR_POLY_ORDER,
                         cr_sparsity_order: int = 1,
                         cr_diag_scale: bool = False,
                         mesh=None):
    """Compute the CF splitting; returns (is_fine, is_coarse) index arrays
    (reference: src/CF_Splitting.F90:235-460)."""
    A = sp.csr_matrix(A)
    t = CFSplittingType(cf_splitting_type)

    if t == CFSplittingType.CR:
        # CR builds its splitting from scratch: strong_threshold carries the
        # target CR rate (reference: src/CF_Splitting.F90:303-346)
        cf = np.full(A.shape[0], F_POINT, dtype=np.int64)
        for _ in range(CR_MAX_ITS):
            cf, rate, n_swapped = cr_pass(
                A, cf, strong_threshold, cr_inverse_type, cr_poly_order,
                cr_sparsity_order, cr_diag_scale, seed=seed,
            )
            if rate <= strong_threshold or n_swapped == 0:
                break
    else:
        cf = first_pass_splitting(A, symmetric, strong_threshold,
                                  max_luby_steps, t, seed=seed, mesh=mesh)

    if strong_threshold != 0.0 and t in (CFSplittingType.PMISR_DDC,
                                         CFSplittingType.DIAG_DOM):
        if t == CFSplittingType.DIAG_DOM:
            # iterate until the requested max ratio is reached
            while True:
                cf, max_achieved = ddc(A, cf, fraction_swap,
                                       max_dd_ratio=strong_threshold,
                                       seed=seed)
                if max_achieved < strong_threshold:
                    break
        else:
            for _ in range(ddc_its):
                cf, _ = ddc(A, cf, fraction_swap, seed=seed)

    return cf_to_is(cf)


def cf_to_is(cf_markers: np.ndarray):
    """(is_fine, is_coarse) index arrays from CF markers (reference:
    src/CF_Splitting.F90:31-84; non-F markers count as coarse)."""
    cf = np.asarray(cf_markers)
    fine = np.nonzero(cf == F_POINT)[0]
    coarse = np.nonzero(cf != F_POINT)[0]
    return fine, coarse


def compute_diag_dom_submatrix(A, max_dd_ratio: float,
                               fraction_swap: float = 0.1, seed: int = 5):
    """Extract the largest submatrix with all diagonal-dominance ratios
    below ``max_dd_ratio`` (reference: src/MatDiagDomSubmatrix.F90:17,
    docs/new_methods.md:136-168).  Returns (submatrix, indices)."""
    A = sp.csr_matrix(A)
    fine, _ = compute_cf_splitting(
        A, symmetric=False, strong_threshold=max_dd_ratio,
        cf_splitting_type=CFSplittingType.DIAG_DOM,
        fraction_swap=fraction_swap, seed=seed,
    )
    sub = sp.csr_matrix(A[fine][:, fine])
    return sub, fine
