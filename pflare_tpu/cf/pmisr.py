"""PMISR / PMIS: Luby-style maximal independent set CF splitting.

Reference: src/PMISR_Module.F90.  The TPU-native formulation is fully
vectorised over a padded neighbour array (the ELL layout of the symmetrized
strength graph): each Luby round is a gather + rowwise reduction, so the
fixed-step mode (max_luby_steps > 0) is a short static chain of vector ops --
no reductions, no data-dependent control flow (reference notes 2-3 rounds
decide >99% of nodes, src/PMISR_Module.F90:466-473).

PMISR swaps the C/F definition of PMIS and searches the measure from the
smallest entry: the independent set becomes F, its neighbours C, which
bounds A_ff's off-diagonal strength.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..params import C_POINT, F_POINT


def _ell_graph(S: sp.csr_matrix):
    """Padded neighbour array of the (symmetric) strength graph."""
    S = sp.csr_matrix(S)
    S.sort_indices()
    n = S.shape[0]
    row_len = np.diff(S.indptr)
    K = max(int(row_len.max()) if n else 1, 1)
    cols = np.zeros((n, K), dtype=np.int64)
    mask = np.zeros((n, K), dtype=bool)
    if S.nnz:
        rows = np.repeat(np.arange(n), row_len)
        offs = np.arange(S.nnz) - np.repeat(S.indptr[:-1], row_len)
        cols[rows, offs] = S.indices
        mask[rows, offs] = True
    return cols, mask


def pmisr(strength_mat, max_luby_steps: int = -1, pmis: bool = False,
          zero_measure_c_point: bool = False, seed: int = 5,
          assume_symmetric: bool = False) -> np.ndarray:
    """CF markers (+1 C / -1 F) from the Luby loop.

    Measure = rand(0,1) + strong-neighbour count (reference:
    src/PMISR_Module.F90:200-243); PMIS negates the measure and flips the
    final markers.
    """
    S = sp.csr_matrix(strength_mat)
    n = S.shape[0]
    rng = np.random.default_rng(seed)
    measure = rng.random(n) + np.diff(S.indptr)
    if pmis:
        measure = -measure
    cf = np.zeros(n, dtype=np.int64)
    cf = pmisr_existing_measure(S, measure, cf, max_luby_steps,
                                zero_measure_c_point=zero_measure_c_point,
                                pmis=pmis,
                                assume_symmetric=assume_symmetric)
    if pmis:
        cf = -cf
    return cf


def pmisr_existing_measure(strength_mat, measure, cf_markers,
                           max_luby_steps: int = -1,
                           zero_measure_c_point: bool = False,
                           pmis: bool = False,
                           assume_symmetric: bool = False) -> np.ndarray:
    """Core Luby loop on an existing measure / partial assignment
    (reference: src/PMISR_Module.F90:271-670).

    The graph must be symmetric (or interpreted as G + G^T: we symmetrize
    the pattern here, which is the reference's implicit-transpose variant).
    """
    S = sp.csr_matrix(strength_mat)
    if assume_symmetric:
        # caller guarantees a symmetric pattern (e.g. a symmetrized
        # strength matrix): skip the S + S^T pass
        G = S
    else:
        # implicit transpose: neighbour relation is symmetric
        G = sp.csr_matrix(S + S.T)
        G.sort_indices()
    n = G.shape[0]
    measure = np.asarray(measure, dtype=np.float64)
    cf = np.asarray(cf_markers, dtype=np.int64).copy()

    assigned = cf != 0

    # zero-measure nodes (no strong neighbours): handled specially
    # (reference: src/PMISR_Module.F90:398-437; markers here are pre-flip
    # for PMIS, the caller negates afterwards)
    zero_nodes = (~assigned) & (np.abs(measure) < 1)
    if zero_measure_c_point:
        cf[zero_nodes] = F_POINT if pmis else C_POINT
    else:
        cf[zero_nodes] = C_POINT if pmis else F_POINT
    assigned |= zero_nodes

    # native Luby loop (C++ host kernel) when available
    from ..native import pmisr_luby_native

    nat = pmisr_luby_native(G.indptr, G.indices, measure, cf,
                            assigned.astype(np.uint8), max_luby_steps)
    if nat is not None:
        cf, _ = nat
        return cf

    # numpy fallback: vectorised rounds over a padded neighbour array
    cols, mask = _ell_graph(G)
    gidx = np.arange(n, dtype=np.int64)
    steps = 0
    while True:
        if max_luby_steps > 0 and steps >= max_luby_steps:
            break
        if np.all(assigned):
            break
        nb_meas = measure[cols]
        nb_assigned = assigned[cols]
        active_edge = mask & ~nb_assigned
        # node i loses if any unassigned neighbour j has
        # m_i > m_j, or m_i == m_j and i > j (deterministic tie-break,
        # reference: src/PMISR_Module.F90:517-556)
        lose = active_edge & (
            (measure[:, None] > nb_meas)
            | ((measure[:, None] == nb_meas) & (gidx[:, None] > cols))
        )
        in_set = ~assigned & ~lose.any(axis=1)
        if not in_set.any():
            # with max_luby_steps<0 this cannot stall: some node always wins
            steps += 1
            continue
        cf[in_set] = F_POINT
        assigned |= in_set
        # neighbours of the new set become assigned (-> C at the end)
        nb_of_new = (mask & in_set[cols]).any(axis=1)
        assigned |= nb_of_new
        steps += 1

    cf[cf == 0] = C_POINT
    return cf
