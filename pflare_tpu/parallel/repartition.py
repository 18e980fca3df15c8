"""Shard agglomeration / repartitioning heuristics.

Reference: src/Repartition.F90 + src/C_PETSc_Routines.c:17-175.  On coarse
levels the communication/compute ratio degrades; the reference reduces the
active MPI ranks by ``processor_agglom_factor`` whenever rows/rank drops
below ``process_eq_limit`` or the local/non-local nnz ratio drops below
``processor_agglom_ratio``, repartitioning with ParMETIS (or 'simple'
strided interleaving).

On a TPU mesh the analogue is choosing, per level, how many shards stay
active and which contiguous row blocks they own.  There is no graph
partitioner on device; we use the reference's 'simple' interleaved mode
(contiguous blocks assigned round-robin over the surviving shards), which
the reference offers as its partitioner-free fallback.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def local_nonlocal_nnz_ratio(A: sp.csr_matrix, n_shards: int) -> float:
    """Average over shards of (local-block nnz) / (off-block nnz)
    (reference: src/Repartition.F90:24-60).  Rows are split into
    ``n_shards`` contiguous blocks."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    shard_of_row = np.searchsorted(bounds, rows, side="right") - 1
    shard_of_col = np.searchsorted(bounds, A.indices, side="right") - 1
    local = shard_of_row == shard_of_col
    ratios = []
    for s in range(n_shards):
        mask = shard_of_row == s
        nl = int((mask & local).sum())
        nn = int((mask & ~local).sum())
        ratios.append(nl / max(nn, 1))
    return float(np.mean(ratios))


def should_agglomerate(n_rows: int, n_shards: int, nnz_ratio: float,
                       process_eq_limit: int,
                       processor_agglom_ratio: float) -> bool:
    """Trigger test (reference: src/AIR_MG_Setup.F90:645-700)."""
    if n_shards <= 1:
        return False
    rows_per_shard = n_rows / n_shards
    return (rows_per_shard < process_eq_limit
            or nnz_ratio < processor_agglom_ratio)


def active_shards_schedule(level_sizes, n_shards: int,
                           process_eq_limit: int = 50,
                           processor_agglom_factor: int = 2):
    """How many shards stay active on each level (monotone decreasing),
    applying the agglomeration factor whenever the rows/shard limit is hit."""
    schedule = []
    active = n_shards
    for n in level_sizes:
        while active > 1 and n / active < process_eq_limit:
            active = max(1, active // processor_agglom_factor)
        schedule.append(active)
    return schedule


def coarse_repartition_perm(A_c: sp.csr_matrix, min_rows: int = 256,
                            check_shards: int = 8) -> np.ndarray | None:
    """Graph-aware coarse-level repartition: the ParMETIS stand-in
    (reference: src/C_PETSc_Routines.c:17-175 partitions each coarse grid
    onto the surviving ranks; src/Repartition.F90:69-110).

    On a TPU row mesh a partition is communication-minimal exactly when
    the operator is BANDED for the block width (parallel/halo.py band
    check): then the halo is two neighbour ppermutes and GSPMD never
    all-gathers.  So the partition-quality objective collapses to
    bandwidth reduction, and RCM -- BFS band-growing from a peripheral
    node -- is the natural partitioner.  Returns a permutation when (a)
    the natural order FAILS the neighbour-band check for
    ``check_shards`` equal blocks and (b) RCM at least halves the
    bandwidth; None otherwise (structured/banded levels keep their
    order, exactly like the fine-level ``reorder='auto'`` rule)."""
    A_c = sp.csr_matrix(A_c)
    n = A_c.shape[0]
    if n < min_rows or A_c.nnz == 0:
        return None
    rows = np.repeat(np.arange(n), np.diff(A_c.indptr))
    bw_nat = int(np.abs(A_c.indices - rows).max())
    w = -(-n // check_shards)        # full-mesh equal-block width
    if bw_nat <= w:
        return None               # interleaved partition is already banded
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    pat = sp.csr_matrix((np.ones(A_c.nnz), A_c.indices, A_c.indptr),
                        shape=A_c.shape)
    pat = sp.csr_matrix(pat + pat.T)
    perm = np.asarray(reverse_cuthill_mckee(pat, symmetric_mode=True),
                      dtype=np.int64)
    ip = np.empty_like(perm)
    ip[perm] = np.arange(n)
    bw_rcm = int(np.abs(ip[A_c.indices] - ip[rows]).max())
    # accept when RCM actually FIXES the full-mesh band check, or at
    # least halves the bandwidth (so agglomerated widths pass); marginal
    # gains keep the natural order (deterministic hierarchies)
    if not (bw_rcm <= w or bw_rcm * 2 <= bw_nat):
        return None
    return perm


def interleaved_partition(n_rows: int, active: int) -> np.ndarray:
    """Row -> shard map, contiguous blocks over the ``active`` shards
    (the reference's 'simple'/strided repartition,
    reference: src/Repartition.F90:69-110)."""
    bounds = np.linspace(0, n_rows, active + 1).astype(np.int64)
    out = np.zeros(n_rows, dtype=np.int32)
    for s in range(active):
        out[bounds[s] : bounds[s + 1]] = s
    return out
