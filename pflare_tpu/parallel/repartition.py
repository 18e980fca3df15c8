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


def interleaved_partition(n_rows: int, active: int) -> np.ndarray:
    """Row -> shard map, contiguous blocks over the ``active`` shards
    (the reference's 'simple'/strided repartition,
    reference: src/Repartition.F90:69-110)."""
    bounds = np.linspace(0, n_rows, active + 1).astype(np.int64)
    out = np.zeros(n_rows, dtype=np.int32)
    for s in range(active):
        out[bounds[s] : bounds[s + 1]] = s
    return out
