"""DDC second pass: diagonal-dominance cleanup of the CF splitting.

Reference: src/DDC_Module.F90.  After PMISR, the least diagonally dominant
F rows of A_ff are flipped to C -- either the worst ``fraction_swap`` of
local F rows (binned selection), every row above an absolute ratio
(fraction_swap < 0), or, in diag-dom mode, a PMIS-style independent set of
the worst rows, iterated by the caller until the target max ratio is met.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..params import C_POINT, F_POINT
from ..sparse.ops import diag_dominance_ratio
from .pmisr import pmisr_existing_measure

N_BINS = 1000


def ddc(A, cf_markers: np.ndarray, fraction_swap: float,
        max_dd_ratio: float = 0.0, seed: int = 5):
    """One DDC pass.  Mutates and returns (cf_markers, max_ratio_achieved).

    fraction_swap > 0: swap ~ that fraction of worst F rows (binned).
    fraction_swap < 0: swap every F row with ratio >= |fraction_swap|.
    max_dd_ratio > 0: trigger mode -- promote an independent set (over
    A_ff + A_ff^T with the dominance ratio as measure) of rows above the
    target; the caller iterates (reference: src/DDC_Module.F90:312-414).
    """
    cf_markers = np.asarray(cf_markers, dtype=np.int64)
    trigger = max_dd_ratio > 0
    if fraction_swap == 0.0 and not trigger:
        return cf_markers, 0.0

    A = sp.csr_matrix(A)
    f_mask = cf_markers == F_POINT
    fine_idx = np.nonzero(f_mask)[0]
    fine_size = len(fine_idx)
    if fine_size == 0:
        return cf_markers, 0.0

    ratio = diag_dominance_ratio(A, f_mask)  # over F rows in order
    max_achieved = float(ratio.max()) if fine_size else 0.0

    if trigger:
        if max_achieved < max_dd_ratio:
            return cf_markers, max_achieved
        rng = np.random.default_rng(seed)
        rand = rng.random(A.shape[0])[fine_idx]
        base = max(10.0, max_achieved * 2.0)
        meas = base - (ratio - rand / 1e10)
        cf_aff = np.zeros(fine_size, dtype=np.int64)
        below = ratio < max_dd_ratio
        meas[below] = np.finfo(np.float64).max
        cf_aff[below] = C_POINT
        Aff = A[fine_idx][:, fine_idx]
        cf_aff = pmisr_existing_measure(Aff, meas, cf_aff, max_luby_steps=-1)
        swap = cf_aff == F_POINT
        cf_markers[fine_idx[swap]] *= -1
        return cf_markers, max_achieved

    # fixed-fraction / fixed-threshold path
    if fraction_swap < 0:
        swap_dom_val = -fraction_swap
    else:
        search_size = int(fine_size * fraction_swap)
        if search_size <= 0:
            return cf_markers, max_achieved
        # bin ratios in [0,1); everything >= (N-1)/N (incl. inf from zero
        # diagonals) lands in the top bin
        capped = np.where(np.isfinite(ratio), ratio, np.float64(N_BINS))
        bins = np.minimum(
            np.floor(capped * N_BINS).astype(np.int64), N_BINS - 1
        )
        bins[bins < 0] = N_BINS - 1  # overflowed huge ratios
        counts = np.bincount(bins, minlength=N_BINS)
        csum = np.cumsum(counts[::-1])
        bin_boundary = N_BINS - int(np.searchsorted(csum, search_size) + 1)
        swap_dom_val = bin_boundary / N_BINS

    swap = (ratio != 0) & (ratio >= swap_dom_val)
    cf_markers[fine_idx[swap]] *= -1
    return cf_markers, max_achieved
