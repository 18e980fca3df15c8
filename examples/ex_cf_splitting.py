"""Standalone CF splitting + diag-dominant submatrix extraction
(counterpart of python/ex2_cf_splitting.py and compute_diag_dom_submatrix,
reference: docs/new_methods.md:60-168)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pflare_tpu as pf
from pflare_tpu.sparse.ops import diag_dominance_ratio


def main():
    A = pf.adv_diff_2d(50, curved_velocity=True)
    for t in (pf.CFSplittingType.PMISR_DDC, pf.CFSplittingType.PMIS,
              pf.CFSplittingType.PMIS_DIST2, pf.CFSplittingType.AGG):
        fine, coarse = pf.compute_cf_splitting(A, cf_splitting_type=t)
        print(f"{t.name:12s}: {len(fine)} F / {len(coarse)} C "
              f"({100 * len(coarse) / A.shape[0]:.0f}% coarse)")

    sub, idx = pf.compute_diag_dom_submatrix(A, max_dd_ratio=0.5)
    r = diag_dominance_ratio(sub, np.ones(sub.shape[0], dtype=bool))
    print(f"diag-dom submatrix: {sub.shape[0]} rows, max ratio "
          f"{r.max():.3f} (target < 0.5)")


if __name__ == "__main__":
    main()
