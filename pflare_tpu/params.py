"""Enums, constants and precision-aware tolerances.

TPU-native re-design of the reference constant module
(reference: src/Pflare_Parameters.F90:17-226).  Only the constants that are
meaningful in the JAX build are kept; PETSc-specific reuse-slot indices are
replaced by named plan fields on the hierarchy pytrees.
"""

from __future__ import annotations

import enum

import numpy as np


class InverseType(enum.IntEnum):
    """Approximate-inverse types (reference: include/pflare.h:36-46)."""

    POWER = 0       # GMRES polynomial, power basis (comms-avoiding: one TSQR)
    ARNOLDI = 1     # GMRES polynomial, Arnoldi basis
    NEWTON = 2      # GMRES polynomial, Newton basis w/ extra roots (mf only)
    NEWTON_NO_EXTRA = 3  # Newton basis without added roots
    NEUMANN = 4     # Neumann polynomial
    SAI = 5         # Sparse approximate inverse (least squares)
    ISAI = 6        # Incomplete SAI (one-level restricted additive Schwarz)
    WJACOBI = 7     # Weighted Jacobi
    JACOBI = 8      # Unweighted Jacobi
    LU = 9          # Exact dense inverse (the -mg_coarse_pc_type lu analogue;
                    # small dense solves are MXU-native on TPU)


class CFSplittingType(enum.IntEnum):
    """CF splitting algorithms (reference: src/CF_Splitting.F90:19-25)."""

    PMISR_DDC = 0
    DIAG_DOM = 1
    PMIS = 2
    PMIS_DIST2 = 3
    AGG = 4
    PMIS_AGG = 5
    CR = 6


class ZType(enum.IntEnum):
    """Restriction (Z) construction (reference: src/Pflare_Parameters.F90:30-32)."""

    PRODUCT = 0   # AIRG: Z = -A_cf * inv(A_ff_drop)
    LAIR = 1      # local AIR: per-row dense solves, distance-d sparsity
    LAIR_SAI = 2  # SAI variant of lAIR


# CF marker values (reference: src/Pflare_Parameters.F90:37-38)
C_POINT = 1
F_POINT = -1

# Compatible-relaxation constants (reference: src/Pflare_Parameters.F90:44-62)
CR_MAX_ITS = 10
CR_POLY_ORDER = 2
CR_RELAXATION_NU = 3

# Fill estimates for SpGEMM products (reference: src/Pflare_Parameters.F90:160)
PTAP_FILL = 1.58
MATMULT_FILL = 1.0


def _tols(dtype):
    dt = np.dtype(dtype)
    if dt == np.float64:
        return dict(
            zero=1e-12,        # PFLARE_TOL_ZERO
            arnoldi=1e-14,     # relative-residual stop in the Arnoldi
            lucky=1e-30,       # lucky-breakdown tolerance
            rcond=1e-12,       # rank-revealing lstsq cutoff
            sigma_drop=1e-13,  # PFLARE_TOL_SIGMA_DROP (abs SVD cutoff)
            consistency=1e-14,
            matfree=4e-11,     # debug compare tolerances
            auto_truncate=1e-14,
            leja_perturb=5e-8,
            eps=np.finfo(np.float64).eps,
        )
    return dict(
        zero=1e-6,
        arnoldi=1e-6,
        lucky=1e-20,
        rcond=1e-6,
        sigma_drop=1e-6,
        consistency=1e-5,
        matfree=2e-3,
        auto_truncate=1e-6,
        leja_perturb=1e-4,
        eps=np.finfo(np.float32).eps,
    )


class Tolerances:
    """Precision-aware tolerances (reference: src/Pflare_Parameters.F90:162-226)."""

    def __init__(self, dtype=np.float64):
        self.dtype = np.dtype(dtype)
        for k, v in _tols(dtype).items():
            setattr(self, k, v)


TOL64 = Tolerances(np.float64)
TOL32 = Tolerances(np.float32)


def tolerances(dtype) -> Tolerances:
    return TOL64 if np.dtype(dtype) == np.float64 else TOL32
