from .pattern import SparsityPattern
from .ell import ELL, TELL, spmv
from .dia import DIA
from .ops import (
    remove_small_from_sparse,
    remove_from_sparse_match,
    duplicate_plus_diag,
    one_point_strongest,
    identity_csr,
    diag_dominance_ratio,
    symbolic_matmat,
)
from .spgemm import SpGEMMPlan, build_spgemm_plan, FixedSparsityPolyPlan, scipy_matmat
from .dell import DELL
from .banded import BandedSpMV

__all__ = [
    "SparsityPattern",
    "ELL",
    "TELL",
    "DIA",
    "spmv",
    "remove_small_from_sparse",
    "remove_from_sparse_match",
    "duplicate_plus_diag",
    "one_point_strongest",
    "identity_csr",
    "diag_dominance_ratio",
    "symbolic_matmat",
    "SpGEMMPlan",
    "build_spgemm_plan",
    "FixedSparsityPolyPlan",
    "scipy_matmat",
    "DELL",
    "BandedSpMV",
]
