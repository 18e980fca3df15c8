"""pflare_tpu: TPU-native iterative solvers for asymmetric sparse systems.

A from-scratch JAX/XLA rebuild of the capabilities of PFLARE
(https://github.com/PFLAREProject/PFLARE): polynomial and sparse approximate
inverses (PCPFLAREINV) and reduction multigrid with approximate ideal
restriction (PCAIR: AIRG / lAIR / nAIR), designed TPU-first -- static
sparsity patterns as compile-time structure, jitted numeric phases, device
meshes + XLA collectives in place of MPI.
"""

from .params import InverseType, CFSplittingType, ZType, C_POINT, F_POINT
from .sparse import (
    ELL,
    SparsityPattern,
    remove_small_from_sparse,
    remove_from_sparse_match,
)
from .problems import (
    adv_1d,
    adv_diff_2d,
    adv_diff_3d,
    random_diag_dominant,
    anisotropic_diffusion_2d,
    read_petsc_matrix,
    read_gmsh,
    fv_upwind_advection,
    advection_from_gmsh,
    dg1_upwind_advection,
    dg1_advection_from_gmsh,
    supg_advection_diffusion,
    supg_from_gmsh,
)
from .solvers import gmres, fgmres, richardson
from .inverse import build_inverse, Inverse
from .options import AIROptions, PFLAREINVOptions, parse_smooth_order
from .air import PCAIR
from .pcpflareinv import PCPFLAREINV
from .cf import compute_cf_splitting, compute_diag_dom_submatrix

__version__ = "0.1.0"

__all__ = [
    "InverseType",
    "CFSplittingType",
    "ZType",
    "C_POINT",
    "F_POINT",
    "ELL",
    "SparsityPattern",
    "remove_small_from_sparse",
    "remove_from_sparse_match",
    "adv_1d",
    "adv_diff_2d",
    "adv_diff_3d",
    "random_diag_dominant",
    "anisotropic_diffusion_2d",
    "read_petsc_matrix",
    "read_gmsh",
    "fv_upwind_advection",
    "advection_from_gmsh",
    "dg1_upwind_advection",
    "dg1_advection_from_gmsh",
    "supg_advection_diffusion",
    "supg_from_gmsh",
    "gmres",
    "fgmres",
    "richardson",
    "build_inverse",
    "Inverse",
    "AIROptions",
    "PFLAREINVOptions",
    "parse_smooth_order",
    "PCAIR",
    "PCPFLAREINV",
    "compute_cf_splitting",
    "compute_diag_dom_submatrix",
]
