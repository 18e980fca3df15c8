"""AIR and PFLAREINV option sets.

Names and defaults mirror the reference option structs so a PFLARE user can
port an options file directly (reference: src/AIR_Data_Type.F90:34-264,
src/PCPFLAREINV.c:905-925, docs/options.md).  Smooth-order strings ("ff",
"fcf", "cf", ...) are parsed exactly like PCAIRSetSmoothType
(reference: src/PCAIR_Interfaces.F90:1821-1882).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from .params import CFSplittingType, InverseType, ZType


def parse_smooth_order(s: str):
    """'ff' -> [2]; 'fcf' -> [1,-1,1]; 'cc' -> [-2]; consecutive same
    letters merge (positive = F smooths, negative = C smooths)."""
    out = []
    for ch in s.lower():
        if ch == "f":
            if out and out[-1] > 0:
                out[-1] += 1
            else:
                out.append(1)
        elif ch == "c":
            if out and out[-1] < 0:
                out[-1] -= 1
            else:
                out.append(-1)
        else:
            raise ValueError(f"bad smooth type {s!r}")
    return tuple(out)


@dataclass(frozen=True)
class AIROptions:
    """PCAIR options (defaults tuned for pure advection, like the
    reference)."""

    print_stats_timings: bool = False

    max_levels: int = 300
    coarse_eq_limit: int = 6
    auto_truncate_start_level: int = -1
    auto_truncate_tol: float = 0.1

    # shard agglomeration (the processor-agglomeration analogue)
    processor_agglom: bool = True
    processor_agglom_ratio: float = 2.0
    processor_agglom_factor: int = 2
    process_eq_limit: int = 50
    subcomm: bool = False

    strong_threshold: float = 0.5
    ddc_its: int = 1
    ddc_fraction: float = 0.1
    cf_splitting_type: CFSplittingType = CFSplittingType.PMISR_DDC
    max_luby_steps: int = -1

    smooth_order: tuple = (2,)  # "ff": two F smooths
    diag_scale_polys: bool = False
    matrix_free_polys: bool = False
    one_point_classical_prolong: bool = True
    full_smoothing_up_and_down: bool = False
    symmetric: bool = False
    constrain_w: bool = False
    constrain_z: bool = False
    improve_z_its: int = 0
    improve_w_its: int = 0

    strong_r_threshold: float = 0.0

    z_type: ZType = ZType.PRODUCT
    lair_distance: int = 2

    inverse_type: InverseType = InverseType.ARNOLDI
    poly_order: int = 6
    inverse_sparsity_order: int = 1

    c_inverse_type: InverseType = InverseType.ARNOLDI
    c_poly_order: int = 6
    c_inverse_sparsity_order: int = 1

    coarsest_inverse_type: InverseType = InverseType.ARNOLDI
    coarsest_poly_order: int = 6
    coarsest_inverse_sparsity_order: int = 1
    coarsest_matrix_free_polys: bool = False
    coarsest_diag_scale_polys: bool = False
    coarsest_subcomm: bool = False

    r_drop: float = 0.01
    a_drop: float = 1e-4
    a_lump: bool = False

    reuse_sparsity: bool = False
    reuse_amount: int = 3
    reuse_poly_coeffs: bool = False

    # RNG seed for the CF splitting / random RHS streams
    seed: int = 5

    @property
    def any_c_smooths(self) -> bool:
        return any(s < 0 for s in self.smooth_order)

    def with_smooth_type(self, s: str) -> "AIROptions":
        return replace(self, smooth_order=parse_smooth_order(s))

    def replace(self, **kw) -> "AIROptions":
        if "smooth_order" in kw and isinstance(kw["smooth_order"], str):
            kw["smooth_order"] = parse_smooth_order(kw["smooth_order"])
        return replace(self, **kw)


@dataclass(frozen=True)
class PFLAREINVOptions:
    """PCPFLAREINV options (reference: src/PCPFLAREINV.c:905-925)."""

    inverse_type: InverseType = InverseType.ARNOLDI
    poly_order: int = 6
    inverse_sparsity_order: int = 1
    matrix_free: bool = False
    diag_scale: bool = False
    seed: int = 17
