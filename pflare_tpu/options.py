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

    # shard agglomeration (the processor-agglomeration analogue; consumed
    # by parallel/mesh.py::shard_hierarchy: levels whose rows/shard drop
    # below process_eq_limit keep fewer active shards, reduced by
    # processor_agglom_factor -- reference: src/AIR_MG_Setup.F90:645-907)
    processor_agglom: bool = True
    processor_agglom_ratio: float = 2.0
    processor_agglom_factor: int = 2
    process_eq_limit: int = 50
    # subcomm moves the coefficient reductions onto the active shards only
    # (reference: src/Repartition.F90:141-163).  On a TPU mesh that regime
    # is subsumed by shard agglomeration: one-shard levels are replicated,
    # so their reductions are local already.  Accepted for option parity;
    # setting it emits a note rather than silently ignoring it.
    subcomm: bool = False

    # row/column reordering applied before setup ("none" | "rcm" | "auto"):
    # reverse Cuthill-McKee bands the matrix so unstructured operators
    # reach the slice-based SpMV paths (DIA / banded Pallas) instead of
    # the ~50x-slower TPU gather (docs/tpu.md), and keep NEIGHBOUR-ONLY
    # halo exchange under a 1-D row mesh (parallel/halo.py band check) --
    # the TPU-first stand-in for the reference's ParMETIS repartition
    # (reference: src/C_PETSc_Routines.c:17-175).  "auto" applies RCM only
    # when it at least halves the bandwidth (structured/banded operators
    # keep their natural order).
    reorder: str = "none"
    # graph-aware COARSE-level repartition (the ParMETIS stand-in applied
    # per coarse grid, reference: src/Repartition.F90:69-110 +
    # src/C_PETSc_Routines.c:17-175): RCM-band a coarse operator whose
    # natural order fails the neighbour-band check, so its distributed
    # full-space operators ride the halo-exchange path.  Internal-order
    # only -- the user-visible (finest) ordering is governed by
    # ``reorder`` above.  None (default) follows ``reorder``: engaged for
    # "auto"/"rcm", off for "none" (the permuted coarse order perturbs
    # the position-seeded CF measures, so default hierarchies stay
    # bit-identical); True/False force it.
    coarse_repartition: bool | None = None

    strong_threshold: float = 0.5
    ddc_its: int = 1
    ddc_fraction: float = 0.1
    cf_splitting_type: CFSplittingType = CFSplittingType.PMISR_DDC
    max_luby_steps: int = -1

    smooth_order: tuple = (2,)  # "ff": two F smooths
    # per-level smoothing orders (reference: smooth_order_levels,
    # src/AIR_Data_Type.F90:333): entry i applies on level i, the last
    # entry repeats for deeper levels; empty = smooth_order everywhere
    smooth_order_levels: tuple = ()
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

    # C-point smoother settings DEFAULT TO the F smoother's (reference:
    # src/AIR_Data_Type.F90:192-200); None means "follow the F smoother"
    c_inverse_type: InverseType | None = None
    c_poly_order: int | None = None
    c_inverse_sparsity_order: int | None = None

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
        orders = self.smooth_order_levels or (self.smooth_order,)
        return any(s < 0 for so in orders for s in so)

    @property
    def c_inverse_type_eff(self):
        return (self.inverse_type if self.c_inverse_type is None
                else self.c_inverse_type)

    @property
    def c_poly_order_eff(self) -> int:
        return (self.poly_order if self.c_poly_order is None
                else self.c_poly_order)

    @property
    def c_inverse_sparsity_order_eff(self) -> int:
        return (self.inverse_sparsity_order
                if self.c_inverse_sparsity_order is None
                else self.c_inverse_sparsity_order)

    @property
    def smooth_arg(self):
        """What the cycle consumes: per-level orders when configured,
        else the global smooth_order tuple."""
        return self.smooth_order_levels or self.smooth_order

    def with_smooth_type(self, s: str) -> "AIROptions":
        return replace(self, smooth_order=parse_smooth_order(s))

    def replace(self, **kw) -> "AIROptions":
        if "smooth_order" in kw and isinstance(kw["smooth_order"], str):
            kw["smooth_order"] = parse_smooth_order(kw["smooth_order"])
        if "smooth_order_levels" in kw:
            kw["smooth_order_levels"] = tuple(
                parse_smooth_order(so) if isinstance(so, str) else tuple(so)
                for so in kw["smooth_order_levels"])
        return replace(self, **kw)

    def __post_init__(self):
        # accept case-insensitive string names for the enum options, like
        # the reference's options database (-pc_air_inverse_type power,
        # reference: src/PCAIR.c:2777)
        for fld, enum_cls in (("cf_splitting_type", CFSplittingType),
                              ("z_type", ZType),
                              ("inverse_type", InverseType),
                              ("c_inverse_type", InverseType),
                              ("coarsest_inverse_type", InverseType)):
            v = getattr(self, fld)
            if isinstance(v, str):
                object.__setattr__(self, fld, enum_cls[v.upper()])
        if self.subcomm or self.coarsest_subcomm:
            import warnings

            warnings.warn(
                "subcomm/coarsest_subcomm are subsumed by shard "
                "agglomeration on a device mesh (replicated small levels "
                "already reduce locally); the flags are accepted for "
                "option parity but change nothing",
                stacklevel=2)


@dataclass(frozen=True)
class PFLAREINVOptions:
    """PCPFLAREINV options (reference: src/PCPFLAREINV.c:905-925)."""

    inverse_type: InverseType = InverseType.ARNOLDI
    poly_order: int = 6
    inverse_sparsity_order: int = 1
    matrix_free: bool = False
    diag_scale: bool = False
    seed: int = 17

    def __post_init__(self):
        # string names accepted like the reference's -pc_pflareinv_type
        if isinstance(self.inverse_type, str):
            object.__setattr__(self, "inverse_type",
                               InverseType[self.inverse_type.upper()])
