"""Device-resident FIRST-TIME hierarchy setup: pattern discovery on TPU.

The reference's accelerator story runs the whole setup in Kokkos kernels
when the matrix is device-resident (reference: docs/gpus.md,
src/PETSc_Helperk.kokkos.cxx, src/PMISR_Modulek.kokkos.cxx,
src/Gmres_Polyk.kokkos.cxx).  pflare_tpu mirrors that split:

  * air/hierarchy.py      -- host setup (exact reference semantics, f64)
  * air/device_resetup.py -- jitted same-pattern numeric REBUILD
  * THIS MODULE           -- jitted first setup: CF splitting, submatrix
    extraction, polynomial-inverse assembly, Z, R/P, AP/RAP all execute on
    the accelerator through the DELL primitives (sparse/dell.py); the host
    only orchestrates, seeds the random measures, and solves the tiny
    dense coefficient problems (LAPACK-sized work, as in the reference).

Host<->device traffic per level: one [n] random-measure upload, a handful
of SCALAR shape readbacks (max kept row widths), the (order+2, order+1)
Arnoldi Hessenberg, and the CF marker readback for the index lists.
Everything O(nnz) stays on device.

Supported configuration mirrors the device re-setup envelope plus Newton:
AIRG product / lAIR / SAI-lAIR Z (batched MXU least squares, the
src/SAI_Zk.kokkos.cxx sibling), strong-R dropping, improve_z, one-point
classical prolongation, PMISR(-DDC)/PMIS(-dist2)/CR splitting,
non-symmetric.  Anything else (ideal prolongator + improve_w, constraints,
PtAP, SAI/ISAI/LU inverses) falls back to the host path with a printed
reason (PCAIR.setup_device chooses).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..options import AIROptions
from ..params import CFSplittingType, C_POINT, F_POINT, InverseType, ZType, \
    tolerances
from ..sparse.dell import (
    DELL,
    cumsum1d,
    OFFBIG,
    PADCOL,
    ceil8,
    compact,
    distinct_offsets_device,
    drop_rows,
    extract_dell,
    gather_at_pattern,
    max_row_count,
    newton_poly_dell,
    onecol_product,
    poly_dell,
    sort_rows,
    spgemm_drop_dell,
    transpose_pattern,
    union_patterns,
)
from ..sparse.dia import DIA
from ..inverse.build import Inverse
from ..inverse.gmres_poly import (arnoldi_fixed_device, box_muller,
                                 coefficients_arnoldi_from_h,
                                 coefficients_power, reached_order,
                                 trim_high_order_zeros)
from ..inverse.newton import build_newton_program, newton_roots
from ..utils.timers import timer


def device_setup_supported(opts: AIROptions) -> bool:
    """True when the device first-setup covers this option set (single
    source of truth: device_setup_unsupported_reason's checklist)."""
    return device_setup_unsupported_reason(opts) is None


def device_setup_unsupported_reason(opts: AIROptions) -> str | None:
    """Why the device first-setup cannot cover this option set (None when
    supported).  PCAIR.setup_device prints this when falling back so the
    host path is never taken silently."""
    checks = [
        (opts.symmetric, "symmetric (PtAP)"),
        (bool(opts.improve_w_its), "improve_w_its"),
        (opts.constrain_w, "constrain_w"),
        (opts.constrain_z, "constrain_z"),
        (opts.full_smoothing_up_and_down, "full_smoothing_up_and_down"),
        (not opts.one_point_classical_prolong, "ideal prolongator"),
        (opts.cf_splitting_type not in (CFSplittingType.PMISR_DDC,
                                        CFSplittingType.PMIS,
                                        CFSplittingType.PMIS_DIST2,
                                        CFSplittingType.CR),
         f"cf_splitting_type={opts.cf_splitting_type.name}"),
        (opts.inverse_sparsity_order != 1, "inverse_sparsity_order != 1"),
        (opts.c_inverse_sparsity_order_eff != 1,
         "c_inverse_sparsity_order != 1"),
        (opts.any_c_smooths, "C-point smoothing"),
        (opts.inverse_type in (InverseType.SAI, InverseType.ISAI,
                               InverseType.LU),
         f"inverse_type={opts.inverse_type.name}"),
        (opts.coarsest_inverse_type in (InverseType.SAI, InverseType.ISAI,
                                        InverseType.LU),
         f"coarsest_inverse_type={opts.coarsest_inverse_type.name}"),
    ]
    bad = [msg for cond, msg in checks if cond]
    return ", ".join(bad) if bad else None


# ~~~~~~~~~~~~~~~~~~ CF splitting on device ~~~~~~~~~~~~~~~~~~


@jax.jit
def _strength_cols(A: DELL, theta):
    """Strength pattern |a_ij| >= theta * max_{j != i} |a_ij|, diagonal
    dropped (reference: src/SAbs.F90:16-144).  Returns padded cols."""
    n = A.data.shape[0]
    isd = A.cols == jnp.arange(n, dtype=A.cols.dtype)[:, None]
    live = (A.cols < PADCOL) & ~isd
    av = jnp.where(live, jnp.abs(A.data), 0.0)
    rowmax = jnp.max(av, axis=1, keepdims=True)
    keep = live & (av >= theta * rowmax) & (av > 0)
    return jnp.where(keep, A.cols, PADCOL)


@partial(jax.jit, static_argnames=("n_rounds", "pmis"))
def _luby_rounds(gcols, measure, cf0, n_rounds, pmis: bool = False):
    """PMISR/PMIS Luby rounds over the padded symmetric graph (device
    sibling of src/PMISR_Modulek.kokkos.cxx; same logic as
    cf/device.py::pmisr_device but on PADCOL-padded cols).  PMIS passes a
    negated measure and the caller flips the markers afterwards; the
    zero-measure value follows the host pre-flip convention."""
    n = measure.shape[0]
    gidx = jnp.arange(n, dtype=jnp.int32)
    mask = gcols < PADCOL
    safe = jnp.minimum(gcols, n - 1)
    cf = cf0.astype(jnp.int32)
    assigned = cf != 0

    zero_nodes = (~assigned) & (jnp.abs(measure) < 1)
    zero_val = C_POINT if pmis else F_POINT
    cf = jnp.where(zero_nodes, zero_val, cf)
    assigned = assigned | zero_nodes

    def round_fn(carry, _):
        cf, assigned = carry
        nb_meas = measure[safe]
        active = mask & ~assigned[safe]
        lose = active & (
            (measure[:, None] > nb_meas)
            | ((measure[:, None] == nb_meas) & (gidx[:, None] > safe))
        )
        in_set = ~assigned & ~jnp.any(lose, axis=1)
        cf = jnp.where(in_set, F_POINT, cf)
        assigned = assigned | in_set
        nb_of_new = jnp.any(mask & in_set[safe], axis=1)
        assigned = assigned | nb_of_new
        return (cf, assigned), None

    (cf, assigned), _ = jax.lax.scan(round_fn, (cf, assigned), None,
                                     length=n_rounds)
    cf = jnp.where(cf == 0, C_POINT, cf)
    return cf


@jax.jit
def _symmetric_degree(scols):
    """Degree of each node in the symmetrized graph S + S^T, computed on
    the DIRECTED padded strength cols without materialising the transpose
    (the host symmetrizes explicitly, src/SAbs.F90; a device transpose
    needs a global sort whose XLA compile is pathological on TPU):
    |out| + |in| - |reciprocal|.  In-degree and reciprocal detection run
    as PER-COLUMN 1-D scatters/gathers: flattening an [n,K] index array
    forces a relayout whose XLA compile is pathological on TPU
    (measured ~18s vs ~1s for K unrolled 1-D scatters)."""
    n, K = scols.shape
    gidx = jnp.arange(n, dtype=scols.dtype)
    maskl = scols < PADCOL
    safe = jnp.minimum(scols, n - 1)
    out_deg = jnp.sum(maskl, axis=1, dtype=jnp.int32)

    def col(k, carry):
        in_deg, recip = carry
        sk = jax.lax.dynamic_index_in_dim(scols, k, 1, keepdims=False)
        mk = jax.lax.dynamic_index_in_dim(maskl, k, 1, keepdims=False)
        fk = jax.lax.dynamic_index_in_dim(safe, k, 1, keepdims=False)
        in_deg = in_deg.at[sk].add(mk.astype(jnp.int32), mode="drop")
        tr_k = scols[fk]                                 # [n, K]
        hit = mk & jnp.any(tr_k == gidx[:, None], axis=1)
        return in_deg, recip + hit.astype(jnp.int32)

    # fori_loop: K per-column passes compile once, not K times
    in_deg, recip = jax.lax.fori_loop(
        0, K, col, (jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32)))
    return out_deg + in_deg - recip


@partial(jax.jit, static_argnames=("n_rounds", "pmis"))
def _luby_directed(scols, measure, cf0, n_rounds, pmis: bool = False):
    """PMISR/PMIS Luby rounds over S + S^T expressed on the DIRECTED
    strength cols: out-edges are gathered, in-edges arrive by scatter-or,
    so no transpose pattern (and no global device sort) is ever built.
    Semantics identical to _luby_rounds on the symmetrized graph --
    a node is blocked when ANY unremoved neighbour in either direction
    carries a smaller measure (ties: smaller index), new set members and
    their neighbours leave the candidate pool, leftovers become C
    (reference: src/PMISR_Module.F90:200-473, fixed-step mode).  Runs as
    a while_loop so converged graphs stop early on device."""
    n = measure.shape[0]
    K = scols.shape[1]
    gidx = jnp.arange(n, dtype=jnp.int32)
    maskl = scols < PADCOL
    safe = jnp.minimum(scols, n - 1)
    cf = cf0.astype(jnp.int32)
    removed0 = cf != 0

    zero_nodes = (~removed0) & (jnp.abs(measure) < 1)
    zero_val = C_POINT if pmis else F_POINT
    cf = jnp.where(zero_nodes, zero_val, cf)
    removed0 = removed0 | zero_nodes
    m_nb = measure[safe]                                 # [n, K]

    # in-edge accumulations run as PER-COLUMN 1-D int scatters: flattening
    # the [n,K] index/value arrays forces a relayout whose XLA compile is
    # pathological on TPU (and bool scatter-max alone compiles ~13x
    # slower than int scatter-add); fori_loop so the K passes compile once
    def _scatter_or(vals2d):
        def col(k, acc):
            sk = jax.lax.dynamic_index_in_dim(scols, k, 1, keepdims=False)
            vk = jax.lax.dynamic_index_in_dim(vals2d, k, 1, keepdims=False)
            return acc.at[sk].add(vk.astype(jnp.int32), mode="drop")
        return jax.lax.fori_loop(0, K, col, jnp.zeros(n, jnp.int32)) > 0

    def body(carry):
        in_set, rounds, _ = carry
        cov_in = _scatter_or(in_set[:, None] & maskl)
        covered = (in_set | jnp.any(maskl & in_set[safe], axis=1)
                   | cov_in | removed0)
        blocker = ~covered
        beats_out = maskl & blocker[safe] & (
            (measure[:, None] > m_nb)
            | ((measure[:, None] == m_nb) & (gidx[:, None] > safe)))
        lose = jnp.any(beats_out, axis=1)
        beats_in = maskl & blocker[:, None] & (
            (m_nb > measure[:, None])
            | ((m_nb == measure[:, None]) & (safe > gidx[:, None])))
        lose = lose | _scatter_or(beats_in)
        new = blocker & ~lose
        return in_set | new, rounds + 1, jnp.any(new)

    init = (jnp.zeros(n, dtype=bool), jnp.int32(0), jnp.bool_(True))
    in_set, _, _ = jax.lax.while_loop(
        lambda c: c[2] & (c[1] < n_rounds), body, init)
    cf = jnp.where(in_set, F_POINT, cf)
    return jnp.where(cf == 0, C_POINT, cf)


@jax.jit
def _ddc_pass(A: DELL, cf, fraction_swap):
    """DDC second pass on device (reference: src/DDC_Module.F90 +
    src/DDC_Modulek.kokkos.cxx: the ratio is computed WITHOUT extracting
    A_ff).  Binned worst-fraction selection, 1000 bins like the host."""
    n = A.data.shape[0]
    N_BINS = 1000
    is_f = cf == F_POINT
    isd = A.cols == jnp.arange(n, dtype=A.cols.dtype)[:, None]
    live = A.cols < PADCOL
    safe = jnp.minimum(A.cols, n - 1)
    col_f = is_f[safe] & live & ~isd
    offsum = jnp.sum(jnp.where(col_f, jnp.abs(A.data), 0.0), axis=1)
    diag = jnp.sum(jnp.where(isd & live, A.data, 0.0), axis=1)
    ratio = jnp.where(jnp.abs(diag) > 0, offsum / jnp.abs(diag), jnp.inf)
    ratio = jnp.where(is_f, ratio, 0.0)

    fine_size = jnp.sum(is_f)
    search_size = (fine_size * fraction_swap).astype(jnp.int32)
    capped = jnp.where(jnp.isfinite(ratio), ratio, float(N_BINS))
    bins = jnp.clip(jnp.floor(capped * N_BINS).astype(jnp.int32), 0,
                    N_BINS - 1)
    counts = jnp.zeros(N_BINS, dtype=jnp.int32).at[
        jnp.where(is_f, bins, 0)].add(jnp.where(is_f, 1, 0))
    csum = jnp.cumsum(counts[::-1])
    bin_boundary = N_BINS - (jnp.searchsorted(csum, search_size) + 1)
    swap_dom_val = bin_boundary.astype(ratio.dtype) / N_BINS
    swap = is_f & (ratio != 0) & (ratio >= swap_dom_val) & (search_size > 0)
    return jnp.where(swap, -cf, cf)


# ~~~~~~~~~~ offset-structured (DIA) CF splitting ~~~~~~~~~~
#
# When the strength graph has few distinct (col - row) offsets (any
# stencil-structured fine grid; the 512^2 bench's level 0 has 2), every
# neighbour access in the Luby rounds and the degree computation is a
# STATIC SHIFT instead of a gather/scatter: measured on a v5 chip,
# a [262k, 16] vector gather costs ~30 ms and the K-column scatter pass
# ~29 ms, while 8 shifts measure below timer noise.  Semantics are
# edge-for-edge identical to _luby_directed / _symmetric_degree on the
# directed strength cols (ties break on index; the index comparison
# i vs i+offset is the STATIC sign of the offset).

_DIA_SPLIT_CAP = 12


def _scols_offsets(scols):
    """Distinct (col - row) offsets of the strength pattern as a static
    host tuple, or None when their count exceeds _DIA_SPLIT_CAP.  One
    f32 readback (int d2h stalls on remote TPU backends)."""
    cand = np.asarray(distinct_offsets_device(
        scols, cap=_DIA_SPLIT_CAP).astype(jnp.float32))
    offs = np.unique(cand[np.isfinite(cand)])
    offs = offs[np.abs(offs) < float(OFFBIG)]
    if len(offs) > _DIA_SPLIT_CAP:
        return None
    return tuple(int(o) for o in offs)


def _shift(x, od: int):
    """y[i] = x[i + od] with zero fill (static offset -> pure slices)."""
    n = x.shape[0]
    if od == 0:
        return x
    zeros = jnp.zeros((abs(od),), dtype=x.dtype)
    if od > 0:
        return jnp.concatenate([x[od:], zeros])
    return jnp.concatenate([zeros, x[:od]])


@partial(jax.jit, static_argnames=("offs", "rounds", "pmis", "ddc_its"))
def _split_fused_dia(A: DELL, scols, rand, ddc_frac, offs: tuple,
                     rounds: int, pmis: bool, ddc_its: int):
    """Measure + Luby + DDC for an offset-structured strength graph as
    ONE gather-free XLA program (shifts + elementwise only; the DDC pass
    keeps its single pattern gather)."""
    n = A.data.shape[0]
    ridx = jnp.arange(n, dtype=scols.dtype)
    # out-edge presence P[d][i]: edge i -> i+offs[d] (true only for real
    # columns, so shift wrap-around is always masked); in-edge presence
    # Pin[d][i]: edge (i-offs[d]) -> i
    P = [jnp.any(scols == (ridx + od)[:, None], axis=1) for od in offs]
    Pin = [_shift(p, -od) for p, od in zip(P, offs)]

    # symmetric degree |out| + |in| - |reciprocal| (reciprocal: the
    # out-edge i -> i+od whose reverse offset -od is present at i+od)
    deg = jnp.zeros(n, jnp.int32)
    neg_of = {od: i for i, od in enumerate(offs)}
    for d, od in enumerate(offs):
        deg = deg + P[d] + Pin[d]
        dn = neg_of.get(-od)
        if dn is not None:
            deg = deg - (P[d] & _shift(P[dn], od))

    measure = rand + deg.astype(A.dtype)
    if pmis:
        measure = -measure

    m_out = [_shift(measure, od) for od in offs]      # m[i + od]
    m_in = [_shift(measure, -od) for od in offs]      # m[i - od]
    zero_nodes = jnp.abs(measure) < 1
    zero_val = C_POINT if pmis else F_POINT
    cf = jnp.where(zero_nodes, zero_val, 0).astype(jnp.int32)
    removed0 = zero_nodes

    def body(carry):
        in_set, r, _ = carry
        covered = removed0 | in_set
        for d, od in enumerate(offs):
            covered = covered | (P[d] & _shift(in_set, od))
            covered = covered | (Pin[d] & _shift(in_set, -od))
        blocker = ~covered
        lose = jnp.zeros(n, dtype=bool)
        for d, od in enumerate(offs):
            # out edge i -> j=i+od: i loses to blocker j on larger
            # measure (tie: larger index, i > j iff od < 0)
            t_out = (measure > m_out[d]) if od > 0 else \
                (measure >= m_out[d])
            lose = lose | (P[d] & _shift(blocker, od) & t_out)
            # in edge j=i-od -> i: i loses to blocker j (tie: i > j iff
            # od > 0)
            t_in = (measure >= m_in[d]) if od > 0 else \
                (measure > m_in[d])
            lose = lose | (Pin[d] & _shift(blocker, -od) & t_in)
        new = blocker & ~lose
        return in_set | new, r + 1, jnp.any(new)

    init = (jnp.zeros(n, dtype=bool), jnp.int32(0), jnp.bool_(True))
    in_set, _, _ = jax.lax.while_loop(
        lambda c: c[2] & (c[1] < rounds), body, init)
    cf = jnp.where(in_set, F_POINT, cf)
    cf = jnp.where(cf == 0, C_POINT, cf)
    if pmis:
        cf = -cf
    for _ in range(ddc_its):
        cf = _ddc_pass(A, cf, ddc_frac)
    return cf, _count_pair(cf == F_POINT)


def _sym_graph(A: DELL, theta, square: bool = False):
    """Symmetrized (optionally squared, for distance-2) strength graph as
    padded cols [n, K] (reference: src/SAbs.F90 symmetrize/square)."""
    n = A.data.shape[0]
    scols = _strength_cols(A, theta)
    tcols = transpose_pattern(DELL(jnp.zeros_like(A.data), scols, n))
    if tcols.shape[1] < scols.shape[1]:
        tcols = jnp.pad(tcols,
                        ((0, 0), (0, scols.shape[1] - tcols.shape[1])),
                        constant_values=PADCOL)
    # sort BEFORE slicing: union_patterns leaves PADCOL holes in place of
    # duplicates, so live entries can sit beyond the max-row-count width
    gfull = union_patterns(scols, tcols)
    w = min(ceil8(max_row_count(gfull)), gfull.shape[1])
    gcols = jnp.sort(gfull, axis=1)[:, :w]
    if square:
        # S'S + S with symmetric S = S@S union S, diagonal dropped
        ones = (gcols < PADCOL).astype(A.dtype)
        S1 = DELL(ones, gcols, n)
        S2 = spgemm_drop_dell(S1, S1, 0.0, relative=True, lump=False)
        isd = S2.cols == jnp.arange(n, dtype=S2.cols.dtype)[:, None]
        c2 = jnp.where(isd, PADCOL, S2.cols)
        if c2.shape[1] < gcols.shape[1]:
            c2 = jnp.pad(c2, ((0, 0), (0, gcols.shape[1] - c2.shape[1])),
                         constant_values=PADCOL)
        elif gcols.shape[1] < c2.shape[1]:
            gcols = jnp.pad(
                gcols, ((0, 0), (0, c2.shape[1] - gcols.shape[1])),
                constant_values=PADCOL)
        gfull = union_patterns(gcols, c2)
        w = min(ceil8(max_row_count(gfull)), gfull.shape[1])
        gcols = jnp.sort(gfull, axis=1)[:, :w]
    return gcols


def _cr_split_device(A: DELL, opts: AIROptions):
    """Compatible-relaxation splitting on device (reference:
    src/CR_Splitting.F90): habituated relaxation sweeps with the device
    assembled inverse; the rate is the only scalar readback per pass."""
    from ..cf.cr import CR_CANDIDATE, CR_MAX_ITS, CR_NU, CR_NU_POLY

    n = A.data.shape[0]
    target = opts.strong_threshold       # carries the CR rate target
    cf = jnp.full(n, F_POINT, dtype=jnp.int32)
    rng = np.random.default_rng(opts.seed)
    rand_full = jnp.asarray(rng.random(n), dtype=A.dtype)
    for _ in range(CR_MAX_ITS):
        n_f = _read_pair(_count_pair(cf == F_POINT))
        if n_f == 0:
            break
        is_f = cf == F_POINT
        fine_idx = jnp.nonzero(is_f, size=n_f)[0].astype(jnp.int32)
        f_newidx = jnp.cumsum(is_f) - 1
        Aff = extract_dell(A, fine_idx, is_f, f_newidx, n_f,
                           ensure_diag=True)
        use_poly = (opts.inverse_type not in (InverseType.JACOBI,
                                              InverseType.WJACOBI)
                    and n_f > opts.poly_order + 1)
        nu = CR_NU_POLY if use_poly else CR_NU
        forced_c = jnp.zeros(n_f, dtype=bool)
        if use_poly:
            inv = _inverse_device(Aff, opts, opts.inverse_type,
                                  opts.poly_order, False, opts.seed,
                                  A.dtype)
            apply_inv = inv.apply
        else:
            d = Aff.diagonal()
            forced_c = d == 0.0
            dsafe = jnp.where(forced_c, 1.0, d)
            weight = 1.0
            if opts.inverse_type != InverseType.JACOBI:
                dsq = jnp.where(jnp.abs(dsafe) > 0,
                                1.0 / jnp.sqrt(jnp.abs(dsafe)), 0.0)
                safe = jnp.minimum(Aff.cols, n_f - 1)
                scaled = jnp.abs(Aff.data * dsq[:, None] * dsq[safe])
                norm_inf = jnp.max(jnp.sum(scaled, axis=1))
                weight = jnp.where(norm_inf != 0,
                                   3.0 / (4.0 * norm_inf), 1.0)
            dinv = jnp.where(forced_c, 0.0, weight / dsafe)
            apply_inv = lambda v: dinv * v
        e = rand_full[fine_idx]
        norm_e0 = jnp.linalg.norm(e)
        for _ in range(nu):
            e = e - apply_inv(Aff.matvec(e))
        rate = float((jnp.linalg.norm(e)
                      / jnp.where(norm_e0 != 0, norm_e0, 1.0))
                     ** (1.0 / nu))
        if rate <= target:
            break
        e_inf = jnp.max(jnp.abs(e))
        meas = jnp.where(forced_c, 2.0,
                         jnp.abs(e) / jnp.where(e_inf != 0, e_inf, 1.0))
        small = meas < CR_CANDIDATE
        cr_meas = 10.0 - (meas - rand_full[fine_idx] / 1e10)
        cr_meas = jnp.where(small, jnp.finfo(A.dtype).max, cr_meas)
        cf_aff0 = jnp.where(small, C_POINT, 0).astype(jnp.int32)
        # Luby over Aff + Aff^T
        tcols = transpose_pattern(Aff)
        w = max(Aff.cols.shape[1], tcols.shape[1])
        pad = lambda c: jnp.pad(c, ((0, 0), (0, w - c.shape[1])),
                                constant_values=PADCOL)
        gfull = union_patterns(pad(Aff.cols), pad(tcols))
        wcr = min(ceil8(max_row_count(gfull)), gfull.shape[1])
        gcols = jnp.sort(gfull, axis=1)[:, :wcr]
        cf_aff = _luby_rounds(gcols, cr_meas, cf_aff0, 25)
        swap = cf_aff == F_POINT
        # F rows that stay slowest become C on the full grid
        flip = jnp.zeros(n, dtype=bool).at[fine_idx].set(swap)
        cf = jnp.where(flip, -cf, cf)
        if float(jnp.sum(swap).astype(jnp.float32)) == 0:
            break
    return cf


@partial(jax.jit, static_argnames=("w",))
def _compact_cols(cols, w: int):
    """Left-pack a cols-only pattern and slice its width (strength graphs
    keep few entries per row; a narrow graph bounds the per-column
    scatter unroll in the degree/Luby programs and shrinks every
    downstream op)."""
    return jnp.sort(cols, axis=1)[:, :w]


@partial(jax.jit, static_argnames=("rounds", "pmis", "ddc_its"))
def _split_fused(A: DELL, scols, rand, ddc_frac, rounds: int, pmis: bool,
                 ddc_its: int):
    """Measure + Luby + DDC as ONE XLA program; returns (cf, n_f as f32)
    so the level loop needs a single scalar readback per split."""
    n = A.data.shape[0]
    measure = rand + _symmetric_degree(scols).astype(A.dtype)
    if pmis:
        measure = -measure
    cf = _luby_directed(scols, measure, jnp.zeros(n, jnp.int32), rounds,
                        pmis=pmis)
    if pmis:
        cf = -cf
    for _ in range(ddc_its):
        cf = _ddc_pass(A, cf, ddc_frac)
    return cf, _count_pair(cf == F_POINT)


def _cf_split_device(A: DELL, opts: AIROptions):
    """Device CF splitting: strength -> PMISR/PMIS Luby -> DDC (or the
    compatible-relaxation loop).  Only the random measures cross h2d;
    markers stay on device."""
    n = A.data.shape[0]
    t = CFSplittingType(opts.cf_splitting_type)
    if t == CFSplittingType.CR:
        cf = _cr_split_device(A, opts)
        return cf, _count_pair(cf == F_POINT)
    pmis = t in (CFSplittingType.PMIS, CFSplittingType.PMIS_DIST2)

    rng = np.random.default_rng(opts.seed)
    rand = jnp.asarray(rng.random(n), dtype=A.dtype)
    # 25 unbounded-equivalent rounds: Luby assigns everything in O(log n)
    # w.h.p.; leftovers become C exactly like the fixed-step reference mode
    rounds = opts.max_luby_steps if opts.max_luby_steps > 0 else 25
    if t == CFSplittingType.PMIS_DIST2:
        # distance-2 needs the explicit squared graph; built once with the
        # (compile-heavy, correct) transpose/union path
        cf0 = jnp.zeros(n, dtype=jnp.int32)
        gcols = _sym_graph(A, float(opts.strong_threshold), square=True)
        measure = rand + jnp.sum(gcols < PADCOL, axis=1).astype(A.dtype)
        cf = -_luby_rounds(gcols, -measure, cf0, rounds, pmis=True)
        return cf, _count_pair(cf == F_POINT)
    # PMISR/PMIS ride the directed strength cols: the symmetrized graph
    # is never materialised (its device transpose needs a global sort --
    # a pathological XLA compile on TPU).  Compact the strength pattern
    # first: one scalar readback buys narrow Luby/degree programs.
    # The width is EXACT-bucketed (4/8/then ceil8) rather than ceil8's
    # min-16: the Luby rounds are gather/scatter-bound and their cost is
    # linear in the width (measured 149ms at w=4 vs 507ms at w=16 for an
    # identical [166k] graph); strength graphs at production thresholds
    # keep only 1-4 entries per row.
    scols = _strength_cols(A, float(opts.strong_threshold))
    true_w = max(max_row_count(scols), 1)
    w = 4 if true_w <= 4 else (8 if true_w <= 8 else ceil8(true_w))
    w = min(w, scols.shape[1])
    scols = _compact_cols(scols, w)
    ddc_its = (opts.ddc_its
               if (opts.strong_threshold != 0.0
                   and t in (CFSplittingType.PMISR_DDC,
                             CFSplittingType.DIAG_DOM)) else 0)
    # offset-structured graphs take the gather-free shift formulation
    # (identical markers; the census is one more f32 readback per level)
    offs = _scols_offsets(scols)
    if offs is not None and len(offs) > 0:
        return _split_fused_dia(A, scols, rand, float(opts.ddc_fraction),
                                offs, rounds, pmis, ddc_its)
    return _split_fused(A, scols, rand, float(opts.ddc_fraction), rounds,
                        pmis, ddc_its)



def _count_pair(mask):
    """Exact integer count as a [2] f32 (hi, lo) pair: f32 d2h is the
    only stall-free transfer on remote TPU backends, but a single f32
    rounds above 2^24 -- and n_f is load-bearing (it sizes every index
    structure).  hi/lo base-2^20 digits are exact to 2^44 counts."""
    c = jnp.sum(mask.astype(jnp.int32))        # int on device: exact
    hi = c // 1048576
    return jnp.stack([hi, c - hi * 1048576]).astype(jnp.float32)


def _read_pair(pair) -> int:
    v = np.asarray(pair, dtype=np.float64)
    return int(v[0]) * 1048576 + int(v[1])


# ~~~~~~~~~~~~~~~~~~ compile prefetch ~~~~~~~~~~~~~~~~~~

_COMPILE_POOL = None

import threading as _threading

_LOWER_LOCK = _threading.Lock()


def _compile_pool():
    global _COMPILE_POOL
    if _COMPILE_POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        _COMPILE_POOL = ThreadPoolExecutor(
            max_workers=int(os.environ.get("PFLARE_COMPILE_THREADS", "8")))
    return _COMPILE_POOL


def _prefetch(tasks):
    """Warm the jit caches for (jitted_fn, args, kwargs) triples
    CONCURRENTLY.  The first-time device setup is compile-bound (~900s of
    XLA across ~400 programs at 512^2 on a tunnel backend) and the
    backend compiles in parallel (measured 4 concurrent compiles in the
    wall-clock of one); AOT lowering through the SAME jitted callable
    populates its dispatch cache, so the later real call is compile-free.
    A shape mis-specification only loses the prefetch benefit -- the real
    call compiles as usual."""
    import os

    if os.environ.get("PFLARE_NO_PRECOMPILE") == "1":
        return []
    if jax.default_backend() == "cpu":
        # Pool-side AOT compile races the MAIN thread's own jit
        # tracing/compiles (the pool lock below only excludes other pool
        # threads): jax's compile step walks the lowered MLIR module in
        # Python and racing walks segfault intermittently -- reproduced
        # on the in-process CPU backend mid-test-suite even with the
        # pool fully serialised.  A 1-core host gains nothing from
        # concurrent local compiles anyway, so prefetch is accelerator
        # -only (there the compile runs in a remote service and only the
        # LOWERING shares in-process state, serialised below).
        return []

    # Lowering happens HERE on the main thread: it shares in-process
    # jax/MLIR state with the main thread's own tracing, so doing it in
    # the pool would race that tracing (the pool lock can only exclude
    # other pool threads).  Lowering is tens of ms per program; only the
    # backend compile -- remote and genuinely concurrent (measured 4
    # compiles in the wall-clock of one) -- goes to the pool.
    def one(lowered):
        try:
            lowered.compile()
        except Exception:
            pass

    futures = []
    for f, a, k in tasks:
        try:
            with _LOWER_LOCK:
                lowered = f.lower(*a, **k)
        except Exception:
            continue
        futures.append(_compile_pool().submit(one, lowered))
    return futures


def _sdt(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _sdell(rows, width, n_cols, dtype):
    return DELL(_sdt((rows, width), dtype), _sdt((rows, width), jnp.int32),
                n_cols)


def _level_prefetch_a(A: DELL, opts: AIROptions, n: int, n_f: int,
                      n_c: int, dtype):
    """Post-CF-split prefetch wave: every level program whose shape is
    determined by (n, n_f, n_c, A.K) compiles in the pool while the main
    thread walks extraction -> inverse -> Z."""
    from ..inverse.gmres_poly import _arnoldi_fixed_core
    from ..sparse.dell import _extract_core

    K = A.K
    fdt = A.dtype
    i32 = jnp.int32
    cfS = _sdt((n,), i32)
    boolS = _sdt((n,), jnp.bool_)
    idxnS = _sdt((n,), i32)
    fineS = _sdt((n_f,), i32)
    coarseS = _sdt((n_c,), i32)
    Kff = ceil8(K + 1)
    A_ffS = _sdell(n_f, Kff, n_f, fdt)
    A_fcS = _sdell(n_f, K, n_c, fdt)
    A_cfS = _sdell(n_c, K, n_f, fdt)

    tasks = [
        (_split_indices, (cfS,), dict(n_f=n_f, n_c=n_c)),
        (_extract_core, (A, fineS, boolS, idxnS), dict(ensure_diag=True)),
        (_extract_core, (A, fineS, boolS, idxnS), dict(ensure_diag=False)),
        (_extract_core, (A, coarseS, boolS, idxnS),
         dict(ensure_diag=False)),
        (compact, (_sdt((n_f, K + 1), i32), _sdt((n_f, K + 1), fdt)),
         dict(new_K=K + 1)),
        (compact, (_sdt((n_f, K), i32), _sdt((n_f, K), fdt)),
         dict(new_K=K)),
        (compact, (_sdt((n_c, K), i32), _sdt((n_c, K), fdt)),
         dict(new_K=K)),
        (_mask_ext_ops, (A, cfS), {}),
        (_one_point_w, (A_fcS,), {}),
        (_assemble_p_ext, (fineS, coarseS, cfS), dict(n=n)),
        (onecol_product, (A, idxnS, _sdt((n,), fdt)), dict(n_cols_new=n)),
        (_inv_ext, (A_ffS, fineS, cfS), dict(n=n)),
    ]
    it = InverseType(opts.inverse_type)
    order = min(opts.poly_order, max(n_f - 1, 0))
    if it in (InverseType.ARNOLDI, InverseType.NEWTON,
              InverseType.NEWTON_NO_EXTRA):
        tasks.append((_arnoldi_fixed_core,
                      (A_ffS, None, _sdt((n_f,), fdt)),
                      dict(subspace=order + 1,
                           diag_scale=bool(opts.diag_scale_polys))))
    if it in (InverseType.POWER, InverseType.ARNOLDI):
        # (NEUMANN assembles through _neumann_dell, not poly_dell)
        tasks.append((poly_dell, (A_ffS, _sdt((order + 1,), fdt)), {}))
    if (opts.z_type == ZType.PRODUCT
            and opts.strong_r_threshold == 0.0
            and it not in (InverseType.JACOBI, InverseType.WJACOBI)):
        from ..sparse.dell import _spgemm_drop_jit, _row_count_max

        tasks.append((_spgemm_drop_jit,
                      (A_cfS, A_ffS, float(opts.r_drop)),
                      dict(relative=True, lump=False)))
        tasks.append((_row_count_max, (_sdt((n_c, K * Kff), i32),), {}))
    return _prefetch(tasks)


def _level_prefetch_b(A: DELL, Z: DELL, opts: AIROptions, n: int,
                      n_c: int, dtype):
    """Post-Z prefetch wave: the R assembly and the RAP product programs
    (shapes fixed once Z's compacted width is known) compile while the
    main thread assembles R/P."""
    from ..sparse.dell import (_SPGEMM_CHUNK_LIMIT, _SPGEMM_CHUNK_ROWS,
                               _row_count_max, _spgemm_drop_chunked_jit,
                               _spgemm_drop_jit)

    K = A.K
    fdt = A.dtype
    i32 = jnp.int32
    wr = ceil8(Z.K + 1)
    R_cS = _sdell(n_c, wr, n, fdt)
    APS = _sdell(n, K, n, fdt)
    coarseS = _sdt((n_c,), i32)
    tasks = [
        (_assemble_r_ext,
         (Z, _sdt((Z.n_cols,), i32), coarseS, _sdt((n,), i32)),
         dict(n=n)),
        (_r_compressed, (Z, _sdt((Z.n_cols,), i32), coarseS), dict(n=n)),
    ]
    if n_c * wr * K > _SPGEMM_CHUNK_LIMIT and n_c > _SPGEMM_CHUNK_ROWS:
        tasks.append((_spgemm_drop_chunked_jit,
                      (_sdt((n_c, wr), fdt), _sdt((n_c, wr), i32),
                       _sdt((n_c,), i32), APS, float(opts.a_drop)),
                      dict(relative=True, lump=bool(opts.a_lump))))
        tasks.append((_row_count_max,
                      (_sdt((n_c, wr * K), i32),), {}))
    else:
        tasks.append((_spgemm_drop_jit,
                      (R_cS, APS, float(opts.a_drop)),
                      dict(relative=True, lump=bool(opts.a_lump),
                           diag_of_row=coarseS)))
        tasks.append((_row_count_max, (_sdt((n_c, wr * K), i32),), {}))
    return _prefetch(tasks)


# ~~~~~~~~~~~~~~~~~~ level records ~~~~~~~~~~~~~~~~~~


@dataclass
class DeviceLevel:
    """Host metadata + device dict for one device-built level.  The nnz
    census stays a DEVICE vector until someone asks (each int() during
    setup would be a tunnel round-trip)."""

    n: int
    n_f: int
    n_c: int
    device: dict = field(default_factory=dict)
    nnz_dev: object = None    # [4] device vector: A, R, P, inv

    def _nnz(self, i):
        return (int(float(self.nnz_dev[i]))
                if self.nnz_dev is not None else 0)

    @property
    def nnz_A(self):
        return self._nnz(0)

    @property
    def nnz_R(self):
        return self._nnz(1)

    @property
    def nnz_P(self):
        return self._nnz(2)

    @property
    def nnz_inv(self):
        return self._nnz(3)


@dataclass
class DeviceHierarchy:
    """Result of the device first setup (mirrors Hierarchy's solve-facing
    surface; host CSR state is materialised lazily on demand)."""

    levels: list
    coarse_A: DELL
    coarse_inv: Inverse
    options: AIROptions
    top_A: DELL = None            # finest operator (Krylov matvec)
    device_levels: list = None

    @property
    def n_levels(self):
        return len(self.levels) + 1


def _ensure_diag(A: DELL) -> DELL:
    """Append a structural diagonal slot where missing (the polynomial c0
    term must land; cheap no-op column when already present)."""
    n = A.data.shape[0]
    ridx = jnp.arange(n, dtype=A.cols.dtype)
    has = jnp.any(A.cols == ridx[:, None], axis=1)
    if float(jnp.all(has).astype(jnp.float32)) == 1.0:
        return A
    extra = ceil8(A.cols.shape[1] + 1) - A.cols.shape[1]
    extra_c = jnp.full((n, extra), PADCOL, A.cols.dtype).at[:, 0].set(
        jnp.where(has, PADCOL, ridx))
    cols = jnp.concatenate([A.cols, extra_c], axis=1)
    data = jnp.concatenate(
        [A.data, jnp.zeros((n, extra), dtype=A.dtype)], axis=1)
    c, v = sort_rows(cols, data)
    return DELL(v, c, A.n_cols)


@jax.jit
def _qr_r_jit(K):
    return jnp.linalg.qr(K, mode="r")


@partial(jax.jit, static_argnames=("n_f", "n_c"))
def _split_indices(cf, n_f: int, n_c: int):
    """All CF index structures in ONE program (the eager op soup --
    nonzero, cumsum, compares -- costs ~10 XLA compiles per level
    otherwise).  Sized nonzero and big 1-D cumsum both compile
    pathologically on TPU: positions come from a doubling cumsum and the
    index lists from 1-D scatters."""
    n = cf.shape[0]
    is_f = cf == F_POINT
    is_c = ~is_f
    ar = jnp.arange(n, dtype=jnp.int32)
    cum_f = cumsum1d(is_f.astype(jnp.int32))
    f_newidx = cum_f - 1
    c_newidx = ar - cum_f            # == cumsum(is_c) - 1
    fine_idx = jnp.zeros(n_f, jnp.int32).at[
        jnp.where(is_f, f_newidx, n_f)].set(ar, mode="drop")
    coarse_idx = jnp.zeros(n_c, jnp.int32).at[
        jnp.where(is_c, c_newidx, n_c)].set(ar, mode="drop")
    return is_f, is_c, fine_idx, coarse_idx, f_newidx, c_newidx


@partial(jax.jit, static_argnames=("order",))
def _neumann_dell(A_ff: DELL, order: int) -> DELL:
    """Assembled Neumann-series inverse on device:
    M = (sum_k (I - D^-1 A)^k)|_S(A) @ D^-1 (device sibling of the host
    build in inverse/build.py; reference: src/Neumann_Poly.F90:177-212).
    A_ff must carry a structural diagonal (extract_dell ensure_diag)."""
    n = A_ff.shape[0]
    d = A_ff.diagonal()
    isd = A_ff.cols == jnp.arange(n, dtype=A_ff.cols.dtype)[:, None]
    live = A_ff.cols < PADCOL
    ndata = jnp.where(live, -A_ff.data / d[:, None], 0.0)
    ndata = jnp.where(isd, 1.0 + ndata, ndata)
    N = DELL(ndata, A_ff.cols, n)
    M = poly_dell(N, jnp.ones(order + 1, dtype=A_ff.dtype))
    safe = jnp.minimum(M.cols, n - 1)
    mdata = jnp.where(M.cols < PADCOL, M.data / d[safe], 0.0)
    return DELL(mdata, M.cols, M.n_cols)


def _inverse_device(A_ff: DELL, opts, inverse_type, poly_order,
                    matrix_free, seed, dtype):
    """Approximate inverse of a device matrix: coefficients via device
    matvecs + tiny host solves; assembly on device (reference:
    src/Approx_Inverse_Setup.F90 dispatch, device siblings in
    src/Gmres_Polyk.kokkos.cxx / src/Gmres_Poly_Newtonk.kokkos.cxx)."""
    inverse_type = InverseType(inverse_type)
    n = A_ff.shape[0]
    tol = tolerances(jnp.float64)
    # requesting f64 leaves with x64 off warns per call; the downcast is
    # the intended dtype policy (device arrays follow the jax x64 setting)
    import jax as _jax

    if (np.dtype(dtype) == np.float64
            and not _jax.config.jax_enable_x64):
        dtype = None
    if poly_order + 1 > n:
        poly_order = max(n - 1, 0)

    diag = A_ff.diagonal()
    if inverse_type in (InverseType.JACOBI, InverseType.WJACOBI):
        if inverse_type == InverseType.WJACOBI:
            dsqrt = jnp.sqrt(jnp.abs(diag))
            inv_ds = jnp.where(dsqrt > 0, 1.0 / dsqrt, 0.0)
            safe = jnp.minimum(A_ff.cols, n - 1)
            scaled = jnp.abs(A_ff.data * inv_ds[:, None] * inv_ds[safe])
            norm_inf = jnp.max(jnp.sum(scaled, axis=1))
            weight = 3.0 / (4.0 * norm_inf)
        else:
            weight = 1.0
        d = jnp.where(diag != 0, weight / diag, 0.0)
        return Inverse("diagonal", diag=d.astype(dtype),
                       meta={"type": int(inverse_type)})

    if inverse_type == InverseType.NEUMANN:
        ones = jnp.ones(poly_order + 1, dtype=dtype)
        if matrix_free:
            return Inverse("neumann_mf", mat=A_ff, coefficients=ones,
                           diag=diag, meta={"type": int(inverse_type)})
        # assembled: p(N)|_S(A) @ D^-1 with N = I - D^-1 A, matching the
        # host build (inverse/build.py) and src/Neumann_Poly.F90:177-212;
        # the Z product needs this real assembled inverse, not A_ff
        M = _neumann_dell(A_ff, poly_order)
        return Inverse("assembled", mat=M, coefficients=ones,
                       meta={"type": int(inverse_type)})

    mv = A_ff.matvec
    if opts.diag_scale_polys:
        mv = lambda v: A_ff.matvec(v) / diag
    sdiag = diag if opts.diag_scale_polys else None

    if inverse_type in (InverseType.NEWTON, InverseType.NEWTON_NO_EXTRA):
        # one fixed-shape Arnoldi program; roots from its Hessenberg
        r0 = box_muller(n, A_ff.dtype, seed)
        beta, H = arnoldi_fixed_device(A_ff, r0, poly_order + 1,
                                       diag=sdiag)
        m = reached_order(H, poly_order + 1, tol.lucky)
        wr, wi = newton_roots(
            None, n, poly_order, A_ff.dtype,
            add_roots=(inverse_type == InverseType.NEWTON), seed=seed,
            precomputed=(beta, H, m))
        steps = build_newton_program(wr, wi, tol.zero)
        coeffs2 = jnp.asarray(np.stack([wr, wi]), dtype=dtype)
        if matrix_free:
            return Inverse("newton_mf", mat=A_ff, steps=steps,
                           diag=diag if opts.diag_scale_polys else None,
                           scaled=opts.diag_scale_polys,
                           meta={"type": int(inverse_type)},
                           coefficients=coeffs2)
        M = newton_poly_dell(A_ff, wr, wi, tol.zero)
        return Inverse("assembled", mat=M, meta={"type": int(inverse_type)},
                       coefficients=coeffs2)

    if inverse_type == InverseType.POWER:
        # QR of the power basis runs ON DEVICE; only the tiny R factor
        # crosses d2h (the host-orchestrated default would pull the whole
        # [n, order+2] Krylov block through the tunnel)
        qr_dev = lambda K: np.asarray(_qr_r_jit(K), dtype=np.float64)
        coeffs = coefficients_power(mv, n, poly_order, A_ff.dtype,
                                    seed=seed, qr_reduce=qr_dev, xp=jnp)
    elif inverse_type == InverseType.ARNOLDI:
        r0 = box_muller(n, A_ff.dtype, seed)
        beta, H = arnoldi_fixed_device(A_ff, r0, poly_order + 1,
                                       diag=sdiag)
        coeffs = coefficients_arnoldi_from_h(beta, H, poly_order,
                                             A_ff.dtype)
    else:
        raise ValueError(f"device setup: unsupported inverse {inverse_type}")

    if matrix_free:
        cj = jnp.asarray(trim_high_order_zeros(coeffs), dtype=dtype)
        return Inverse("poly_mf", mat=A_ff, coefficients=cj,
                       diag=diag if opts.diag_scale_polys else None,
                       scaled=opts.diag_scale_polys,
                       meta={"type": int(inverse_type)})
    M = poly_dell(A_ff, jnp.asarray(coeffs, dtype=A_ff.dtype))
    return Inverse("assembled", mat=M, meta={"type": int(inverse_type)},
                   coefficients=jnp.asarray(coeffs, dtype=dtype))


# ~~~~~~~~~~~~~~~~~~ lAIR / SAI-lAIR on device ~~~~~~~~~~~~~~~~~~

_LAIR_CHUNK = 512


def _pattern_ones(M: DELL) -> DELL:
    """Pattern-only copy (live entries 1.0) for symbolic products."""
    return DELL((M.cols < PADCOL).astype(M.dtype), M.cols, M.n_cols)


def _compact_pattern(cols, dtype) -> "jnp.ndarray":
    """Left-pack a cols-only pattern to its tight ceil8 width (one scalar
    readback)."""
    w = max(max_row_count(cols), 1)
    c, _ = compact(cols, jnp.zeros(cols.shape, dtype), w)
    return c


@jax.jit
def _lair_solve_all(affd1, affc1, S3, I3, acfd3, acfc3):
    """Batched local least-squares rows of Z (device sibling of the
    per-row Kokkos team solves, reference: src/SAI_Zk.kokkos.cxx:13 /
    src/SAI_Z.F90:24): for every coarse row b with allowed pattern J
    (S3 row, over F columns) and shadow I (I3 row), build the dense
    TRANSPOSED local block M[a, c] = A_ff[J_c, I_a] by compare-reduce
    (broadcast MULTIPLY -- a broadcast where/select against gather output
    compiles pathologically on TPU), give padded unknowns disjoint unit
    rows so they decouple to exactly 0, and solve
    min || M z + A_cf[b, I] || with ONE batched MXU QR per chunk.
    affd1/affc1 carry a trailing sentinel row (dead J slots gather zeros,
    the spgemm_expand trick); chunks run under lax.map so the level
    compiles a single program.  Rank-deficient blocks (QR diagonal below
    1e-12 relative) return a zero row -- the reference falls back to a
    min-norm solve there; on-device the zero row keeps R's identity part
    only, which only weakens (never corrupts) the restrictor."""
    n_ff = affd1.shape[0] - 1

    def solve_chunk(args):
        J, I, acfd, acfc = args
        kc = J.shape[1]
        Jm = J < PADCOL
        Jsafe = jnp.where(Jm, jnp.minimum(J, n_ff - 1), n_ff)
        bc = affc1[Jsafe]                       # [CH, kc, Kff]
        bd = affd1[Jsafe]
        eq = (bc[:, None, :, :] == I[:, :, None, None]).astype(bd.dtype)
        M = jnp.einsum("back,bck->bac", eq, bd)  # [CH, ic, kc]
        live_I = (I < PADCOL).astype(bd.dtype)
        M = M * live_I[:, :, None]
        req = (acfc[:, None, :] == I[:, :, None]).astype(bd.dtype)
        rhs = -jnp.einsum("bak,bk->ba", req, acfd) * live_I
        aug = (jnp.eye(kc, dtype=M.dtype)[None, :, :]
               * (~Jm)[:, None, :].astype(M.dtype))
        M_ext = jnp.concatenate([M, aug], axis=1)
        rhs_ext = jnp.concatenate(
            [rhs, jnp.zeros((rhs.shape[0], kc), dtype=rhs.dtype)], axis=1)
        Q, R = jnp.linalg.qr(M_ext)
        qtb = jnp.einsum("bij,bi->bj", Q, rhs_ext)
        z = jax.scipy.linalg.solve_triangular(R, qtb[..., None],
                                              lower=False)[..., 0]
        rdiag = jnp.abs(jnp.diagonal(R, axis1=1, axis2=2))
        good = (rdiag.min(axis=1)
                > 1e-12 * jnp.maximum(rdiag.max(axis=1), 1e-300))
        good = good & jnp.isfinite(z).all(axis=1)
        return jnp.where(good[:, None] & Jm, z, 0.0)

    return jax.lax.map(solve_chunk, (S3, I3, acfd3, acfc3))


def _lair_z_device(A_ff: DELL, A_cf: DELL, A_ff_drop: DELL,
                   A_cf_drop: DELL, distance: int,
                   incomplete: bool) -> DELL:
    """lAIR / SAI-lAIR Z on device: distance-d sparsity
    A_cf_drop @ A_ff_drop^(d-1) from the DROPPED matrices, local solves
    against the UN-dropped ones (reference:
    src/AIR_Operators_Setup.F90:700-782).  Returns the un-r_dropped Z."""
    n_c = A_cf.shape[0]
    n_f = A_ff.shape[0]
    if distance == 1:
        Scols = _compact_pattern(A_cf_drop.cols, A_cf.dtype)
    else:
        P = _pattern_ones(A_ff_drop)
        for _ in range(3, distance + 1):
            P = _pattern_ones(
                spgemm_drop_dell(_pattern_ones(A_ff_drop), P, 0.0, True,
                                 False))
        Scols = spgemm_drop_dell(_pattern_ones(A_cf_drop), P, 0.0, True,
                                 False).cols
    if incomplete:
        Icols = Scols
    else:
        # shadow(J): the pattern of S @ A_ff (all F columns reachable from
        # the allowed rows)
        Icols = spgemm_drop_dell(
            _pattern_ones(DELL(jnp.zeros(Scols.shape, A_ff.dtype), Scols,
                               n_f)),
            _pattern_ones(A_ff), 0.0, True, False).cols

    CH = min(_LAIR_CHUNK, max(n_c, 1))
    nch = -(-n_c // CH)
    padn = nch * CH - n_c
    pc = lambda x: jnp.pad(x, ((0, padn), (0, 0)), constant_values=PADCOL)
    pv = lambda x: jnp.pad(x, ((0, padn), (0, 0)))
    S3 = pc(Scols).reshape(nch, CH, -1)
    I3 = pc(Icols).reshape(nch, CH, -1)
    acfc3 = pc(A_cf.cols).reshape(nch, CH, -1)
    acfd3 = pv(A_cf.data).reshape(nch, CH, -1)
    affd1 = jnp.concatenate(
        [A_ff.data, jnp.zeros((1, A_ff.K), A_ff.dtype)], axis=0)
    affc1 = jnp.concatenate(
        [A_ff.cols, jnp.full((1, A_ff.K), PADCOL, A_ff.cols.dtype)], axis=0)
    z3 = _lair_solve_all(affd1, affc1, S3, I3, acfd3, acfc3)
    zdata = z3.reshape(nch * CH, -1)[:n_c]
    return DELL(zdata, Scols, n_f)


@partial(jax.jit, static_argnames=("its",))
def _improve_z_device(Z: DELL, A_ff: DELL, A_cf: DELL, inv_diag,
                      its: int) -> DELL:
    """Fixed-sparsity Richardson improvement of Z on device (reference:
    src/Grid_Transfer_Improve.F90:200-376):
    Z <- Z - (Z A_ff + A_cf)|_S(Z) D with D = diag of the approximate
    inverse of A_ff, scaling both residual terms."""
    n_f = A_ff.shape[0]
    safe = jnp.minimum(Z.cols, n_f - 1)
    dcol = jnp.where(Z.cols < PADCOL, inv_diag[safe], 0.0)
    acf_at = gather_at_pattern(Z.cols, A_cf)
    zv = Z.data
    # all iterations restrict onto Z's fixed pattern: one gather of
    # A_ff's rows (restrict_plan), gather-free contractions per step
    from ..sparse.dell import apply_restrict_plan, restrict_plan

    T = restrict_plan(Z.cols, A_ff)
    for _ in range(its):
        za = apply_restrict_plan(T, zv)
        zv = zv - (za + acf_at) * dcol
    return DELL(zv, Z.cols, Z.n_cols)


@jax.jit
def _one_point_w(A_fc: DELL):
    """One-point classical W: the strongest |A_fc| entry per F row becomes
    1.0 (reference: src/Grid_Transfer.F90:26-220).  Returns the coarse
    column index per F row (PADCOL where the row is empty)."""
    live = A_fc.cols < PADCOL
    av = jnp.where(live, jnp.abs(A_fc.data), -1.0)
    best = jnp.argmax(av, axis=1)
    has = jnp.max(av, axis=1) > 0
    wcol = jnp.take_along_axis(A_fc.cols, best[:, None], axis=1)[:, 0]
    return jnp.where(has, wcol, PADCOL)


@partial(jax.jit, static_argnames=("n",))
def _r_compressed(Z: DELL, fine_idx, coarse_idx, n: int):
    """R rows in COARSE numbering [n_c, Kz+1] with GLOBAL columns: Z's
    row (cols mapped to global fine positions) + the identity entry at
    the row's global coarse position.  The RAP product runs on these
    compressed rows -- the full-space R_ext's fine rows are all empty, so
    the [n, ...] product wastes more than half its sort work."""
    live = Z.cols < PADCOL
    gcols = jnp.where(
        live,
        fine_idx[jnp.minimum(Z.cols, fine_idx.shape[0] - 1)]
        .astype(jnp.int32), PADCOL)
    cols = jnp.concatenate([gcols, coarse_idx[:, None]], axis=1)
    vals = jnp.concatenate(
        [Z.data, jnp.ones((Z.data.shape[0], 1), Z.dtype)], axis=1)
    pad = ceil8(cols.shape[1]) - cols.shape[1]
    if pad:
        cols = jnp.pad(cols, ((0, 0), (0, pad)), constant_values=PADCOL)
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
    c, v = sort_rows(cols, vals)
    return DELL(v, c, n)


@partial(jax.jit, static_argnames=("n",))
def _assemble_r_ext(Z: DELL, fine_idx, coarse_idx, cf, n: int):
    """R_ext [n, n]: for global coarse row i, Z's row (cols mapped to
    global fine positions) + the identity entry at column i (reference:
    compute_R_from_Z src/Grid_Transfer.F90:465, pre-extended to the level's
    full space as in air/fullspace.py)."""
    is_c = cf == C_POINT
    c_newidx = cumsum1d(is_c.astype(jnp.int32)) - 1
    src = jnp.where(is_c, c_newidx, 0)
    zcols = Z.cols[src]                          # [n, Kz]
    zvals = Z.data[src]
    live = (zcols < PADCOL) & is_c[:, None]
    gcols = jnp.where(live, fine_idx[jnp.minimum(zcols, fine_idx.shape[0]
                                                 - 1)].astype(jnp.int32),
                      PADCOL)
    gvals = jnp.where(live, zvals, 0.0)
    ident_c = jnp.where(is_c, jnp.arange(n, dtype=jnp.int32), PADCOL)
    cols = jnp.concatenate([gcols, ident_c[:, None]], axis=1)
    vals = jnp.concatenate(
        [gvals, jnp.where(is_c, 1.0, 0.0)[:, None].astype(gvals.dtype)],
        axis=1)
    pad = ceil8(cols.shape[1]) - cols.shape[1]
    if pad:     # widths stay multiples of 8 (gather-index alignment)
        cols = jnp.pad(cols, ((0, 0), (0, pad)), constant_values=PADCOL)
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
    return sort_rows(cols, vals)


@partial(jax.jit, static_argnames=("n",))
def _assemble_p_ext(wcol, coarse_idx, cf, n: int):
    """P_ext [n, n] with one entry per row: identity on coarse rows, the
    one-point W target (as a global column) on fine rows.  Returns both
    the padded width-8 operator arrays and the 1-D (pcol, pval) relabel
    form (the RAP step uses onecol_product to avoid the full-width
    expand)."""
    is_c = cf == C_POINT
    is_f = cf == F_POINT
    f_newidx = cumsum1d(is_f.astype(jnp.int32)) - 1
    wsrc = jnp.where(is_f, f_newidx, 0)
    wc = wcol[wsrc]
    wc_ok = is_f & (wc < PADCOL)
    gw = jnp.where(wc_ok,
                   coarse_idx[jnp.minimum(wc, coarse_idx.shape[0] - 1)]
                   .astype(jnp.int32), PADCOL)
    cols = jnp.where(is_c, jnp.arange(n, dtype=jnp.int32), gw)
    vals = jnp.where(is_c | wc_ok, 1.0, 0.0)
    # width ceil8(1)=16, entry in slot 0 (the width policy: minor dim
    # exactly 8 is itself a pathological TPU compile shape, see
    # sparse/dell.py::ceil8)
    w8 = ceil8(1)
    cols8 = jnp.full((n, w8), PADCOL, jnp.int32).at[:, 0].set(cols)
    vals8 = jnp.zeros((n, w8), vals.dtype).at[:, 0].set(vals)
    return cols8, vals8, cols, vals


@jax.jit
def _mask_ext_ops(A: DELL, cf):
    """Full-space masked operators from the level matrix: A_ff_ext and
    A_fc_ext share A's layout with values zeroed outside the blocks (the
    gather-free full-space design, air/fullspace.py)."""
    n = A.data.shape[0]
    is_f = (cf == F_POINT)
    fmask = is_f.astype(A.dtype)
    safe = jnp.minimum(A.cols, n - 1)
    colf = is_f[safe] & (A.cols < PADCOL)
    aff = A.data * fmask[:, None] * colf.astype(A.dtype)
    afc = A.data * fmask[:, None] * (~colf & (A.cols < PADCOL)).astype(
        A.dtype)
    return aff, afc, fmask


@partial(jax.jit, static_argnames=("n",))
def _inv_ext(inv_mat: DELL, fine_idx, cf, n: int):
    """Assembled compressed-F inverse -> full-space layout [n, K]."""
    is_f = cf == F_POINT
    f_newidx = cumsum1d(is_f.astype(jnp.int32)) - 1
    src = jnp.where(is_f, f_newidx, 0)
    icols = inv_mat.cols[src]
    ivals = inv_mat.data[src]
    live = (icols < PADCOL) & is_f[:, None]
    gcols = jnp.where(
        live, fine_idx[jnp.minimum(icols, fine_idx.shape[0] - 1)]
        .astype(jnp.int32), PADCOL)
    return gcols, jnp.where(live, ivals, 0.0)


def _extend_inverse(inv: Inverse, A_ff_ext_op: DELL, fine_idx, cf, n: int,
                    dtype) -> Inverse:
    """Full-space form of a compressed-F inverse (device analogue of
    air/fullspace.py::inverse_to_fullspace)."""
    is_f = cf == F_POINT
    if inv.kind == "diagonal":
        f_newidx = cumsum1d(is_f.astype(jnp.int32)) - 1
        src = jnp.where(is_f, f_newidx, 0)
        d = jnp.where(is_f, inv.diag[src], 0.0).astype(dtype)
        return Inverse("diagonal", diag=d, meta=inv.meta)
    if inv.kind == "assembled":
        gcols, gvals = _inv_ext(inv.mat, fine_idx, cf, n)
        return Inverse("assembled",
                       mat=DELL(gvals.astype(dtype), gcols, n),
                       meta=inv.meta, coefficients=inv.coefficients)
    # matrix-free: swap in the extended operator; extend the diagonal with
    # ones outside F
    diag_ext = None
    if inv.diag is not None:
        f_newidx = cumsum1d(is_f.astype(jnp.int32)) - 1
        src = jnp.where(is_f, f_newidx, 0)
        diag_ext = jnp.where(is_f, inv.diag[src], 1.0).astype(dtype)
    coeffs = inv.coefficients
    if coeffs is not None:
        coeffs = coeffs.astype(dtype)
    return Inverse(inv.kind, mat=A_ff_ext_op, coefficients=coeffs,
                   steps=inv.steps, diag=diag_ext, scaled=inv.scaled,
                   meta=inv.meta)


# ~~~~~~~~~~~~~~~~~~ the level loop ~~~~~~~~~~~~~~~~~~


def setup_hierarchy_device(A, opts: AIROptions, dtype=jnp.float32
                           ) -> DeviceHierarchy:
    """Build the AIR hierarchy with all O(nnz) work on the accelerator.

    ``A``: scipy CSR (uploaded once) or a DELL already on device.
    """
    if not device_setup_supported(opts):
        raise ValueError("device setup does not support this option set; "
                         "use the host path")
    if not isinstance(A, DELL):
        A = DELL.from_scipy(A, dtype=dtype)
    top_A = A

    levels: list[DeviceLevel] = []
    auto_truncated = False
    level_idx = 0
    while level_idx < opts.max_levels - 1:
        n = A.shape[0]

        # auto-truncation probe (reference: src/AIR_MG_Setup.F90:158-256):
        # build the coarsest solver HERE and stop if it already reduces a
        # random residual below the tolerance -- one scalar readback
        if (opts.auto_truncate_start_level > 0
                and level_idx + 1 >= opts.auto_truncate_start_level):
            with timer("air_inverse"):
                probe_inv = _inverse_device(
                    _ensure_diag(A), opts, opts.coarsest_inverse_type,
                    opts.coarsest_poly_order,
                    opts.coarsest_matrix_free_polys, opts.seed, dtype)
            rng_p = np.random.default_rng(opts.seed + 101)
            b_p = jnp.asarray(rng_p.standard_normal(n), dtype=A.dtype)
            x_p = probe_inv.apply(b_p)
            r_p = b_p - A.matvec(x_p)
            quality = float(jnp.linalg.norm(r_p) / jnp.linalg.norm(b_p))
            if quality <= opts.auto_truncate_tol:
                auto_truncated = True
                coarse_inv = probe_inv
                break

        with timer("air_coarsen"):
            cf, nf_dev = _cf_split_device(A, opts)
            # float route: int d2h stalls for minutes on some TPU backends
            n_f = _read_pair(nf_dev)
            n_c = n - n_f
        if n_c <= opts.coarse_eq_limit or n_f == 0:
            break

        # compile-prefetch wave A: the level's downstream programs
        # compile concurrently in the pool while this thread walks
        # extraction -> inverse -> Z (first-time setup is compile-bound)
        _level_prefetch_a(A, opts, n, n_f, n_c, dtype)
        with timer("air_extract"):
            (is_f, is_c, fine_idx, coarse_idx, f_newidx,
             c_newidx) = _split_indices(cf, n_f, n_c)
            # capacity-bounded extracts: a submatrix can only shrink rows,
            # so the parent width is a valid bound and skipping the shape
            # readback saves a tunnel round-trip per product
            A_ff = extract_dell(A, fine_idx, is_f, f_newidx, n_f,
                                ensure_diag=True, compact_width=False)
            A_fc = extract_dell(A, fine_idx, is_c, c_newidx, n_c,
                                compact_width=False)
            A_cf = extract_dell(A, coarse_idx, is_f, f_newidx, n_f,
                                compact_width=False)

        # strong-R dropped copies, used ONLY for the grid transfers
        # (reference: src/AIR_Operators_Setup.F90:56-107; the smoother
        # inverse below stays on the un-dropped A_ff)
        strong_r = float(opts.strong_r_threshold)
        if strong_r != 0.0:
            with timer("air_drop"):
                sdc, sdv = drop_rows(A.cols, A.data, strong_r, True, False)
                A_sdrop = DELL(sdv, sdc, n)
                A_ff_drop = extract_dell(A_sdrop, fine_idx, is_f, f_newidx,
                                         n_f, ensure_diag=True,
                                         compact_width=False)
                A_cf_drop = extract_dell(A_sdrop, coarse_idx, is_f,
                                         f_newidx, n_f, compact_width=False)
        else:
            A_ff_drop, A_cf_drop = A_ff, A_cf

        with timer("air_inverse"):
            inv_Aff = _inverse_device(
                A_ff, opts, opts.inverse_type, opts.poly_order,
                opts.matrix_free_polys, opts.seed, dtype)
            # AIRG Z needs an ASSEMBLED inverse of the DROPPED A_ff
            # (reference: src/AIR_Operators_Setup.F90:406-475)
            inv_for_z = None
            dinv_z = None
            if opts.z_type == ZType.PRODUCT:
                if inv_Aff.kind == "diagonal":
                    dinv_z = inv_Aff.diag   # the diagonal never drops
                    if (strong_r != 0.0
                            and opts.inverse_type == InverseType.WJACOBI):
                        # the hypre weight sees the DROPPED A_ff on the
                        # host path (src/AIR_Operators_Setup.F90:406-475)
                        dinv_z = _inverse_device(
                            A_ff_drop, opts, opts.inverse_type,
                            opts.poly_order, False, opts.seed, dtype).diag
                elif strong_r == 0.0 and inv_Aff.kind == "assembled":
                    inv_for_z = inv_Aff.mat
                else:
                    inv_z_obj = _inverse_device(
                        A_ff_drop, opts, opts.inverse_type, opts.poly_order,
                        False, opts.seed, dtype)
                    inv_for_z = inv_z_obj.mat

        with timer("air_restrict"):
            drop_after = opts.improve_z_its > 0
            if opts.z_type != ZType.PRODUCT:
                Z = _lair_z_device(A_ff, A_cf, A_ff_drop, A_cf_drop,
                                   int(opts.lair_distance),
                                   incomplete=(opts.z_type == ZType.LAIR))
                drop_after = True
            elif dinv_z is not None:
                safe = jnp.minimum(A_cf_drop.cols, n_f - 1)
                zdata = -A_cf_drop.data * jnp.where(
                    A_cf_drop.cols < PADCOL, dinv_z[safe], 0.0)
                Z = DELL(zdata, A_cf_drop.cols, n_f)
                drop_after = True
            else:
                # default diag_of_row inside the fused drop: the (i,i)
                # entry of the rectangular Z is protected from the
                # relative drop like the host remove_small_from_sparse
                tol_z = 0.0 if drop_after else float(opts.r_drop)
                Z = spgemm_drop_dell(A_cf_drop, inv_for_z, tol_z,
                                     relative=True, lump=False)
                Z = DELL(-Z.data, Z.cols, Z.n_cols)
            if opts.improve_z_its > 0:
                # D = diag of the approximate inverse (reference:
                # src/Grid_Transfer_Improve.F90:60-66)
                if inv_for_z is not None:
                    inv_diag = inv_for_z.diagonal()
                elif dinv_z is not None:
                    inv_diag = dinv_z
                elif inv_Aff.kind == "assembled":
                    inv_diag = inv_Aff.mat.diagonal()
                elif inv_Aff.kind == "diagonal":
                    inv_diag = inv_Aff.diag
                else:
                    d0 = A_ff.diagonal()
                    inv_diag = jnp.where(d0 != 0, 1.0 / d0, 0.0)
                Z = _improve_z_device(Z, A_ff, A_cf, inv_diag,
                                      int(opts.improve_z_its))
            if drop_after:
                zc, zv = drop_rows(Z.cols, Z.data, float(opts.r_drop),
                                   True, False)
                zc, zv = compact(zc, zv, max(max_row_count(zc), 1))
                Z = DELL(zv, zc, n_f)
            # wave B: the RAP product programs compile while R/P assemble
            _level_prefetch_b(A, Z, opts, n, n_c, dtype)
            rcols, rvals = _assemble_r_ext(Z, fine_idx, coarse_idx, cf, n)
            R_ext = DELL(rvals.astype(dtype), rcols, n)

        with timer("air_prolong"):
            wcol = _one_point_w(A_fc)
            pcols, pvals, p1col, p1val = _assemble_p_ext(wcol, coarse_idx,
                                                         cf, n)
            P_ext = DELL(pvals.astype(dtype), pcols, n)

        with timer("air_rap"):
            # AP = A @ P_ext [n, n]: P has at most ONE entry per row, so
            # the product is a pure column relabeling merged at A's own
            # width (the general expand at [n, Ka*Kp] wastes HBM).  The
            # RAP product then runs on COARSE ROWS ONLY (R's fine rows
            # are empty) with the global coarse positions as the
            # protected diagonals, and a column compression renumbers to
            # the next level matrix [n_c, n_c]
            AP = onecol_product(A, p1col, p1val.astype(A.dtype), n)
            R_c = _r_compressed(Z, fine_idx, coarse_idx, n)
            RAP_c = spgemm_drop_dell(R_c, AP, float(opts.a_drop),
                                     relative=True, lump=opts.a_lump,
                                     diag_of_row=coarse_idx)
            A_next = extract_dell(RAP_c,
                                  jnp.arange(n_c, dtype=jnp.int32),
                                  is_c, c_newidx, n_c,
                                  compact_width=False)

        aff_ext, afc_ext, fmask = _mask_ext_ops(A, cf)
        A_ff_ext_op = DELL(aff_ext, A.cols, n)
        dev = {
            "mask_f": fmask,
            "fine": fine_idx,
            "coarse": coarse_idx,
            "A_ff": A_ff_ext_op,
            "A_fc": DELL(afc_ext, A.cols, n),
            "inv_Aff": _extend_inverse(inv_Aff, A_ff_ext_op, fine_idx, cf,
                                       n, dtype),
            "R": R_ext,
            "P": P_ext,
        }
        levels.append(DeviceLevel(
            n=n, n_f=n_f, n_c=n_c, device=dev,
            nnz_dev=_level_nnz(
                A.cols, R_ext.cols, P_ext.cols,
                inv_Aff.mat.cols if inv_Aff.kind == "assembled" else None),
        ))
        A = A_next
        level_idx += 1

    if not auto_truncated:
        with timer("air_inverse"):
            coarse_inv = _inverse_device(
                A, opts, opts.coarsest_inverse_type,
                opts.coarsest_poly_order,
                opts.coarsest_matrix_free_polys, opts.seed, dtype)

    h = DeviceHierarchy(levels, A, coarse_inv, opts, top_A=top_A)
    h.device_levels = [lvl.device for lvl in levels]
    _optimize_layouts(h)
    return h


@jax.jit
def _level_nnz(a_cols, r_cols, p_cols, inv_cols):
    """Fused nnz census for one level as a [4] DEVICE vector (read back
    lazily: four eager int() calls were four tunnel round-trips)."""
    # f32: integer d2h transfers stall for minutes on first use on some
    # remote TPU backends (exact up to 2^24 nnz; beyond that the census
    # is a statistics-only approximation)
    cnt = lambda c: (jnp.sum(c < PADCOL).astype(jnp.float32)
                     if c is not None else jnp.zeros((), jnp.float32))
    return jnp.stack([cnt(a_cols), cnt(r_cols), cnt(p_cols),
                      cnt(inv_cols)])


@partial(jax.jit, static_argnames=("cap",))
def _dia_census_jit(cols, cap: int):
    offs = distinct_offsets_device(cols, cap=cap)
    nnz = jnp.sum(cols < PADCOL)
    # f32 d2h (int transfers stall on first use on remote TPU backends);
    # offsets < 2^24 and OFFBIG = 2^29 (a power of two) are f32-exact
    return offs.astype(jnp.float32), nnz.astype(jnp.float32)[None]


def _dia_census(op: DELL, cap: int = 16):
    """(blockwise offset candidates [CENSUS_ROWS, cap+1], nnz [1]) as
    DEVICE arrays for DIA viability -- the whole census is ONE device
    program per pattern shape so _optimize_layouts can batch ONE readback
    for every operator of every level; the host finishes with np.unique
    over the ~70KB block candidates."""
    return _dia_census_jit(op.cols, cap)


@partial(jax.jit, static_argnames=("offsets",))
def _dia_rows_jit(data, cols, offsets: tuple):
    """All DIA diagonals in ONE program (per-offset eager reductions cost
    an XLA compile each)."""
    n = data.shape[0]
    ridx = jnp.arange(n, dtype=cols.dtype)[:, None]
    live = cols < PADCOL
    offs = jnp.where(live, cols - ridx, jnp.int32(2**30))
    return jnp.stack([
        jnp.sum(jnp.where(offs == int(off), data, 0.0), axis=1)
        for off in offsets])


def _dell_to_dia(op: DELL, census: np.ndarray, nnz: float):
    """DELL -> DIA when the offset structure pays.  Arbitrary-index
    gathers measure ~50x slower than offset slices on TPU (docs/tpu.md),
    so device-built hierarchies get the same DIA fast path as host-built
    ones.  ``census``: host [CENSUS_ROWS, cap+1] block candidates."""
    n = op.data.shape[0]
    uniq = np.unique(census.astype(np.int64))
    uniq = uniq[uniq < int(OFFBIG)]
    if len(uniq) > 8 or len(uniq) * n > 3 * max(int(nnz), 1):
        return None
    return DIA(uniq.tolist(),
               _dia_rows_jit(op.data, op.cols, tuple(int(o) for o in uniq)),
               (n, n))


def _optimize_layouts(h: "DeviceHierarchy"):
    """Upgrade gather (DELL) operators to DIA where viable.  The offset
    censuses for ALL levels are computed on device first and cross d2h in
    ONE batched readback (the old per-op np.unique pulled every pattern
    through the tunnel and its flat device sort compiled pathologically)."""
    cands = []
    for dev in h.device_levels:
        for key in ("A_ff", "A_fc", "R", "P"):
            op = dev.get(key)
            if isinstance(op, DELL) and op.n_cols == op.data.shape[0]:
                cands.append((dev, key, op))
        inv = dev.get("inv_Aff")
        if (inv is not None and inv.kind == "assembled"
                and isinstance(inv.mat, DELL)
                and inv.mat.n_cols == inv.mat.data.shape[0]):
            cands.append((dev, "_inv_mat", inv.mat))
    if not cands:
        return
    # operators sharing one cols array (A_ff_ext/A_fc_ext keep A's layout)
    # share one census; prefetch the census programs concurrently (one
    # XLA program per distinct pattern shape)
    seen_shapes = set()
    tasks = []
    for _, _, op in cands:
        if op.cols.shape not in seen_shapes:
            seen_shapes.add(op.cols.shape)
            tasks.append((_dia_census_jit,
                          (_sdt(op.cols.shape, op.cols.dtype),),
                          dict(cap=16)))
    _prefetch(tasks)
    by_id = {}
    for _, _, op in cands:
        if id(op.cols) not in by_id:
            by_id[id(op.cols)] = (len(by_id), _dia_census(op))
    vals = list(by_id.values())
    stacked = np.asarray(jnp.stack([c for _, (c, _) in vals]))
    nnzs = np.asarray(jnp.concatenate([z for _, (_, z) in vals]))
    for dev, key, op in cands:
        slot = by_id[id(op.cols)][0]
        dia = _dell_to_dia(op, stacked[slot], nnzs[slot])
        if dia is None:
            continue
        if key == "_inv_mat":
            dev["inv_Aff"].mat = dia
        else:
            dev[key] = dia
    for dev in h.device_levels:
        # matrix-free inverses share the (possibly upgraded) A_ff op
        inv = dev.get("inv_Aff")
        if (inv is not None and inv.kind in ("poly_mf", "newton_mf",
                                             "neumann_mf")
                and isinstance(inv.mat, DELL)
                and isinstance(dev.get("A_ff"), DIA)):
            inv.mat = dev["A_ff"]
