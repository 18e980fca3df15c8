"""Neighbour-only distributed SpGEMM over the row mesh.

C = drop(A @ B) for row-sharded DELL operands.  Each shard's expand step
gathers B rows addressed by its local A columns; for banded partitions
those rows live in the shard's own B block plus one neighbour block per
side, so the exchange is two full-block ``ppermute`` shifts over ICI --
the PetscSF neighbour semantics of the reference's distributed
MatMatMult/MatPtAP (reference: src/AIR_Operators_Setup.F90:993-1033,
src/PMISR_Module.F90:476-643) -- instead of GSPMD's general resharding
(which all-gathers the whole operator for an arbitrary-index gather).

Used by the device first setup's products whenever the operands arrive
row-sharded and the band check passes (sparse/dell.py::spgemm_drop_dell
routes here); RCM reordering makes most unstructured operators banded.
Rectangular products (A_cf @ inv, R @ AP) are supported: the band
condition is per-space -- every A column's OWNER SHARD in B's row
partition must be within one of the A row's shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..sparse.dell import (DELL, PADCOL, drop_rows, segsum_rows, sort_rows)
from .mesh import ROW_AXIS


def _mesh_of(x):
    """The 1-D mesh a row-sharded array lives on, or None."""
    sh = getattr(x, "sharding", None)
    if not isinstance(sh, NamedSharding):
        return None
    spec = tuple(sh.spec)
    if not spec or spec[0] is None or any(s is not None for s in spec[1:]):
        return None
    if len(sh.mesh.axis_names) != 1:
        return None
    return sh.mesh


def halo_mesh_for(A: DELL, B: DELL):
    """The shared 1-D row mesh when both operands are row-sharded on one
    and their row counts divide it; else None."""
    ma = _mesh_of(A.data)
    mb = _mesh_of(B.data)
    if ma is None or mb is None or ma != mb:
        return None
    S = ma.devices.size
    if A.data.shape[0] % S or B.data.shape[0] % S:
        return None
    return ma


@jax.jit
def _band_ok(acols, rows_global, w_a: int, w_b: int):
    """True when every live A entry's column owner shard (in B's row
    partition) is within one of its row's shard."""
    live = acols < PADCOL
    cshard = jnp.where(live, acols, 0) // w_b
    rshard = rows_global[:, None] // w_a
    return jnp.all(jnp.where(live, jnp.abs(cshard - rshard), 0) <= 1)


@partial(jax.jit, static_argnames=("relative", "lump", "mesh", "axis"))
def _halo_spgemm_core(A: DELL, B: DELL, dor, tol, relative: bool,
                      lump: bool, mesh=None, axis: str = ROW_AXIS):
    """shard_map expand -> sort -> segsum -> drop with two full-block
    neighbour ppermutes of B (inspectable: the lowered HLO contains only
    collective-permute, no all-gather/all-to-all)."""
    S = mesh.devices.size
    w_b = B.data.shape[0] // S
    fwd = [(i, (i + 1) % S) for i in range(S)]
    bwd = [(i, (i - 1) % S) for i in range(S)]

    def body(ad, ac, bd, bc, dor_s):
        s = jax.lax.axis_index(axis)
        w_a_local = ad.shape[0]
        bd_l = jax.lax.ppermute(bd, axis, fwd)
        bd_r = jax.lax.ppermute(bd, axis, bwd)
        bc_l = jax.lax.ppermute(bc, axis, fwd)
        bc_r = jax.lax.ppermute(bc, axis, bwd)
        Kb = bd.shape[1]
        bd1 = jnp.concatenate(
            [bd_l, bd, bd_r, jnp.zeros((1, Kb), bd.dtype)], axis=0)
        bc1 = jnp.concatenate(
            [bc_l, bc, bc_r, jnp.full((1, Kb), PADCOL, bc.dtype)], axis=0)
        alive = ac < PADCOL
        base = (s.astype(jnp.int32) - 1) * w_b
        loc = jnp.where(alive,
                        jnp.clip(ac - base, 0, 3 * w_b - 1), 3 * w_b)
        ccols = bc1[loc].reshape(w_a_local, -1)
        cvals = (jnp.where(alive, ad, 0.0)[:, :, None]
                 * bd1[loc]).reshape(w_a_local, -1)
        ccols, cvals = sort_rows(ccols, cvals)
        ccols, cvals = segsum_rows(ccols, cvals)
        return drop_rows(ccols, cvals, tol, relative, lump,
                         diag_of_row=dor_s)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )(A.data, A.cols, B.data, B.cols, dor)


def spgemm_drop_halo(A: DELL, B: DELL, tol: float, relative: bool,
                     lump: bool, mesh, diag_of_row=None):
    """Fused neighbour-exchange product + drop on row-sharded operands.

    Returns the UNCOMPACTED (cols, vals) like _spgemm_drop_jit (the
    caller compacts with its one scalar readback), or None when the band
    check fails (caller falls back to the GSPMD path)."""
    S = mesh.devices.size
    n_a = A.data.shape[0]
    w_a = n_a // S
    w_b = B.data.shape[0] // S
    rows_global = jnp.arange(n_a, dtype=jnp.int32)
    if not bool(_band_ok(A.cols, rows_global, w_a, w_b)):
        return None
    if diag_of_row is None:
        diag_of_row = rows_global
    return _halo_spgemm_core(A, B, diag_of_row, float(tol),
                             bool(relative), bool(lump), mesh=mesh)


# ~~~~~~~~~~~~~~~~ neighbour-only submatrix extraction ~~~~~~~~~~~~~~~~
#
# extract_dell's row gather (A.cols[row_idx]) under GSPMD reshards the
# whole operator for an arbitrary-index gather.  For banded partitions
# the source rows of each OUTPUT block are a contiguous global window
# (row_idx is sorted) spanning at most the shard's own input block plus
# one neighbour per side, and the referenced columns stay within two
# blocks -- so the exchange is ppermute shifts of the operator (+-1) and
# of the column mask/renumber vectors (+-2): the PetscSF neighbour
# semantics of the reference's distributed MatCreateSubMatrix
# (reference: src/PETSc_Helperk.kokkos.cxx:1801-2403).


@jax.jit
def _extract_band_ok(acols, ridx_pad, w_in: int, w_out: int):
    """f32 flag: every padded output row's source lives within one input
    block of its own shard AND every referenced column within one block
    of its row (=> within two blocks of the output shard)."""
    n_out = ridx_pad.shape[0]
    live_r = ridx_pad < PADCOL
    own_out = jnp.arange(n_out, dtype=jnp.int32) // w_out
    own_src = jnp.where(live_r, ridx_pad, 0) // w_in
    ok_rows = jnp.all(jnp.where(live_r, jnp.abs(own_src - own_out), 0) <= 1)
    n_in = acols.shape[0]
    rows_global = jnp.arange(n_in, dtype=jnp.int32)
    live_c = acols < PADCOL
    cshard = jnp.where(live_c, acols, 0) // w_in
    rshard = rows_global[:, None] // w_in
    ok_cols = jnp.all(jnp.where(live_c, jnp.abs(cshard - rshard), 0) <= 1)
    return (ok_rows & ok_cols).astype(jnp.float32)


@partial(jax.jit, static_argnames=("ensure_diag", "mesh", "axis"))
def _halo_extract_core(A: DELL, ridx_pad, col_mask, col_newidx,
                       ensure_diag: bool, mesh=None, axis: str = ROW_AXIS):
    S = mesh.devices.size
    n_in = A.data.shape[0]
    w_in = n_in // S
    w_out = ridx_pad.shape[0] // S
    fwd = [(i, (i + 1) % S) for i in range(S)]    # receive the LEFT block
    bwd = [(i, (i - 1) % S) for i in range(S)]    # receive the RIGHT block

    def body(ridx_s, ad, ac, cm, cn):
        s = jax.lax.axis_index(axis)
        K = ad.shape[1]
        ad_l = jax.lax.ppermute(ad, axis, fwd)
        ad_r = jax.lax.ppermute(ad, axis, bwd)
        ac_l = jax.lax.ppermute(ac, axis, fwd)
        ac_r = jax.lax.ppermute(ac, axis, bwd)
        aw_d = jnp.concatenate(
            [ad_l, ad, ad_r, jnp.zeros((1, K), ad.dtype)], axis=0)
        aw_c = jnp.concatenate(
            [ac_l, ac, ac_r, jnp.full((1, K), PADCOL, ac.dtype)], axis=0)
        live_r = ridx_s < PADCOL
        base = (s.astype(jnp.int32) - 1) * w_in
        loc = jnp.where(live_r,
                        jnp.clip(ridx_s - base, 0, 3 * w_in - 1), 3 * w_in)
        cols = aw_c[loc]
        vals = aw_d[loc]

        cm_l = jax.lax.ppermute(cm, axis, fwd)
        cm_r = jax.lax.ppermute(cm, axis, bwd)
        cm_l2 = jax.lax.ppermute(cm_l, axis, fwd)
        cm_r2 = jax.lax.ppermute(cm_r, axis, bwd)
        cn_l = jax.lax.ppermute(cn, axis, fwd)
        cn_r = jax.lax.ppermute(cn, axis, bwd)
        cn_l2 = jax.lax.ppermute(cn_l, axis, fwd)
        cn_r2 = jax.lax.ppermute(cn_r, axis, bwd)
        cw = jnp.concatenate(
            [cm_l2, cm_l, cm, cm_r, cm_r2,
             jnp.zeros((1,), cm.dtype)])
        nw = jnp.concatenate(
            [cn_l2, cn_l, cn, cn_r, cn_r2, jnp.zeros((1,), cn.dtype)])
        base_c = (s.astype(jnp.int32) - 2) * w_in
        live = cols < PADCOL
        cloc = jnp.where(live,
                         jnp.clip(cols - base_c, 0, 5 * w_in - 1),
                         5 * w_in)
        keep = live & (cw[cloc] != 0)
        ncols = jnp.where(keep, nw[cloc].astype(cols.dtype), PADCOL)
        nvals = jnp.where(keep, vals, 0.0)
        if ensure_diag:
            grow = s.astype(jnp.int32) * w_out + jnp.arange(
                w_out, dtype=jnp.int32)
            has = jnp.any(ncols == grow[:, None], axis=1)
            extra_c = jnp.where(has | ~live_r, PADCOL, grow)[:, None]
            ncols = jnp.concatenate([ncols, extra_c], axis=1)
            nvals = jnp.concatenate(
                [nvals, jnp.zeros((w_out, 1), nvals.dtype)], axis=1)
        return ncols, nvals

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis, None), P(axis, None), P(axis), P(axis)),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )(ridx_pad, A.data, A.cols, col_mask.astype(jnp.int32),
      col_newidx.astype(jnp.int32))


def extract_halo(A: DELL, row_idx, col_mask, col_newidx,
                 ensure_diag: bool, mesh):
    """Neighbour-exchange submatrix extraction on a row-sharded operator.

    Returns UNCOMPACTED (cols, vals) of A[row_idx][:, col_mask] with
    columns renumbered (rows in row_idx order), or None when the band
    condition fails or sizes do not divide the mesh (caller falls back
    to the GSPMD gather)."""
    S = mesh.devices.size
    n_in = A.data.shape[0]
    n_new = row_idx.shape[0]
    # the 5-block column window is indexed in units of A's ROW blocks, so
    # the column space must coincide with the row space (square operator);
    # rectangular extractions (e.g. the coarse-compressed RAP's [n_c, n]
    # source) fall back to the GSPMD gather
    if n_in % S or n_new == 0 or col_mask.shape[0] != n_in \
            or col_newidx.shape[0] != n_in or A.n_cols != n_in:
        return None
    w_in = n_in // S
    w_out = -(-n_new // S)
    pad = S * w_out - n_new
    ridx_pad = jnp.pad(row_idx.astype(jnp.int32), (0, pad),
                       constant_values=PADCOL)
    if not bool(_extract_band_ok(A.cols, ridx_pad, w_in, w_out)):
        return None
    ncols, nvals = _halo_extract_core(A, ridx_pad, col_mask, col_newidx,
                                      bool(ensure_diag), mesh=mesh)
    if pad:
        ncols, nvals = ncols[:n_new], nvals[:n_new]
    return ncols, nvals
