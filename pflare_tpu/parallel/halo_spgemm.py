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
