"""Full-space (mask-extended) level representation: the TPU solve fast path.

The reference extracts compressed F/C submatrices and gathers/scatters
vectors every smooth (reference: src/FC_Smooth.F90:161 VecISCopy).  On TPU
arbitrary gathers are the single most expensive op, so levels here keep
every operator in the LEVEL's own index space, masked to the F/C blocks:

    A_ff_ext = Mf A Mf,  A_fc_ext = Mf A Mc,  inv_ext = embed(inv(A_ff))

F smoothing then needs NO index movement at all --

    t = mask_f * b - A_fc_ext @ x
    x <- x + inv_ext(t - A_ff_ext @ x)

and restriction/prolongation need one small gather/scatter each
(R_ext = R with rows scattered to coarse positions; P_ext likewise).
This is the TPU analogue of the reference's own accelerator fallback
(multiplying by rectangular identities instead of VecISCopy, reference:
src/AIR_MG_Setup.F90:106-120).  Crucially the masked operators inherit the
ORIGINAL ordering, so on structured problems they stay few-offset banded
and take the DIA (gather-free) SpMV path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..sparse import ELL
from ..sparse.dia import DIA
from ..inverse.build import Inverse


def make_op(M_host: sp.csr_matrix, dtype=None):
    """Device operator: DIA when the offset structure pays; else, on TPU,
    the banded Pallas windowed SpMV when the bandwidth allows (arbitrary
    gathers measure ~50x slower than slices on TPU, docs/tpu.md); else
    gather ELL."""
    if DIA.viable(M_host):
        return DIA.from_scipy(M_host, dtype=dtype)
    import jax

    # the banded kernel computes in f32/bf16: never substitute it for an
    # f64 solve (x64 runs also trip Mosaic's int64/f64 conversion limits)
    want_f64 = (dtype is None and jax.config.jax_enable_x64
                ) or (dtype is not None
                      and np.dtype(dtype) == np.float64)
    if jax.default_backend() == "tpu" and not want_f64:
        from ..sparse.banded import BandedSpMV

        if BandedSpMV.viable(M_host):
            return BandedSpMV.from_scipy(M_host, dtype=dtype or jnp.float32)
    # K-transposed gather layout: the plain [n, K] ELL pads its K-minor
    # dim to 128 lanes on TPU (8-16x device memory and the gather streams
    # the padding -- an OOM at 2048^2); TELL keeps n on lanes
    from ..sparse import TELL

    return TELL.from_scipy(M_host, dtype=dtype)


def _map_rows(M: sp.csr_matrix, row_map: np.ndarray, n_new: int):
    coo = M.tocoo()
    out = sp.csr_matrix(
        (coo.data, (row_map[coo.row], coo.col)), shape=(n_new, M.shape[1])
    )
    out.sort_indices()
    return out


def _map_cols(M: sp.csr_matrix, col_map: np.ndarray, n_new: int):
    coo = M.tocoo()
    out = sp.csr_matrix(
        (coo.data, (coo.row, col_map[coo.col])), shape=(M.shape[0], n_new)
    )
    out.sort_indices()
    return out


def _map_both(M: sp.csr_matrix, row_map, col_map, n: int):
    coo = M.tocoo()
    out = sp.csr_matrix(
        (coo.data, (row_map[coo.row], col_map[coo.col])), shape=(n, n)
    )
    out.sort_indices()
    return out


def inverse_to_fullspace(inv: Inverse, fine: np.ndarray, n: int,
                         A_ff_ext_op, dtype=None) -> Inverse:
    """Re-express a compressed-F-space approximate inverse in the level's
    full index space.  Applied vectors are F-supported throughout, so the
    matrix-free chains work unchanged over the masked operator."""
    if inv.kind == "diagonal":
        d = np.zeros(n)
        host = getattr(inv, "host_diag", None)
        d[fine] = host if host is not None else np.asarray(inv.diag)
        return Inverse("diagonal", diag=jnp.asarray(d, dtype=dtype),
                       meta=inv.meta)
    if inv.kind == "assembled":
        M = inv.host_csr if inv.host_csr is not None else inv.mat.to_scipy()
        M_ext = _map_both(M, fine, fine, n)
        return Inverse("assembled", mat=make_op(M_ext, dtype), meta=inv.meta,
                       host_csr=M_ext, coefficients=inv.coefficients)
    if inv.kind == "dense":
        # the LU inverse is an EXPLICIT dense inv(A_ff): embed it in the
        # full space like any assembled inverse (the matrix-free
        # fallthrough below would swap mat to the A_ff operator itself
        # and apply A_ff instead of its inverse)
        M = sp.csr_matrix(np.asarray(inv.mat, dtype=np.float64))
        M_ext = _map_both(M, fine, fine, n)
        return Inverse("assembled", mat=make_op(M_ext, dtype),
                       meta=inv.meta, host_csr=M_ext)
    # matrix-free kinds: swap the operator; extend the diagonal with ones
    # outside F so the divisions are harmless (inputs are F-supported)
    diag_ext = None
    if inv.diag is not None:
        d = np.ones(n)
        d[fine] = np.asarray(inv.diag)
        diag_ext = jnp.asarray(d, dtype=dtype)
    coeffs = inv.coefficients
    if coeffs is not None and dtype is not None:
        coeffs = coeffs.astype(dtype)
    return Inverse(inv.kind, mat=A_ff_ext_op, coefficients=coeffs,
                   steps=inv.steps, diag=diag_ext, scaled=inv.scaled,
                   meta=inv.meta)


def build_fullspace_level(lvl, opts, dtype=None) -> dict:
    """Device dict for one level in full-space form (see module docstring).

    lvl: a hierarchy LevelData (host matrices in compressed F/C spaces).
    """
    n = lvl.n
    fine = np.asarray(lvl.fine)
    coarse = np.asarray(lvl.coarse)
    # transfer order: the next level may live in a repartitioned (RCM)
    # coarse order (hierarchy.LevelData.coarse_order) -- the basis change
    # costs nothing here because the transfer is already a gather/scatter
    coarse_tx = (np.asarray(lvl.coarse_order)
                 if getattr(lvl, "coarse_order", None) is not None
                 else coarse)
    mask_f = np.zeros(n, dtype=np.dtype(dtype) if dtype is not None else np.float64)
    mask_f[fine] = 1.0

    A_ff_ext = _map_both(lvl.A_ff, fine, fine, n)
    A_fc_ext = _map_both(lvl.A_fc, fine, coarse, n)
    R_ext = _map_rows(lvl.R, coarse, n)
    P_ext = _map_cols(lvl.P, coarse, n)

    A_ff_op = make_op(A_ff_ext, dtype)
    # note: no plain-bool leaves in the dict (they would become tracers);
    # full-space mode is detected by the presence of "mask_f"
    d = {
        "mask_f": jnp.asarray(mask_f),
        "fine": jnp.asarray(fine, dtype=jnp.int32),
        "coarse": jnp.asarray(coarse_tx, dtype=jnp.int32),
        "A_ff": A_ff_op,
        "A_fc": make_op(A_fc_ext, dtype),
        "inv_Aff": inverse_to_fullspace(lvl.inv_Aff, fine, n, A_ff_op,
                                        dtype=dtype),
        "R": make_op(R_ext, dtype),
        "P": make_op(P_ext, dtype),
    }
    if opts.any_c_smooths and lvl.A_cc is not None:
        mask_c = np.zeros(n, dtype=mask_f.dtype)
        mask_c[coarse] = 1.0
        A_cc_ext = _map_both(lvl.A_cc, coarse, coarse, n)
        A_cf_ext = _map_both(lvl.A_cf, coarse, fine, n)
        A_cc_op = make_op(A_cc_ext, dtype)
        d["mask_c"] = jnp.asarray(mask_c)
        d["A_cc"] = A_cc_op
        d["A_cf"] = make_op(A_cf_ext, dtype)
        d["inv_Acc"] = inverse_to_fullspace(lvl.inv_Acc, coarse, n, A_cc_op,
                                            dtype=dtype)
    return d
