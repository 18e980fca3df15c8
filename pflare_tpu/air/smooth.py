"""Solve-time smoothing and the multigrid cycle (jit-friendly).

Reference: src/FC_Smooth.F90 + the PCMG Kaskade assembly in
src/AIR_MG_Setup.F90:967-1156.  The whole preconditioner application is a
pure function over the hierarchy pytree: restrict the RHS down, polynomial
coarse solve, then interpolate + norm-free F/C Richardson smoothing on the
way up.  No reductions anywhere -- every op is a SpMV, gather/scatter or
axpy, so the compiled HLO is one fused ladder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def f_smooth(level, b, x, its: int):
    """x_f <- x_f + inv(A_ff)(b_f - A_fc x_c - A_ff x_f), ``its`` times
    (reference: src/FC_Smooth.F90:499-560).  b/x are full-length."""
    fine = level["fine"]
    coarse = level["coarse"]
    b_f = jnp.take(b, fine)
    x_f = jnp.take(x, fine)
    x_c = jnp.take(x, coarse)
    t = b_f - level["A_fc"].matvec(x_c)
    inv = level["inv_Aff"]
    A_ff = level["A_ff"]
    for _ in range(its):
        r = t - A_ff.matvec(x_f)
        x_f = x_f + inv.apply(r)
    return x.at[fine].set(x_f)


def c_smooth(level, b, x, its: int):
    """Same on C points with A_cc (reference: src/FC_Smooth.F90:572)."""
    fine = level["fine"]
    coarse = level["coarse"]
    b_c = jnp.take(b, coarse)
    x_c = jnp.take(x, coarse)
    x_f = jnp.take(x, fine)
    t = b_c - level["A_cf"].matvec(x_f)
    inv = level["inv_Acc"]
    A_cc = level["A_cc"]
    for _ in range(its):
        r = t - A_cc.matvec(x_c)
        x_c = x_c + inv.apply(r)
    return x.at[coarse].set(x_c)


def f_smooth_full(level, b, x, its: int):
    """Full-space F smoothing: zero vector gathers (see air/fullspace.py)."""
    t = level["mask_f"] * b - level["A_fc"].matvec(x)
    inv = level["inv_Aff"]
    A_ff = level["A_ff"]
    for _ in range(its):
        r = t - A_ff.matvec(x)
        x = x + inv.apply(r)
    return x


def c_smooth_full(level, b, x, its: int):
    t = level["mask_c"] * b - level["A_cf"].matvec(x)
    inv = level["inv_Acc"]
    A_cc = level["A_cc"]
    for _ in range(its):
        r = t - A_cc.matvec(x)
        x = x + inv.apply(r)
    return x


def _order_for_level(smooth_order, i: int):
    """Per-level smoothing order: ``smooth_order`` may be one order tuple
    applied everywhere, or a tuple of per-level tuples whose last entry
    repeats on deeper levels (reference: smooth_order_levels,
    src/AIR_Data_Type.F90:333)."""
    if smooth_order and isinstance(smooth_order[0], tuple):
        return smooth_order[min(i, len(smooth_order) - 1)]
    return smooth_order


def fc_point_richardson(level, b, x, smooth_order):
    """One smoother application: consecutive F/C groups per smooth_order
    (positive = F smooths, negative = C smooths; reference:
    src/FC_Smooth.F90:421-497)."""
    full = "mask_f" in level
    for group in smooth_order:
        if group > 0:
            x = (f_smooth_full if full else f_smooth)(level, b, x, group)
        elif group < 0:
            x = (c_smooth_full if full else c_smooth)(level, b, x, -group)
    return x


def full_smooth(level, b, x, its: int = 1):
    """Full-point Richardson with the whole-matrix inverse
    (full_smoothing_up_and_down mode; reference:
    src/AIR_MG_Setup.F90:1014-1048 uses PCMAT with inv_A_ff = inv(A))."""
    A = level["A"]
    inv = level["inv_Aff"]
    for _ in range(its):
        x = x + inv.apply(b - A.matvec(x))
    return x


def _pad_to(v, n: int):
    """Zero-pad a vector up to static length n (no-op when equal) -- levels
    sharded over an active-shard schedule carry padded row spaces
    (parallel/mesh.py), and pad sizes are static shapes under jit."""
    if v.shape[0] < n:
        return jnp.pad(v, (0, n - v.shape[0]))
    return v


def vcycle_kaskade(levels, coarse_inv, r, smooth_order):
    """AIR preconditioner application M^-1 r (PETSc PC_MG_KASKADE semantics:
    no down smooths; RHS restricted down; smoothing only on the way up with
    nonzero initial guess).  ``levels`` is a list of level dicts (pytree).

    Level row spaces may be PADDED (multi-chip active-shard placement):
    each level's operators declare their padded size through their shapes,
    and inter-level vectors are padded/sliced to match -- all static."""
    bs = [r]
    for lev in levels:
        b = bs[-1]
        if "mask_f" in lev:
            b = _pad_to(b, lev["mask_f"].shape[0])
            bs[-1] = b
            t = lev["R"].matvec(b)
            # R_ext wrote the restricted values at coarse positions
            t = jnp.take(t, lev["coarse"])
        else:
            t = lev["R"].matvec(b)
        bs.append(t)
    x = coarse_inv.apply(bs[-1])
    for i in range(len(levels) - 1, -1, -1):
        lev = levels[i]
        if "mask_f" in lev:
            nc = lev["coarse"].shape[0]
            x_full = jnp.zeros(lev["mask_f"].shape[0],
                               dtype=x.dtype).at[lev["coarse"]].set(x[:nc])
            x = lev["P"].matvec(x_full)
        else:
            x = lev["P"].matvec(x)
        x = fc_point_richardson(lev, bs[i], x,
                                _order_for_level(smooth_order, i))
    if x.shape[0] > r.shape[0]:
        x = x[: r.shape[0]]
    return x


def vcycle_full(levels, coarse_inv, r, pre: int = 0, post: int = 1):
    """V-cycle with full up/down smoothing (full_smoothing_up_and_down;
    down smooths disabled by default matching KASKADE-with-PCMAT)."""
    bs = [r]
    xs = []
    b = r
    for lev in levels:
        x = jnp.zeros_like(b)
        if pre:
            x = full_smooth(lev, b, x, pre)
        resid = b - lev["A"].matvec(x)
        xs.append(x)
        b = lev["R"].matvec(resid)
        bs.append(b)
    x_c = coarse_inv.apply(bs[-1])
    for i in range(len(levels) - 1, -1, -1):
        lev = levels[i]
        x = xs[i] + lev["P"].matvec(x_c)
        x = full_smooth(lev, bs[i], x, post)
        x_c = x
    return x_c
