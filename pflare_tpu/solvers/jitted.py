"""Fully-jitted device-resident solvers.

The eager Krylov drivers in krylov.py sync a norm to host every iteration --
fine on CPU, latency-bound on a remote TPU.  These variants unroll a fixed
number of iterations inside one jit so the entire solve is a single XLA
program: no host round-trips, no data-dependent shapes.  Residual norms are
returned as a device array; convergence is judged on host afterwards.

This is the TPU-idiomatic shape of the reference's solve phase: AIR is built
so the V-cycle is reduction-free (reference: src/AIR_MG_Setup.F90:1028-1102),
and the outer Krylov loop is the only place norms appear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fgmres_fixed(matvec, precond, b, max_it: int, x0=None):
    """FGMRES(max_it) with no restart, fully traced.

    Returns (x, res_norms[max_it+1]) -- res_norms[k] is the (estimated)
    residual after k iterations; the caller finds the convergence point.
    """
    n = b.shape[0]
    dtype = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x) if x0 is not None else b
    beta = jnp.linalg.norm(r0)
    V = [r0 / jnp.where(beta > 0, beta, 1.0)]
    Z = []
    m = max_it
    H = jnp.zeros((m + 1, m), dtype=dtype)
    norms = [beta]
    for j in range(m):
        z = precond(V[j])
        Z.append(z)
        w = matvec(z)
        for i in range(j + 1):
            hij = jnp.vdot(V[i], w)
            H = H.at[i, j].set(hij)
            w = w - hij * V[i]
        # unconditional second MGS pass: fast-converging preconditioned
        # GMRES cancels most of w within a few iterations and the basis
        # degenerates without reorthogonalization (see krylov._mgs; here
        # the pass is traced, branch-free)
        for i in range(j + 1):
            c = jnp.vdot(V[i], w)
            H = H.at[i, j].add(c)
            w = w - c * V[i]
        hj1 = jnp.linalg.norm(w)
        H = H.at[j + 1, j].set(hj1)
        V.append(w / jnp.where(hj1 > 0, hj1, 1.0))
        # residual norm estimate via small least squares (host-free)
        g = jnp.zeros(j + 2, dtype=dtype).at[0].set(beta)
        Hj = H[: j + 2, : j + 1]
        y, *_ = jnp.linalg.lstsq(Hj, g)
        norms.append(jnp.linalg.norm(g - Hj @ y))
    # final solution from the full subspace
    g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
    y, *_ = jnp.linalg.lstsq(H, g)
    update = jnp.zeros_like(b)
    for i in range(m):
        update = update + y[i] * Z[i]
    x = x + update
    return x, jnp.stack(norms)


def gmres_right_fixed(matvec, precond, b, max_it: int, x0=None):
    """Right-preconditioned GMRES, fixed iterations, fully traced."""
    # with a fixed preconditioner right-GMRES == FGMRES
    return fgmres_fixed(matvec, precond, b, max_it, x0=x0)


def gmres_stationary(matvec, precond, b, x0, rtol, atol, max_it: int,
                     restart: int, side: str = "left"):
    """Fully-jitted restarted GMRES with a STATIONARY preconditioner.

    The whole solve -- restart cycles, Arnoldi, incremental Givens,
    convergence test -- is ONE traced program: ``lax.while_loop`` over
    cycles, an inner ``while_loop`` over Arnoldi steps with early exit on
    the rotated-residual estimate, blocked two-pass Gram-Schmidt (the
    dots ride the MXU as [m+1,n]x[n] products; the second pass is the
    reorthogonalization that keeps fast-converging bases orthogonal).
    The eager driver in krylov.py syncs a norm to host EVERY iteration
    (~10 ms each on a remote TPU); here the host reads back exactly once
    at the end.  Semantics follow krylov.gmres/PETSc: left
    preconditioning monitors the preconditioned residual, right the true
    residual; rtol is relative to the (preconditioned) RHS norm, with
    the zero-RHS fallback to ||r0||.

    Returns (x, total_it, hist, converged): hist[k] is the residual
    estimate after k iterations (entries beyond total_it hold 0).
    """
    m = restart
    dtype = b.dtype

    def op(v):
        return precond(matvec(v)) if side == "left" else matvec(precond(v))

    def resid(x):
        r = b - matvec(x)
        return precond(r) if side == "left" else r

    b_eff = precond(b) if side == "left" else b
    rhs_norm = jnp.linalg.norm(b_eff)
    x = jnp.zeros_like(b) if x0 is None else x0
    r0 = resid(x)
    r0n = jnp.linalg.norm(r0)
    rhs_norm = jnp.where(rhs_norm > 0, rhs_norm,
                         jnp.where(r0n > 0, r0n, 1.0))
    tol = jnp.maximum(rtol * rhs_norm, atol)
    hist = jnp.zeros(max_it + 1, dtype).at[0].set(r0n)

    n = b.shape[0]

    def cycle(state):
        x, tot, hist, _ = state
        r = resid(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(
            r / jnp.where(beta > 0, beta, 1.0))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def inner_cond(c):
            j, V, H, cs, sn, g, hist, res = c
            return (j < m) & (tot + j < max_it) & (res > tol)

        def inner_body(c):
            j, V, H, cs, sn, g, hist, res = c
            w = op(V[j])
            # blocked 2-pass MGS: rows of V beyond j are exact zeros, so
            # the full-matrix products orthogonalise against V[0..j] only
            h1 = V @ w
            w = w - h1 @ V
            h2 = V @ w
            w = w - h2 @ V
            hcol = h1 + h2
            hj1 = jnp.linalg.norm(w)
            V2 = V.at[j + 1].set(w / jnp.where(hj1 > 0, hj1, 1.0))
            hcol = hcol.at[j + 1].set(hj1)

            # previously stored Givens rotations, masked beyond j
            def rot(i, hc):
                hi, hi1 = hc[i], hc[i + 1]
                t = cs[i] * hi + sn[i] * hi1
                u = -sn[i] * hi + cs[i] * hi1
                valid = i < j
                return hc.at[i].set(jnp.where(valid, t, hi)) \
                         .at[i + 1].set(jnp.where(valid, u, hi1))

            hcol = jax.lax.fori_loop(0, m, rot, hcol)
            a, bb = hcol[j], hcol[j + 1]
            rho = jnp.hypot(a, bb)
            live = rho > 0
            c_new = jnp.where(live, a / jnp.where(live, rho, 1.0), 1.0)
            s_new = jnp.where(live, bb / jnp.where(live, rho, 1.0), 0.0)
            cs2 = cs.at[j].set(c_new)
            sn2 = sn.at[j].set(s_new)
            hcol = hcol.at[j].set(c_new * a + s_new * bb) \
                       .at[j + 1].set(0.0)
            H2 = H.at[:, j].set(hcol[: m + 1])
            gj = g[j]
            g2 = g.at[j + 1].set(jnp.where(live, -s_new * gj, g[j + 1]))
            g2 = g2.at[j].set(jnp.where(live, c_new * gj, gj))
            res_new = jnp.where(live, jnp.abs(g2[j + 1]), jnp.abs(gj))
            hist2 = hist.at[tot + j + 1].set(res_new)
            return (j + 1, V2, H2, cs2, sn2, g2, hist2, res_new)

        jm, V, H, cs, sn, g, hist, res = jax.lax.while_loop(
            inner_cond, inner_body,
            (jnp.int32(0), V, H, cs, sn, g, hist, beta))

        # back-substitute; unused columns are all-zero -> patch their
        # diagonal to 1 (their g entries are 0, so y there is 0)
        used = jnp.arange(m) < jm
        Hs = H[:m, :m]
        # unused columns are all-zero; an exact-breakdown column has a
        # zero pivot too -- patch both diagonals to 1 and zero their g
        # entry so y there is 0
        alive = used & (jnp.abs(jnp.diagonal(Hs)) > 0)
        dfix = jnp.where(alive, jnp.diagonal(Hs), 1.0)
        Hs = Hs + jnp.diag(dfix - jnp.diagonal(Hs))
        from jax.scipy.linalg import solve_triangular

        y = solve_triangular(Hs, jnp.where(alive, g[:m], 0.0), lower=False)
        update = y @ V[:m]
        if side == "right":
            update = precond(update)
        x = x + update
        tot = tot + jm
        r = resid(x)
        rn = jnp.linalg.norm(r)
        hist = hist.at[tot].set(rn)
        return (x, tot, hist, rn <= tol)

    def outer_cond(state):
        _, tot, _, done = state
        return (~done) & (tot < max_it)

    x, tot, hist, done = jax.lax.while_loop(
        outer_cond, cycle, (x, jnp.int32(0), hist, r0n <= tol))
    return x, tot, hist, done


def richardson_fixed(matvec, precond, b, max_it: int, x0=None):
    """Fixed-iteration preconditioned Richardson, fully traced, with
    unpreconditioned residual norms."""
    x = jnp.zeros_like(b) if x0 is None else x0
    norms = []

    def body(carry, _):
        x, r = carry
        x = x + precond(r)
        r = b - matvec(x)
        return (x, r), jnp.linalg.norm(r)

    r = b - matvec(x)
    n0 = jnp.linalg.norm(r)
    (x, r), ns = jax.lax.scan(body, (x, r), None, length=max_it)
    return x, jnp.concatenate([n0[None], ns])
