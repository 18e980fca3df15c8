"""GMRES polynomial coefficients (power & Arnoldi bases) + appliers.

TPU-native re-design of the reference's GMRES-polynomial machinery
(reference: src/Gmres_Poly.F90).  The Krylov basis is built with device
matvecs; the tiny dense factorisations (QR of the tall-skinny power basis,
Hessenberg least-squares) run on host in float64 -- they are O(order^2)
scalars, exactly the work the reference does in LAPACK.

The power basis is the comms-avoiding path: build K_{m+1} with m matvecs and
a single QR reduction (the reference's TSQR, reference:
src/Gmres_Poly.F90:552-776 and src/TSQR.F90).  On a device mesh the QR of the
row-sharded K maps to local QR + psum of R factors; on one chip it is a plain
reduced QR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..params import tolerances


def box_muller(n: int, dtype=jnp.float64, seed: int = 17, xp=jnp):
    """Normal random RHS via Box-Muller, deterministic seed (reference:
    src/Gmres_Poly.F90:139-209: N(0,1) preserves white noise in the
    eigenspace)."""
    rng = np.random.default_rng(seed)
    u1 = rng.random(n)
    u2 = rng.random(n)
    z = np.sqrt(-2.0 * np.log1p(-u1)) * np.cos(2.0 * np.pi * u2)
    if xp is np:
        # follow the matrix precision: an f64 start vector against an f32
        # matrix makes scipy upcast the matrix DATA on every matvec
        return z.astype(np.float64 if dtype is None else np.dtype(dtype))
    return jnp.asarray(z, dtype=dtype)


def arnoldi_host(matvec, n, poly_order, dtype, lucky_tol, compute_cn=False,
                 rel_tol=None, seed: int = 17, xp=jnp):
    """Plain Arnoldi storing the unrotated H (and optionally C_n with
    V_n = K_n C_n) -- reference: src/Gmres_Poly.F90:308-456.

    ``xp=np`` runs fully on host (matvec should then be scipy) -- the
    setup-phase path, avoiding per-shape XLA compiles; ``xp=jnp`` keeps the
    basis on device (the sharded path: the dots become psums).

    Returns (beta, H, m, C, y): H is (order+2, order+1) numpy; m is the
    numerically reached order; C maps Krylov to Arnoldi coordinates; y the
    LS solution when rel_tol is active.
    """
    subspace = poly_order + 1
    r0 = box_muller(n, dtype, seed, xp=xp)
    beta = float(xp.linalg.norm(r0))
    # host path: preallocated basis, each Vstack below is a VIEW (the
    # list+stack form re-copied the whole basis every step -- O(m^2 n))
    prealloc = xp is np
    if prealloc:
        # basis in the MATRIX precision (bandwidth: the matvecs and MGS
        # dots dominate); the Hessenberg/LS stay float64 below
        V = np.empty((subspace + 1, n), dtype=r0.dtype)
        V[0] = r0 / beta
    else:
        V = [r0 / beta]
    H = np.zeros((subspace + 1, subspace))
    C = np.zeros((subspace + 1, subspace + 1)) if compute_cn else None
    if compute_cn:
        C[0, 0] = 1.0 / beta
    y = np.zeros(subspace)
    m = 0
    for j in range(subspace):
        w = matvec(V[j])
        if compute_cn:
            c_j = np.zeros(subspace + 1)
            c_j[1 : j + 2] = C[: j + 1, j]
        # all Hessenberg entries in one batched dot (one reduction)
        Vstack = V[: j + 1] if prealloc else xp.stack(V[: j + 1])
        h = np.asarray(Vstack @ w)
        H[: j + 1, j] = h
        w = w - xp.tensordot(xp.asarray(h).astype(w.dtype), Vstack, axes=1)
        if compute_cn:
            for i in range(j + 1):
                c_j[: i + 1] -= C[: i + 1, i] * H[i, j]
        hj1 = float(xp.linalg.norm(w))
        H[j + 1, j] = hj1
        m = j + 1
        if hj1 < lucky_tol:
            if rel_tol is not None:
                y = _ls_solve_arnoldi(beta, m, H)
            break
        if prealloc:
            V[j + 1] = w / hj1
        else:
            V.append(w / hj1)
        if compute_cn:
            C[: j + 2, j + 1] = c_j[: j + 2] / hj1
        if rel_tol is not None:
            y = _ls_solve_arnoldi(beta, m, H)
            res = np.linalg.norm(H[: m + 1, :m] @ y[:m] - beta * np.eye(m + 1)[:, 0])
            if res / beta < rel_tol:
                break
    return beta, H, m, C, y


def _ls_solve_arnoldi(beta, m, H):
    g0 = np.zeros(m + 1)
    g0[0] = beta
    y_m, *_ = np.linalg.lstsq(H[: m + 1, :m], g0, rcond=None)
    y = np.zeros(H.shape[1])
    y[:m] = y_m
    return y


def arnoldi_fixed_device(op, r0, subspace, diag=None):
    """Whole-Arnoldi as ONE fixed-shape jitted program (device setup path).

    The host loop (arnoldi_host with xp=jnp) dispatches per-step ops whose
    shapes GROW with j -- O(m^2) distinct XLA programs per matrix size.
    Here V is a preallocated [subspace+1, n] basis and each step is a
    masked fixed-shape MGS update inside a lax.scan, so the whole
    iteration compiles ONCE per (n, subspace).  Lucky breakdown is
    handled by zero-scaling, which reproduces H[j+1,j] ~ 0 for the
    host-side coefficient solves.

    ``op``: pytree operator with .matvec (passed as a jit ARGUMENT, not a
    closure constant); ``diag``: optional right diagonal scaling.

    Returns (beta, H) as host floats/arrays (one small d2h).
    """
    beta, H = _arnoldi_fixed_jit(op, diag, r0, subspace,
                                 diag is not None)
    # ONE d2h round-trip: beta rides as an extra row of H (scalar
    # readbacks cost a full tunnel RTT each on remote-attached TPUs)
    packed = np.asarray(_pack_beta_h(beta, H), dtype=np.float64)
    return float(packed[0, 0]), packed[1:]


@jax.jit
def _pack_beta_h(beta, H):
    row = jnp.zeros((1, H.shape[1]), dtype=H.dtype).at[0, 0].set(beta)
    return jnp.concatenate([row, H], axis=0)


from functools import partial


@partial(jax.jit, static_argnames=("subspace", "diag_scale"))
def _arnoldi_fixed_core(op, diag, r0, subspace: int, diag_scale: bool):
    n = r0.shape[0]

    def mv(v):
        w = op.matvec(v)
        return w / diag if diag_scale else w

    beta = jnp.linalg.norm(r0)
    V = jnp.zeros((subspace + 1, n), dtype=r0.dtype)
    V = V.at[0].set(r0 / beta)
    H = jnp.zeros((subspace + 1, subspace), dtype=r0.dtype)
    rows = jnp.arange(subspace + 1)

    def step(carry, j):
        V, H = carry
        w = mv(V[j])
        h = V @ w                       # [subspace+1]; rows > j are zero
        h = jnp.where(rows <= j, h, 0.0)
        w = w - h @ V
        hj1 = jnp.linalg.norm(w)
        H = jax.lax.dynamic_update_slice(H, h[:, None], (0, j))
        H = H.at[j + 1, j].set(hj1)
        scale = jnp.where(hj1 > 0, 1.0 / jnp.where(hj1 > 0, hj1, 1.0), 0.0)
        V = V.at[j + 1].set(w * scale)
        return (V, H), None

    (V, H), _ = jax.lax.scan(step, (V, H), jnp.arange(subspace))
    return beta, H


def _arnoldi_fixed_jit(op, diag, r0, subspace, diag_scale):
    return _arnoldi_fixed_core(op, diag, r0, subspace=subspace,
                               diag_scale=diag_scale)


def reached_order(H, subspace, lucky_tol) -> int:
    """Numerically reached Arnoldi order: first j with H[j+1,j] below the
    lucky-breakdown tolerance (else the full subspace)."""
    for j in range(subspace):
        if H[j + 1, j] < lucky_tol:
            return j + 1
    return subspace


def cn_from_h(beta, H, subspace) -> np.ndarray:
    """Reconstruct the Krylov->Arnoldi map C_n (V_n = K_n C_n) from the
    Hessenberg alone -- the incremental recurrence of arnoldi_host
    replayed on host (tiny, O(m^3) scalars)."""
    C = np.zeros((subspace + 1, subspace + 1))
    C[0, 0] = 1.0 / beta
    for j in range(subspace):
        hj1 = H[j + 1, j]
        if hj1 == 0.0:
            break
        c_j = np.zeros(subspace + 1)
        c_j[1 : j + 2] = C[: j + 1, j]
        for i in range(j + 1):
            c_j[: i + 1] -= C[: i + 1, i] * H[i, j]
        C[: j + 2, j + 1] = c_j[: j + 2] / hj1
    return C


def coefficients_arnoldi_from_h(beta, H, poly_order, dtype=jnp.float64
                                ) -> np.ndarray:
    """Arnoldi-basis coefficients from a precomputed (beta, H) -- the
    device-Arnoldi companion of coefficients_arnoldi, replaying its
    early-stop least-squares schedule on host."""
    tol = tolerances(dtype)
    subspace = poly_order + 1
    C = cn_from_h(beta, H, subspace)
    y = np.zeros(subspace)
    m = 0
    for j in range(subspace):
        m = j + 1
        y = _ls_solve_arnoldi(beta, m, H)
        if H[j + 1, j] < tol.lucky:
            break
        res = np.linalg.norm(H[: m + 1, :m] @ y[:m]
                             - beta * np.eye(m + 1)[:, 0])
        if res / beta < tol.arnoldi:
            break
    coeffs = np.zeros(poly_order + 1)
    coeffs[:] = (C[: poly_order + 1, : poly_order + 1]
                 @ y[: poly_order + 1])[: poly_order + 1]
    return coeffs


def coefficients_arnoldi(matvec, n, poly_order, dtype=jnp.float64,
                         seed: int = 17, xp=jnp) -> np.ndarray:
    """Arnoldi-basis polynomial coefficients per Nachtigal et al. 1992
    (reference: src/Gmres_Poly.F90:460-548): coeffs = C_n[1:m,1:m] @ y."""
    tol = tolerances(dtype)
    beta, H, m, C, y = arnoldi_host(
        matvec, n, poly_order, dtype, tol.lucky, compute_cn=True,
        rel_tol=tol.arnoldi, seed=seed, xp=xp,
    )
    coeffs = np.zeros(poly_order + 1)
    coeffs[:] = (C[: poly_order + 1, : poly_order + 1] @ y[: poly_order + 1])[
        : poly_order + 1
    ]
    return coeffs


def coefficients_power_start(matvec, n, poly_order, dtype=jnp.float64,
                             seed: int = 17, qr_reduce=None, xp=jnp):
    """START the comms-avoiding power-basis computation: build
    K_{m+1} = [b, Ab, ..., A^m b] and ISSUE the QR reduction, returning
    the (possibly still in-flight) R factor -- the analogue of the
    reference's non-blocking TSQR start (reference:
    src/Approx_Inverse_Setup.F90:207, src/TSQR.F90:65: the reduction is
    posted before submatrix extraction and finished after).  With a
    ``qr_reduce`` (the distributed butterfly TSQR) the returned R is an
    un-synchronised device value: jax's async dispatch keeps the
    collective in flight while the caller does host-side work."""
    subspace = poly_order + 1
    b = box_muller(n, dtype, seed, xp=xp)
    cols = [b]
    for _ in range(subspace):
        cols.append(matvec(cols[-1]))
    K = xp.stack(cols, axis=1)  # [n, subspace+1]
    if qr_reduce is None:
        R = np.linalg.qr(np.asarray(K, dtype=np.float64), mode="r")
    else:
        R = qr_reduce(K)
    return R, subspace


def coefficients_power_finish(pending, dtype=jnp.float64) -> np.ndarray:
    """FINISH a started power-basis computation: synchronise R (the only
    blocking point) and solve min || beta e1 - R[:,1:] g || with a
    rank-revealing lstsq (the power basis may be rank deficient;
    reference: src/Gmres_Poly.F90:552-776)."""
    R, subspace = pending
    R = np.asarray(R, dtype=np.float64)
    # R has min(n, subspace+1) rows: tiny matrices (order clamped to n-1)
    # give a wide K whose R is n x (subspace+1)
    g0 = np.zeros(R.shape[0])
    g0[0] = R[0, 0]
    tol = tolerances(dtype)
    g, *_ = np.linalg.lstsq(R[:, 1:], g0, rcond=tol.rcond)
    out = np.zeros(subspace)
    out[: len(g)] = g[:subspace]
    return out


def coefficients_power(matvec, n, poly_order, dtype=jnp.float64,
                       seed: int = 17, qr_reduce=None, xp=jnp) -> np.ndarray:
    """Power-basis coefficients with a single QR reduction (reference:
    src/Gmres_Poly.F90:552-776) -- the blocking start+finish pair."""
    pending = coefficients_power_start(matvec, n, poly_order, dtype,
                                       seed=seed, qr_reduce=qr_reduce,
                                       xp=xp)
    return coefficients_power_finish(pending, dtype)


# ~~~~~~~~~~~~~~~~~~~~~~ appliers ~~~~~~~~~~~~~~~~~~~~~~

def horner(matvec, coefficients, x):
    """y = (c0 + c1 A + c2 A^2 + ...) x via Horner (reference:
    src/Gmres_Poly.F90:1418-1484).  ``coefficients`` is a static-length
    device array; jit-friendly.  (Chained matvecs are protected from the
    XLA:CPU fusion-recompute blowup inside the matvec implementations
    themselves -- see utils/fusion.pin_cpu.)"""
    order = coefficients.shape[0] - 1
    y = coefficients[order] * x
    for k in range(order - 1, -1, -1):
        y = matvec(y) + coefficients[k] * x
    return y


def trim_high_order_zeros(coeffs: np.ndarray) -> np.ndarray:
    """Drop exactly-zero high-order coefficients (early Arnoldi termination)
    so the matrix-free applier skips their matvecs (reference:
    src/Gmres_Poly.F90:90-135)."""
    nz = np.nonzero(coeffs)[0]
    if len(nz) == 0:
        return coeffs[:1]
    return coeffs[: nz[-1] + 1]
