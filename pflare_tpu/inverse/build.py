"""Approximate-inverse dispatcher.

TPU-native equivalent of the reference's Approx_Inverse_Setup
(reference: src/Approx_Inverse_Setup.F90:33-553): one entry point that
computes coefficients/roots for the requested inverse type and returns an
``Inverse`` pytree whose ``apply`` is jit-friendly (assembled SpMV, Horner
chain, or static Newton program).

Coefficient reuse protocol (reference: src/Approx_Inverse_Setup.F90:52-64):
pass ``coefficients`` to skip the polynomial iteration and rebuild an
identical preconditioner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..params import InverseType, tolerances
from ..sparse import ELL, FixedSparsityPolyPlan, SparsityPattern
from .gmres_poly import (
    coefficients_arnoldi,
    coefficients_power,
    horner,
    trim_high_order_zeros,
)
from .newton import (
    build_newton_program,
    newton_apply,
    newton_residual_apply,
    newton_roots,
)
from .sai import sai_inverse


@jax.tree_util.register_pytree_node_class
class Inverse:
    """An applier for an approximate inverse.

    kind (static): 'assembled' | 'diagonal' | 'poly_mf' | 'newton_mf' |
    'neumann_mf'.  ``scaled`` marks right diagonal scaling
    q(D^-1 A) D^-1 (reference: src/Gmres_Poly.F90:1375-1414).
    """

    def __init__(self, kind, mat=None, coefficients=None, steps=(),
                 diag=None, scaled=False, meta=None, host_csr=None,
                 mat_src=None):
        self.kind = kind
        self._mat = mat
        self.coefficients = coefficients
        self.steps = steps
        self.diag = diag
        self.scaled = scaled
        self.meta = meta or {}
        # host-side scipy copy of the assembled inverse (setup-phase only;
        # avoids device->host transfers when the hierarchy needs it for
        # SpGEMMs).  Not part of the pytree.
        self.host_csr = host_csr
        # host csr to materialise the device operator from, on first use --
        # setup never uploads operators the solve path may not need
        # (Hierarchy.to_device rebuilds full-space ops from host copies)
        self._mat_src = mat_src
        self._mat_dtype = None

    @property
    def mat(self):
        if self._mat is None and self._mat_src is not None:
            from ..sparse import ELL

            self._mat = ELL.from_scipy(self._mat_src, dtype=self._mat_dtype)
            self._mat_src = None
        return self._mat

    @mat.setter
    def mat(self, value):
        self._mat = value

    def tree_flatten(self):
        leaves = (self.mat, self.coefficients, self.diag)
        aux = (self.kind, self.steps, self.scaled, _HashableMeta(self.meta))
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        mat, coefficients, diag = leaves
        kind, steps, scaled, meta = aux
        return cls(kind, mat, coefficients, steps, diag, scaled, meta.d)

    # ~~~~~~~~~~ application ~~~~~~~~~~
    def _matvec(self):
        mv = self.mat.matvec
        if self.scaled:
            diag = self.diag
            return lambda v: mv(v) / diag
        return mv

    def apply(self, x):
        if self.kind == "dense":
            return self.mat @ x
        if self.kind == "assembled":
            return self.mat.matvec(x)
        if self.kind == "diagonal":
            return self.diag * x
        if self.kind == "poly_mf":
            xin = x / self.diag if self.scaled else x
            return horner(self._matvec(), self.coefficients, xin)
        if self.kind == "neumann_mf":
            diag = self.diag
            mv = self.mat.matvec
            shifted = lambda v: v - mv(v) / diag
            return horner(shifted, self.coefficients, x / diag)
        if self.kind == "newton_mf":
            xin = x / self.diag if self.scaled else x
            return newton_apply(self._matvec(), self.steps, xin)
        raise ValueError(self.kind)

    def apply_residual(self, x):
        """pi(A) x -- residual polynomial (Newton mf only; used by
        auto-truncation, reference: src/Gmres_Poly_Newton.F90:966)."""
        if self.kind == "newton_mf":
            xin = x / self.diag if self.scaled else x
            y = newton_residual_apply(self._matvec(), self.steps, xin)
            return y * self.diag if self.scaled else y
        raise ValueError("residual applier only for newton_mf")

    def __call__(self, x):
        return self.apply(x)

    @property
    def num_matvecs(self):
        """Matvecs per application (for stats/cycle complexity)."""
        if self.kind in ("assembled", "diagonal", "dense"):
            return 1
        if self.kind in ("poly_mf", "neumann_mf"):
            return int(self.coefficients.shape[0]) - 1
        if self.kind == "newton_mf":
            return sum(1 if s[0] in ("real",) else 2 if s[0] == "cc" else 1
                       for s in self.steps if s[0] != "real_last")
        return 0


class _HashableMeta:
    def __init__(self, d):
        self.d = d

    def __hash__(self):
        return hash(tuple(sorted(self.d.items())))

    def __eq__(self, other):
        return isinstance(other, _HashableMeta) and self.d == other.d


def _clamp_orders(n_global, poly_order, sparsity_order):
    """reference: src/Gmres_Poly.F90:64-76."""
    if poly_order + 1 > n_global:
        poly_order = max(int(n_global) - 1, 0)
    sparsity_order = min(sparsity_order, max(poly_order, 1))
    return poly_order, sparsity_order


def build_inverse(
    A: ELL,
    inverse_type: InverseType,
    poly_order: int = 6,
    sparsity_order: int = 1,
    matrix_free: bool = False,
    diag_scale: bool = False,
    coefficients=None,
    seed: int = 17,
    qr_reduce=None,
    A_scipy: sp.csr_matrix | None = None,
    poly_plan=None,
) -> Inverse:
    """Compute and build an approximate inverse of A.

    ``A`` is the device matrix; ``A_scipy`` optionally supplies the host copy
    (avoids a device->host transfer during setup).  ``A`` may be None when
    ``A_scipy`` is given: matrix-free appliers then materialise their device
    operator lazily on first use, so a host-driven setup uploads nothing.
    """
    inverse_type = InverseType(inverse_type)
    if A is not None:
        n = A.shape[0]
        dtype = A.dtype
    else:
        n = A_scipy.shape[0]
        dtype = A_scipy.data.dtype
    # asking jnp for f64 with x64 disabled emits a warning per call; the
    # downcast is intended (device arrays follow the jax x64 setting)
    if np.dtype(dtype) == np.float64 and not jax.config.jax_enable_x64:
        dtype = None
    poly_order, sparsity_order = _clamp_orders(n, poly_order, sparsity_order)
    tol = tolerances(dtype)

    # ~~~~~~~~~~ LU: exact dense inverse (coarse grids) ~~~~~~~~~~
    if inverse_type == InverseType.LU:
        import scipy.linalg as sla

        A_host = A_scipy if A_scipy is not None else A.to_scipy()
        Minv = sla.inv(A_host.toarray())
        inv = Inverse("dense", mat=jnp.asarray(Minv, dtype=dtype),
                      meta={"type": int(inverse_type)})
        inv.host_csr = sp.csr_matrix(Minv)
        return inv

    # ~~~~~~~~~~ Jacobi family: assembled diagonal ~~~~~~~~~~
    if inverse_type in (InverseType.JACOBI, InverseType.WJACOBI):
        if A_scipy is not None:
            d_np = np.asarray(A_scipy.diagonal())
            if inverse_type == InverseType.WJACOBI:
                # hypre weight 3/(4 ||D^-1/2 A D^-1/2||_inf)
                # (reference: src/Weighted_Jacobi.F90:44-66)
                inv_ds = np.where(np.abs(d_np) > 0,
                                  1.0 / np.sqrt(np.abs(d_np)), 0.0)
                Dm = sp.diags(inv_ds)
                norm_inf = float(np.abs(Dm @ A_scipy @ Dm).sum(axis=1).max())
                weight = 3.0 / (4.0 * norm_inf)
            else:
                weight = 1.0
            inv_diag = jnp.asarray(
                np.where(d_np != 0, weight / d_np, 0.0), dtype=dtype)
            return Inverse("diagonal", diag=inv_diag,
                           meta={"type": int(inverse_type)})
        diag = A.diagonal()
        if inverse_type == InverseType.WJACOBI:
            dsqrt = jnp.sqrt(jnp.abs(diag))
            inv_ds = jnp.where(dsqrt > 0, 1.0 / dsqrt, 0.0)
            scaled_rows = jnp.abs(A.data * inv_ds[:, None] *
                                  jnp.take(inv_ds, A.cols, axis=0))
            norm_inf = float(jnp.max(jnp.sum(scaled_rows, axis=1)))
            weight = 3.0 / (4.0 * norm_inf)
        else:
            weight = 1.0
        inv_diag = jnp.where(diag != 0, weight / diag, 0.0)
        return Inverse("diagonal", diag=inv_diag,
                       meta={"type": int(inverse_type)})

    # ~~~~~~~~~~ SAI / ISAI: assembled least-squares inverse ~~~~~~~~~~
    if inverse_type in (InverseType.SAI, InverseType.ISAI):
        A_host = A_scipy if A_scipy is not None else A.to_scipy()
        # PATTERN powers (value products would let exact cancellations
        # prune entries, making the inverse's sparsity value-dependent
        # and re-setup-unstable)
        S1 = _pattern_ones(A_host)
        S = S1
        for _ in range(sparsity_order - 1):
            S = sp.csr_matrix(S @ S1)
            S.data[:] = 1.0
        M = sai_inverse(A_host, incomplete=(inverse_type == InverseType.ISAI),
                        sparsity=S)
        return Inverse("assembled", meta={"type": int(inverse_type)},
                       host_csr=M, mat_src=M)

    # ~~~~~~~~~~ Neumann ~~~~~~~~~~
    if inverse_type == InverseType.NEUMANN:
        diag = (jnp.asarray(A_scipy.diagonal(), dtype=dtype)
                if A_scipy is not None else A.diagonal())
        ones = jnp.ones(poly_order + 1, dtype=dtype)
        if matrix_free:
            return Inverse("neumann_mf", mat=A, coefficients=ones, diag=diag,
                           meta={"type": int(inverse_type)},
                           mat_src=A_scipy if A is None else None)
        # assembled: p(N)|_S . D^-1 with N = I - D^-1 A
        # (reference: src/Neumann_Poly.F90:177-212)
        A_host = A_scipy if A_scipy is not None else A.to_scipy()
        d = np.asarray(diag)
        N = (sp.eye(n, format="csr", dtype=A_host.data.dtype)
             - sp.diags(1.0 / d) @ A_host)
        N = sp.csr_matrix(N)
        N.sort_indices()
        from ..sparse.pattern import SparsityPattern as _SP
        pat_N = _SP(N.indptr, N.indices, N.shape)
        plan = FixedSparsityPolyPlan(pat_N, poly_order, sparsity_order)
        M_host = plan.execute_host(N, np.ones(poly_order + 1))
        M_host = sp.csr_matrix(M_host @ sp.diags(1.0 / d))
        return Inverse("assembled", meta={"type": int(inverse_type)},
                       host_csr=M_host, mat_src=M_host)

    # ~~~~~~~~~~ GMRES polynomial family ~~~~~~~~~~
    # Coefficient iteration runs on host (scipy matvecs, zero XLA compiles)
    # whenever the host matrix is available; on a sharded device matrix the
    # jnp path is used and the reductions ride the mesh.
    use_host = A_scipy is not None
    if use_host:
        xp = np
        d_np = np.asarray(A_scipy.diagonal()) if diag_scale else None
        diag = jnp.asarray(d_np, dtype=dtype) if diag_scale else None
        if diag_scale:
            matvec = lambda v: (A_scipy @ v) / d_np
        else:
            matvec = lambda v: A_scipy @ v
    else:
        xp = jnp
        diag = A.diagonal() if diag_scale else None
        if diag_scale:
            matvec = lambda v: A.matvec(v) / diag
        else:
            matvec = A.matvec

    if inverse_type in (InverseType.NEWTON, InverseType.NEWTON_NO_EXTRA):
        if coefficients is not None:
            wr, wi = np.asarray(coefficients[0]), np.asarray(coefficients[1])
        else:
            wr, wi = newton_roots(
                matvec, n, poly_order, dtype,
                add_roots=(inverse_type == InverseType.NEWTON), seed=seed,
                xp=xp,
            )
        steps = build_newton_program(wr, wi, tol.zero)
        if matrix_free:
            return Inverse("newton_mf", mat=A, steps=steps, diag=diag,
                           scaled=diag_scale,
                           meta={"type": int(inverse_type)},
                           coefficients=jnp.asarray(
                               np.stack([wr, wi]), dtype=dtype),
                           mat_src=A_scipy if A is None else None)
        # Assembled Newton: accumulate the factored polynomial directly in
        # the Newton basis with every product restricted to the fixed
        # sparsity (stable at high order, unlike monomial expansion;
        # reference: src/Gmres_Poly_Newtonk.kokkos.cxx:15)
        A_host = A_scipy if A_scipy is not None else A.to_scipy()
        if diag_scale:
            d_np = np.asarray(diag)
            A_use = sp.csr_matrix(sp.diags(1.0 / d_np) @ A_host)
            A_use.sort_indices()
        else:
            A_use = A_host
        M_host = _newton_fixed_sparsity_host(A_use, wr, wi, sparsity_order,
                                             poly_order, tol.zero)
        if diag_scale:
            M_host = sp.csr_matrix(M_host @ sp.diags(1.0 / d_np))
        inv = Inverse("assembled", meta={"type": int(inverse_type)},
                      host_csr=M_host, mat_src=M_host,
                      coefficients=jnp.asarray(np.stack([wr, wi]),
                                               dtype=dtype))
        return inv

    # power / arnoldi
    if coefficients is not None:
        coeffs = np.asarray(coefficients, dtype=np.float64)
    elif inverse_type == InverseType.POWER:
        coeffs = coefficients_power(matvec, n, poly_order, dtype, seed=seed,
                                    qr_reduce=qr_reduce, xp=xp)
    elif inverse_type == InverseType.ARNOLDI:
        coeffs = coefficients_arnoldi(matvec, n, poly_order, dtype, seed=seed,
                                      xp=xp)
    else:
        raise ValueError(f"unknown inverse type {inverse_type}")

    if matrix_free:
        cj = jnp.asarray(trim_high_order_zeros(coeffs), dtype=dtype)
        return Inverse("poly_mf", mat=A, coefficients=cj, diag=diag,
                       scaled=diag_scale, meta={"type": int(inverse_type)},
                       mat_src=A_scipy if A is None else None)
    return _assemble_poly(A, coeffs, sparsity_order, dtype, diag_scale, diag,
                          A_scipy, int(inverse_type), poly_plan=poly_plan)


def _poly_sparsity(A: sp.csr_matrix, sparsity_order, poly_order):
    """(s_indptr, s_indices) of S = union(I, A, ..., A^sparsity_order)
    (reference: the fixed sparsity of mat_mult_powers_share_sparsity,
    src/Gmres_Poly.F90:777-920).  Fast path: sparsity_order 1 with a full
    structural diagonal means S is exactly A's pattern -- no work."""
    so = max(1, min(sparsity_order, poly_order))
    if so == 1:
        n = A.shape[0]
        rows = np.repeat(np.arange(n), np.diff(A.indptr))
        has = np.zeros(n, dtype=bool)
        has[rows[A.indices == rows]] = True
        if has.all():
            return A.indptr, A.indices
        missing = np.nonzero(~has)[0]
        eye = sp.csr_matrix(
            (np.ones(len(missing)), (missing, missing)), shape=A.shape)
        S = sp.csr_matrix(_pattern_ones(A) + eye)
        S.sort_indices()
        return S.indptr, S.indices
    S = _pattern_ones(A)
    power = S
    for _ in range(so - 1):
        power = (power @ S).tocsr()
        S = (S + power).tocsr()
    eye = sp.eye(A.shape[0], format="csr")
    S = sp.csr_matrix(S + eye)
    S.sort_indices()
    return S.indptr, S.indices


def _pattern_ones(A: sp.csr_matrix) -> sp.csr_matrix:
    out = sp.csr_matrix(
        (np.ones(A.nnz), A.indices, A.indptr), shape=A.shape)
    out.has_sorted_indices = A.has_sorted_indices
    return out


def _newton_fixed_sparsity_host(A: sp.csr_matrix, wr, wi, sparsity_order,
                                poly_order, tol_zero) -> sp.csr_matrix:
    from ..native import newton_on_sparsity_native

    s_indptr, s_indices = _poly_sparsity(A, sparsity_order, poly_order)
    data = newton_on_sparsity_native(A, s_indptr, s_indices, wr, wi,
                                     tol_zero)
    if data is not None:
        M = sp.csr_matrix((data, s_indices.copy(), s_indptr.copy()),
                          shape=A.shape)
        M.has_sorted_indices = True
        return M
    return _newton_fixed_sparsity_scipy(A, wr, wi, sparsity_order,
                                        poly_order, tol_zero)


def _newton_fixed_sparsity_scipy(A: sp.csr_matrix, wr, wi, sparsity_order,
                                 poly_order, tol_zero) -> sp.csr_matrix:
    """Assembled Newton-basis inverse with fixed sparsity.

    Accumulates M = sum_i T_i / theta_i where T_i is the running product of
    (I - A/theta_j) factors, every product restricted onto
    S = union(diag, A, ..., A^sparsity_order) -- the Newton-basis analogue
    of mat_mult_powers_share_sparsity (complex-conjugate pairs combined in
    real arithmetic as in the matrix-free applier, Loe 2021 Alg. 3)."""
    n = A.shape[0]
    so = max(1, min(sparsity_order, poly_order))
    si, sx = _poly_sparsity(A, so, poly_order)   # union(I, A, ..., A^so)
    S_mask = sp.csr_matrix(
        (np.ones(len(sx), dtype=np.float64), sx, si), shape=A.shape)

    def restrict(X):
        return sp.csr_matrix(X.multiply(S_mask))

    eye = sp.csr_matrix((np.ones(n), (np.arange(n), np.arange(n))),
                        shape=A.shape)
    T = eye.copy()
    M = sp.csr_matrix(A.shape)
    k = len(wr)
    i = 0
    while i <= k - 2:
        if wi[i] == 0.0:
            if abs(wr[i]) < tol_zero:
                i += 1
                continue
            M = M + T / wr[i]
            T = restrict(T - restrict(T @ A) / wr[i])
            i += 1
        else:
            s = wr[i] ** 2 + wi[i] ** 2
            if s < tol_zero:
                i += 2
                continue
            TA = restrict(T @ A)
            T2 = 2.0 * wr[i] * T - TA
            M = M + T2 / s
            if i <= k - 3:
                T = restrict(T - restrict(T2 @ A) / s)
            i += 2
    if k >= 1 and wi[k - 1] == 0.0 and abs(wr[k - 1]) > tol_zero:
        M = M + T / wr[k - 1]
    M = sp.csr_matrix(M)
    M.sort_indices()
    return M


def _newton_monomial_coefficients(wr, wi, tol_zero):
    """p(z) = sum_i prod_{j<i}(1 - z/theta_j) / theta_i expanded in
    monomials (complex arithmetic, real result)."""
    thetas = []
    for a, b in zip(wr, wi):
        if (b == 0 and abs(a) < tol_zero) or (b != 0 and a * a + b * b < tol_zero):
            continue
        thetas.append(complex(a, b))
    if not thetas:
        return np.zeros(1)
    order = len(thetas)
    poly = np.zeros(order + 1, dtype=complex)  # ascending monomial coeffs
    prod = np.zeros(order + 1, dtype=complex)
    prod[0] = 1.0
    for i, th in enumerate(thetas):
        poly[: i + 1] += prod[: i + 1] / th
        # prod *= (1 - z/th)
        new = prod.copy()
        new[1 : i + 2] -= prod[: i + 1] / th
        prod = new
    return poly.real


def _assemble_poly(A, coeffs, sparsity_order, dtype, diag_scale, diag,
                   A_scipy, itype, roots=None, poly_plan=None):
    """Assembled polynomial inverse (fixed sparsity, reference:
    src/Gmres_Poly.F90:1522-1813)."""
    n = A.shape[0] if A is not None else A_scipy.shape[0]
    poly_order = len(coeffs) - 1
    meta = {"type": itype}
    A_host = A_scipy if A_scipy is not None else A.to_scipy()
    if diag_scale:
        d_np = np.asarray(diag)
        A_use_host = sp.csr_matrix(sp.diags(1.0 / d_np) @ A_host)
        A_use_host.sort_indices()
    else:
        A_use_host = A_host

    if poly_order == 0:
        inv_diag = jnp.full(n, float(coeffs[0]), dtype=dtype)
        if diag_scale:
            inv_diag = inv_diag / diag
        return Inverse("diagonal", diag=inv_diag, meta=meta,
                       coefficients=jnp.asarray(coeffs, dtype=dtype))

    if (poly_plan is not None
            and poly_plan.pat_A.nnz == A_use_host.nnz
            and poly_plan.order == poly_order):
        # numeric-only re-assembly against the stored plan (reuse path)
        M_host = poly_plan.execute_host(A_use_host, coeffs)
    else:
        M_host = _fixed_sparsity_poly_host(A_use_host, coeffs, sparsity_order)
    if diag_scale:
        M_host = sp.csr_matrix(M_host @ sp.diags(1.0 / np.asarray(diag)))
    inv = Inverse("assembled", meta=meta, host_csr=M_host, mat_src=M_host,
                  coefficients=(jnp.asarray(coeffs, dtype=dtype)
                                if roots is None else
                                jnp.asarray(np.stack(roots), dtype=dtype)))
    return inv


def _fixed_sparsity_poly_host(A: sp.csr_matrix, coeffs, sparsity_order
                              ) -> sp.csr_matrix:
    """Host fixed-sparsity polynomial accumulation: every power restricted
    onto S = union(diag, A, ..., A^sparsity_order) (reference:
    mat_mult_powers_share_sparsity, src/Gmres_Poly.F90:777-920).  One
    native per-row streaming sweep when available (kernels.cpp
    poly_on_sparsity); scipy SpGEMM + mask fallback otherwise."""
    from ..native import poly_on_sparsity_native

    poly_order = len(coeffs) - 1
    s_indptr, s_indices = _poly_sparsity(A, sparsity_order, poly_order)
    data = poly_on_sparsity_native(A, s_indptr, s_indices, coeffs)
    if data is not None:
        M = sp.csr_matrix((data, s_indices.copy(), s_indptr.copy()),
                          shape=A.shape)
        M.has_sorted_indices = True
        return M
    return _fixed_sparsity_poly_scipy(A, coeffs, sparsity_order)


def _fixed_sparsity_poly_scipy(A: sp.csr_matrix, coeffs, sparsity_order
                               ) -> sp.csr_matrix:
    """scipy fallback for _fixed_sparsity_poly_host (also the
    debug-compare oracle under PFLARE_NO_NATIVE=1)."""
    poly_order = len(coeffs) - 1
    so = max(1, min(sparsity_order, poly_order))
    si, sx = _poly_sparsity(A, so, poly_order)   # union(I, A, ..., A^so)
    S_mask = sp.csr_matrix(
        (np.ones(len(sx), dtype=np.float64), sx, si), shape=A.shape)

    A_on_S = sp.csr_matrix(A.multiply(S_mask))
    acc = coeffs[1] * A_on_S
    P = A_on_S
    for k in range(2, poly_order + 1):
        P = sp.csr_matrix((P @ A).multiply(S_mask))
        acc = acc + coeffs[k] * P
    n = min(A.shape)
    eye = sp.csr_matrix((np.ones(n), (np.arange(n), np.arange(n))),
                        shape=A.shape)
    acc = sp.csr_matrix(acc + coeffs[0] * eye)
    acc.sort_indices()
    return acc
