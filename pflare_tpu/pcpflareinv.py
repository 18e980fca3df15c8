"""PCPFLAREINV: one-level approximate-inverse preconditioner object.

Front-end mirroring the reference PC type (reference: src/PCPFLAREINV.c):
setup computes the approximate inverse (optionally reusing stored
polynomial coefficients on a same-pattern re-setup), apply is one
inverse application, and the coefficient get/set protocol allows exact
reconstruction of a preconditioner (reference:
src/PCPFLAREINV.c:484-563, tests/ex6_getcoeffs.c).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .options import PFLAREINVOptions
from .params import InverseType
from .inverse import build_inverse
from .sparse import ELL


class PCPFLAREINV:
    def __init__(self, options: PFLAREINVOptions | None = None, **kw):
        opts = options or PFLAREINVOptions()
        if kw:
            from dataclasses import replace

            opts = replace(opts, **kw)
        self.options = opts
        self.inverse = None
        self._ell = None
        self.reuse_poly_coeffs = False
        self._frozen = False
        self._injected = None

    def set_options(self, **kw):
        from dataclasses import replace

        self.options = replace(self.options, **kw)
        self.reset()

    def reset(self):
        self.inverse = None
        self._ell = None
        self._injected = None

    def freeze(self, flag: bool = True):
        self._frozen = flag

    def setup(self, A, structure: str = "different"):
        """structure='same': keep the sparsity; with reuse_poly_coeffs also
        skip the coefficient iteration (reference:
        src/PCPFLAREINV.c:689-781)."""
        if self._frozen and self.inverse is not None:
            return self
        A = sp.csr_matrix(A)
        pattern = None
        coeffs = None
        # coefficients injected BEFORE the first setup skip the polynomial
        # iteration too -- the reference's ptr-in protocol
        # (reference: src/PCPFLAREINV.c:700-781: NULL-in -> compute,
        # ptr-in -> reuse)
        injected = self._injected
        if injected is not None:
            c = np.asarray(injected)
            coeffs = c if c.ndim == 1 else (c[0], c[1])
        if structure == "same" and self._ell is not None:
            pattern = self._ell.pattern
            if coeffs is None and self.reuse_poly_coeffs \
                    and self.inverse is not None \
                    and self.inverse.coefficients is not None:
                c = np.asarray(self.inverse.coefficients)
                coeffs = c if c.ndim == 1 else (c[0], c[1])
        # pin setup-phase arrays to the host CPU (remote-TPU tunnel cost)
        import jax

        try:
            ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
        except Exception:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            self._ell = ELL.from_scipy(A, pattern=pattern)
            o = self.options
            self.inverse = build_inverse(
                self._ell, o.inverse_type, poly_order=o.poly_order,
                sparsity_order=o.inverse_sparsity_order,
                matrix_free=o.matrix_free, diag_scale=o.diag_scale,
                coefficients=coeffs, A_scipy=A, seed=o.seed,
            )
        return self

    def apply(self, r):
        if self.inverse is None:
            raise RuntimeError("PCPFLAREINV not set up")
        return self.inverse.apply(jnp.asarray(r))

    def __call__(self, r):
        return self.apply(r)

    # ~~~~~~~~~~ coefficient protocol ~~~~~~~~~~
    def get_poly_coeffs(self):
        if self.inverse is None or self.inverse.coefficients is None:
            return None
        return np.asarray(self.inverse.coefficients)

    def set_poly_coeffs(self, coeffs):
        """Inject coefficients; the next setup skips the polynomial
        iteration entirely."""
        self._injected = np.asarray(coeffs)
        self.reuse_poly_coeffs = True
        if self.inverse is not None:
            c = self._injected
            self.inverse.coefficients = jnp.asarray(c)

    def get_inverse_mat(self):
        """Borrowed reference to the assembled inverse (reference:
        PCPFLAREINVGetInverseMat, src/PCPFLAREINV.c:259)."""
        if self.inverse is None:
            return None
        return self.inverse.mat if self.inverse.kind == "assembled" else None

    def view(self, out=print):
        """Pretty-print the configuration (PCView analogue)."""
        o = self.options
        lines = [
            "PCPFLAREINV (one-level approximate inverse)",
            f"  inverse type: {o.inverse_type.name}",
            f"  polynomial order: {o.poly_order}, sparsity order "
            f"{o.inverse_sparsity_order}",
            f"  application: {'matrix-free' if o.matrix_free else 'assembled'}"
            + (", diag-scaled" if o.diag_scale else ""),
        ]
        if self.inverse is not None:
            lines.append(f"  built: kind={self.inverse.kind}")
        for ln in lines:
            out(ln)
        return "\n".join(lines)

    def solve(self, b, ksp="gmres", rtol=1e-5, atol=1e-50, max_it=10000,
              side="left", restart=30, x0=None):
        from .solvers import gmres, richardson

        if self.inverse is None:
            raise RuntimeError("PCPFLAREINV not set up")
        b = jnp.asarray(b)
        if ksp == "gmres":
            return gmres(self._ell, b, x0=x0, M=self.apply, side=side,
                         rtol=rtol, atol=atol, max_it=max_it, restart=restart)
        if ksp == "richardson":
            return richardson(self._ell, b, x0=x0, M=self.apply, rtol=rtol,
                              atol=atol, max_it=max_it)
        raise ValueError(ksp)
