"""Fixed-sparsity sparse products: host plans + jitted device numeric.

The TPU answer to PETSc's MatMatMult/MatPtAP symbolic/numeric split
(reference: src/AIR_Operators_Setup.F90:960-1033, src/Gmres_Poly.F90:777).
A plan is built once on host from static patterns; its numeric execution is
a pure gather / multiply / segment-sum -- static shapes, jittable, and the
natural realisation of the reference's MAT_REUSE_MATRIX path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .pattern import SparsityPattern
from .ell import ELL


def _csr64(A):
    A = sp.csr_matrix(A)
    A.sort_indices()
    return A


class SpGEMMPlan:
    """Plan for C = (A @ B) restricted to a fixed output pattern.

    ``a_pos``/``b_pos`` index the CSR value arrays of A and B; ``out_pos``
    is the CSR entry position in C for each product term.  The ELL
    flat-slot view needed by the device path is derived lazily -- most
    plans (host re-setup, device-resetup tables) never touch ELL space,
    and the slot conversion is a full pass over the (often huge) triple
    list."""

    def __init__(self, pat_A: SparsityPattern, pat_B: SparsityPattern,
                 pat_C: SparsityPattern, a_pos, b_pos, out_pos):
        self.pat_A = pat_A
        self.pat_B = pat_B
        self.pat_C = pat_C
        self.a_pos_np = np.asarray(a_pos)
        self.b_pos_np = np.asarray(b_pos)
        self.out_pos_np = np.asarray(out_pos)
        self._dev = None

    def _device_arrays(self):
        if self._dev is None:
            self._dev = (jnp.asarray(self.pat_A.slot_of_pos[self.a_pos_np]),
                         jnp.asarray(self.pat_B.slot_of_pos[self.b_pos_np]),
                         jnp.asarray(self.out_pos_np))
        return self._dev

    @property
    def a_slot(self):
        return self._device_arrays()[0]

    @property
    def b_slot(self):
        return self._device_arrays()[1]

    @property
    def out_pos(self):
        return self._device_arrays()[2]

    def execute(self, A: ELL, B: ELL) -> ELL:
        """Numeric product on device (jit-friendly; shapes are static)."""
        a_slot, b_slot, out_pos = self._device_arrays()
        a = A.data.reshape(-1)[a_slot]
        b = B.data.reshape(-1)[b_slot]
        c_flat = jax.ops.segment_sum(
            a * b, out_pos, num_segments=self.pat_C.nnz
        )
        return ELL.from_flat(self.pat_C, c_flat)

    def execute_host(self, a_data: np.ndarray, b_data: np.ndarray
                     ) -> np.ndarray:
        """Numeric product on host (setup phase): CSR value arrays in,
        CSR-ordered C values out.  One native streaming pass when
        available (bitwise-identical accumulation order to the bincount
        fallback: k ascending over the triple list)."""
        from ..native import plan_execute_native

        out = plan_execute_native(a_data, b_data, self.a_pos_np,
                                  self.b_pos_np, self.out_pos_np,
                                  self.pat_C.nnz)
        if out is not None:
            return out
        prod = a_data[self.a_pos_np] * b_data[self.b_pos_np]
        return np.bincount(self.out_pos_np, weights=prod,
                           minlength=self.pat_C.nnz)


def build_spgemm_plan(
    pat_A: SparsityPattern,
    pat_B: SparsityPattern,
    pat_C: SparsityPattern | None = None,
) -> SpGEMMPlan:
    """Enumerate all product triples (i,k)(k,j) that land in pattern C.

    If ``pat_C`` is None the full product pattern is used (computed
    symbolically with scipy).
    """
    if pat_C is None:
        A = pat_A.csr_bool().astype(np.float64)
        B = pat_B.csr_bool().astype(np.float64)
        C = _csr64(A @ B)
        pat_C = SparsityPattern(C.indptr, C.indices, C.shape)

    # native triple enumeration (C++ host kernel) when available
    from ..native import plan_triples_native

    nat = plan_triples_native(pat_A.indptr, pat_A.indices,
                              pat_B.indptr, pat_B.indices,
                              pat_C.indptr, pat_C.indices,
                              pat_B.shape[1])
    if nat is not None:
        a_idx, b_idx, out_pos = nat
    else:
        nnz_A = pat_A.nnz
        a_rows = pat_A.row_of_pos()
        a_cols = pat_A.indices
        b_indptr = pat_B.indptr
        b_len = np.diff(b_indptr)

        # per A-entry: number of B entries in row a_cols[t]
        rep = b_len[a_cols]
        total = int(rep.sum())
        a_idx = np.repeat(np.arange(nnz_A, dtype=np.int64), rep)
        grp_start = np.cumsum(rep) - rep
        off = np.arange(total, dtype=np.int64) - np.repeat(grp_start, rep)
        b_idx = np.repeat(b_indptr[a_cols], rep) + off

        i_trip = a_rows[a_idx]
        j_trip = pat_B.indices[b_idx]

        # locate each (i, j) in C's pattern
        out_pos = pat_C.find(i_trip, j_trip)
        keep = out_pos >= 0
        a_idx, b_idx, out_pos = a_idx[keep], b_idx[keep], out_pos[keep]

    return SpGEMMPlan(pat_A, pat_B, pat_C, a_idx, b_idx, out_pos)


class FixedSparsityPolyPlan:
    """Assembled fixed-sparsity matrix polynomial plan.

    Computes p(A) = c0 I + c1 A + c2 (A*A)|_S + c3 (A*(A*A)|_S)|_S + ...
    where S is the sparsity of A^sparsity_order -- the reference's
    ``mat_mult_powers_share_sparsity`` (reference: src/Gmres_Poly.F90:777-920):
    each successive power is computed with products restricted onto the fixed
    pattern so the assembled inverse stays as sparse as A^sparsity_order.
    """

    def __init__(self, pat_A: SparsityPattern, order: int, sparsity_order: int):
        self.order = order
        self.sparsity_order = max(1, min(sparsity_order, order))
        A = pat_A.csr_bool().astype(np.float64)
        # Pattern S = union of the diagonal and every power up to
        # sparsity_order (a matrix with structural zero diagonal -- e.g. the
        # Neumann N = I - D^-1 A -- has pattern(A^2) not containing
        # pattern(A), so the union is required for the c1*A term to land)
        S = A.copy()
        power = A
        for _ in range(self.sparsity_order - 1):
            power = _csr64(power @ A)
            S = _csr64(S + power)
        n = min(pat_A.shape)
        S = _csr64(
            S + sp.csr_matrix((np.ones(n), (np.arange(n), np.arange(n))), shape=S.shape)
        )
        self.pat_S = SparsityPattern(S.indptr, S.indices, S.shape)
        self.pat_A = pat_A
        # Plan for (X @ A)|_S with X on S.  Multiplying on the right by A
        # (X@A) keeps the running power in the first operand.
        self.step_plan = build_spgemm_plan(self.pat_S, pat_A, self.pat_S)
        # Plan to inject A itself onto S
        self.inject_pos_np = self.pat_S.find(pat_A.row_of_pos(), pat_A.indices)
        self.inject_slot_np = pat_A.slot_of_pos
        self.diag_pos_np = self.pat_S.diag_positions()
        self.inject_pos = jnp.asarray(self.inject_pos_np)
        self.inject_slot = jnp.asarray(self.inject_slot_np)
        self.diag_pos = jnp.asarray(self.diag_pos_np)

    def execute(self, A: ELL, coefficients) -> ELL:
        """coefficients: [order+1] array (c0 ... c_order)."""
        coefficients = jnp.asarray(coefficients, dtype=A.dtype)
        # A laid onto S
        a_on_s_flat = jax.ops.segment_sum(
            A.data.reshape(-1)[self.inject_slot],
            self.inject_pos,
            num_segments=self.pat_S.nnz,
        )
        A_on_S = ELL.from_flat(self.pat_S, a_on_s_flat)
        acc_flat = coefficients[1] * a_on_s_flat
        power = A_on_S
        for k in range(2, self.order + 1):
            power = self.step_plan.execute(power, A)
            acc_flat = acc_flat + coefficients[k] * power.flat_values()
        # c0 on the diagonal
        acc_flat = acc_flat.at[self.diag_pos].add(
            jnp.where(self.diag_pos >= 0, coefficients[0], 0.0)
        )
        return ELL.from_flat(self.pat_S, acc_flat)

    def execute_host(self, A_csr, coefficients) -> "sp.csr_matrix":
        """Host numeric path (setup phase, no XLA): same plan, numpy
        bincount segment sums.  All value vectors stay in CSR entry order
        (the plan triples index CSR positions directly)."""
        coefficients = np.asarray(coefficients, dtype=np.float64)
        patS = self.pat_S
        # inject_pos is injective, so the bincount is a pure placement of
        # A's CSR values onto the S pattern
        a_on_s = np.bincount(self.inject_pos_np, weights=A_csr.data,
                             minlength=patS.nnz)
        acc = coefficients[1] * a_on_s
        power_csr = a_on_s
        for k in range(2, self.order + 1):
            power_csr = self.step_plan.execute_host(power_csr, A_csr.data)
            acc = acc + coefficients[k] * power_csr
        dmask = self.diag_pos_np >= 0
        acc[self.diag_pos_np[dmask]] += coefficients[0]
        out = sp.csr_matrix(
            (acc, patS.indices.astype(np.int64), patS.indptr), shape=patS.shape
        )
        out.sort_indices()
        return out


def scipy_matmat(A: sp.csr_matrix, B: sp.csr_matrix) -> sp.csr_matrix:
    """Plain host numeric SpGEMM (first-time setup path)."""
    C = _csr64(_csr64(A) @ _csr64(B))
    return C
