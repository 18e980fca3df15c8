"""Banded windowed-gather SpMV: the Pallas kernel that earns its keep.

Measured on TPU (docs/tpu.md): an arbitrary-index gather SpMV costs ~7 ms
at 512^2 while slice-based forms cost ~0.15 ms -- TPUs have no hardware
gather, and every XLA gather formulation measures the same.  For matrices
with BOUNDED BANDWIDTH (structured stencils beyond DIA's few-offset
limit, and RCM-ordered unstructured ones) the gather can be eliminated:

  * rows are processed in tiles of TR; the columns a tile touches span
    at most TWO consecutive aligned W-blocks of the (zero-padded) x, so
    the kernel receives them as ordinary non-overlapping BlockSpec inputs;
  * the within-window gather becomes ONE-HOT MATMULS on the MXU:
    E[t, w] = (local_cols[t] == w), y = E_A @ x_blockA + E_B @ x_blockB.
    E lives only in VMEM -- exactly what XLA cannot do (its dot operands
    materialise through HBM, costing more than the gather it replaces).

This is the reference's Kokkos-sibling philosophy applied to Pallas: the
kernel exists because the measurement says it matters (reference:
docs/dev/kokkos.md, SURVEY.md §2.3; the tie between Pallas and XLA on the
fused DIA smooth is documented in docs/tpu.md -- no kernel shipped there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

TILE_ROWS = 128
VMEM_BUDGET = 12 * 1024 * 1024   # bytes for the two one-hot blocks


@jax.tree_util.register_pytree_node_class
class BandedSpMV:
    """Pallas windowed SpMV for banded CSR matrices.

    data [n_pad, K]: padded ELL values; lcols [n_pad, K]: column indices
    LOCAL to the row's tile-block pair (see module docstring); pad slots
    hold data 0.
    """

    def __init__(self, data, lcols, n: int, n_cols: int, w: int, W: int,
                 precision: str = "split"):
        # data/lcols are stored TRANSPOSED [K, n_pad]: K slots in sublanes,
        # rows along lanes -- the layout the kernel's one-hot matmul wants
        self.data = data
        self.lcols = lcols
        self.n = int(n)
        self.n_cols = int(n_cols)
        self.w = int(w)          # one-sided bandwidth
        self.W = int(W)          # aligned block width (multiple of 128)
        self.precision = precision   # "split" (2-pass bf16, ~5e-6 rel) |
        #                              "highest" (exact f32, ~2.3x time)

    def tree_flatten(self):
        return (self.data, self.lcols), (self.n, self.n_cols, self.w,
                                         self.W, self.precision)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        data, lcols = leaves
        n, n_cols, w, W, prec = aux
        return cls(data, lcols, n, n_cols, w, W, prec)

    @property
    def shape(self):
        return (self.n, self.n_cols)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        # exact hi/lo f32 readback (a single f32 rounds above 2^24
        # entries; int d2h stalls on remote TPU backends)
        c = jnp.sum((self.data != 0).astype(jnp.int32))
        pair = jnp.stack([c // 1048576, c % 1048576]).astype(jnp.float32)
        v = np.asarray(pair, dtype=np.float64)
        return int(v[0]) * 1048576 + int(v[1])

    # ~~~~~~~~~~ construction ~~~~~~~~~~
    @staticmethod
    def bandwidth(A: sp.csr_matrix) -> int:
        A = sp.csr_matrix(A)
        if A.nnz == 0:
            return 0
        rows = np.repeat(np.arange(A.shape[0], dtype=np.int64),
                         np.diff(A.indptr))
        return int(np.abs(A.indices - rows).max())

    @staticmethod
    def viable(A, tile_rows: int = TILE_ROWS) -> bool:
        """Band narrow enough that the one-hot blocks fit VMEM, and the
        matrix big enough that a gather would actually hurt."""
        A = sp.csr_matrix(A)
        if A.nnz == 0 or A.shape[0] < 4 * tile_rows:
            return False
        if A.shape[0] != A.shape[1]:
            return False
        K = int(np.diff(A.indptr).max())
        w = BandedSpMV.bandwidth(A)
        W = -(-(2 * w + tile_rows) // 128) * 128
        return 2 * tile_rows * K * W * 4 <= VMEM_BUDGET

    @staticmethod
    def from_scipy(A, dtype=jnp.float32, tile_rows: int = TILE_ROWS,
                   precision: str = "split") -> "BandedSpMV":
        A = sp.csr_matrix(A)
        A.sort_indices()
        n, n_cols = A.shape
        w = BandedSpMV.bandwidth(A)
        W = -(-(2 * w + tile_rows) // 128) * 128
        K = max(1, int(np.diff(A.indptr).max()))
        n_pad = -(-n // tile_rows) * tile_rows
        data = np.zeros((K, n_pad), dtype=np.float64)
        lcols = np.zeros((K, n_pad), dtype=np.int32)
        counts = np.diff(A.indptr)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        slot = np.arange(A.nnz, dtype=np.int64) - np.repeat(
            A.indptr[:-1], counts)
        # x_pad[i] = x[i - w]; tile t touches x_pad[t*TR, t*TR + TR + 2w),
        # inside blocks j(t) and j(t)+1 with j(t) = (t*TR) // W
        tile_of_row = rows // tile_rows
        j = (tile_of_row * tile_rows) // W
        local = (A.indices + w - j * W).astype(np.int64)
        if A.nnz and (local.min() < 0 or local.max() >= 2 * W):
            raise ValueError("bandwidth accounting failed")
        data[slot, rows] = A.data
        lcols[slot, rows] = local.astype(np.int32)
        return BandedSpMV(jnp.asarray(data, dtype=dtype),
                          jnp.asarray(lcols), n, n_cols, w, W,
                          precision=precision)

    # ~~~~~~~~~~ matvec ~~~~~~~~~~
    def matvec(self, x):
        y = _banded_spmv(self.data, self.lcols, x, self.n_cols, self.w,
                         self.W, TILE_ROWS, self.precision)
        return y[: self.n]

    def __matmul__(self, x):
        return self.matvec(x)

    def to_scipy(self) -> sp.csr_matrix:
        data = np.asarray(self.data).T        # [n_pad, K]
        lcols = np.asarray(self.lcols).T
        n_pad, K = data.shape
        rows = np.repeat(np.arange(n_pad), K)
        tile_of_row = rows // TILE_ROWS
        j = (tile_of_row * TILE_ROWS) // self.W
        cols = lcols.reshape(-1) + j * self.W - self.w
        vals = data.reshape(-1)
        ok = ((vals != 0) & (cols >= 0) & (cols < self.n_cols)
              & (rows < self.n))
        M = sp.csr_matrix((vals[ok], (rows[ok], cols[ok])),
                          shape=(self.n, self.n_cols))
        M.sort_indices()
        return M


def _spmv_kernel(xa_ref, xb_ref, data_ref, lcols_ref, o_ref, *, W: int,
                 TR: int, precision: str):
    # Layout-natural formulation: per ELL slot k build the TRANSPOSED
    # one-hot E_T [W, TR] (sublane = window position, lane = row) and run
    # a REAL MXU matmul x[1, W] @ E_T[W, TR] -> [1, TR].  No reshapes,
    # no transposes, no wide lane reductions -- everything Mosaic lowers
    # natively.  The one-hots exist only in VMEM/registers.
    data = data_ref[:]                   # [K, TR]
    lcols = lcols_ref[:]                 # [K, TR] in [0, 2W)
    K = data.shape[0]
    # The v5 MXU is bf16-native: a default f32 dot rounds x to bf16
    # (~1e-3 error) and Precision.HIGHEST costs ~3.5x.  The one-hots are
    # EXACT in bf16, so splitting only x into hi+lo bf16 parts restores
    # f32 accuracy at 2 native-rate passes (measured in docs/tpu.md).
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (W, TR), 0)
    dn = (((1,), (0,)), ((), ()))

    if precision == "split":
        # 2-pass bf16 decomposition of x (hi+lo carry ~16 mantissa bits,
        # ~5e-6 relative); the one-hots are exact in bf16 so both dots run
        # at native MXU rate
        def split(v):
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        xa_hi, xa_lo = split(xa_ref[:])      # [1, W]
        xb_hi, xb_lo = split(xb_ref[:])

        def onedot(which, E):
            xh, xl = (xa_hi, xa_lo) if which == 0 else (xb_hi, xb_lo)
            Eb = E.astype(jnp.bfloat16)
            return (jax.lax.dot_general(xh, Eb, dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        xl, Eb, dimension_numbers=dn,
                        preferred_element_type=jnp.float32))
    else:
        # exact f32 via the XLA 3-pass decomposition (~2.3x the split time)
        xa32 = xa_ref[:]
        xb32 = xb_ref[:]

        def onedot(which, E):
            xv = xa32 if which == 0 else xb32
            return jax.lax.dot_general(
                xv, E.astype(jnp.float32), dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    acc = None
    for k in range(K):
        ck = lcols[k, :][None, :]        # [1, TR]
        E_a = (iota0 == ck)                            # [W, TR] bool
        E_b = (iota0 == (ck - W))
        g = onedot(0, E_a) + onedot(1, E_b)
        term = data[k, :][None, :] * g.astype(data.dtype)
        acc = term if acc is None else acc + term
    o_ref[:] = acc


@partial(jax.jit, static_argnames=("n_cols", "w", "W", "TR", "precision"))
def _banded_spmv(data, lcols, x, n_cols: int, w: int, W: int, TR: int,
                 precision: str = "split"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, n_pad = data.shape
    n_tiles = n_pad // TR
    # x_pad: w leading zeros + x + zeros out to block (j_last + 2) * W
    j_last = ((n_tiles - 1) * TR) // W
    total = (j_last + 2) * W
    x_pad = jnp.pad(x.astype(data.dtype), (w, max(total - w - x.shape[0],
                                                  0)))

    y = pl.pallas_call(
        partial(_spmv_kernel, W=W, TR=TR, precision=precision),
        grid=(n_tiles,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, W), lambda i: (0, (i * TR) // W),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, (i * TR) // W + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TR), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TR), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TR), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), data.dtype),
    )(x_pad.reshape(1, -1), x_pad.reshape(1, -1), data, lcols)
    return y.reshape(-1)
