"""DIA (offset-diagonal) sparse matrices: the TPU fast path for SpMV.

XLA's TPU gather carries a multi-millisecond fixed cost per op, making
gather-based ELL SpMV latency-bound.  Matrices whose entries live on a small
set of column offsets (structured stencils, and every full-space masked
operator derived from them -- see air/smooth.py) admit the DIA form

    y[i] = sum_k data[k, i] * x[i + offset_k]

which compiles to static padded slices + FMAs: pure VPU work at memory
bandwidth, no gathers at all.

Two matvec paths:

* XLA loop (``dynamic_slice`` per offset + FMA): portable, sustains ~19%
  of HBM peak at >= 2048^2 -- each offset re-reads a shifted, unaligned
  copy of x (docs/tpu.md roofline table, rounds 3-4).
* **fused Pallas kernel** (``_dia_fused``): one pass over HBM -- each
  grid step loads an aligned [8, TR] block of x (plus ONE overlap row)
  and the K data rows for those 8*TR rows into VMEM, then applies every
  offset as a static in-VMEM lane concat + FMA.  x is read ~1.1x, data
  and y exactly once: traffic approaches the (K+2)-array lower bound
  instead of the XLA path's unaligned re-reads.  This is the identified
  ">= 50% of HBM peak" kernel of docs/tpu.md (the reference keeps device
  kernels where measured to matter: docs/dev/kokkos.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

_LANES = 128
_SUBL = 8              # sublanes per fused tile (f32 vreg height)
_FUSED_MIN_ROWS = 65536   # below this the whole op is dispatch-bound
_FUSED_MAX_K = 16
_VMEM_BUDGET = 10 * 1024 * 1024


def _fused_tr(offsets, n_rows: int, dtype) -> int | None:
    """Pick the fused kernel's row-tile width TR, or None if the matrix
    is outside the fused envelope (small, wide-span, many-offset, f64)."""
    if not offsets or len(offsets) > _FUSED_MAX_K:
        return None
    if np.dtype(dtype) != np.float32:
        return None
    if n_rows < _FUSED_MIN_ROWS:
        return None
    lo = min(0, min(offsets))
    hi = max(0, max(offsets))
    span = hi - lo              # every shifted offset lands in [0, span]
    tr = max(512, -(-span // _LANES) * _LANES)
    K = len(offsets)
    # double-buffered VMEM: data (K,8,TR) + x (9,TR) + out (8,TR)
    if 2 * (K * _SUBL + _SUBL + 1 + _SUBL) * tr * 4 > _VMEM_BUDGET:
        return None
    return tr


@jax.tree_util.register_pytree_node_class
class DIA:
    """offsets: static tuple of ints; data: [n_offsets, n_rows_padded].

    ``tr``: when set, ``data`` is zero-padded to a multiple of ``8*tr``
    rows and matvec takes the fused Pallas path on TPU (see module
    docstring); None keeps the portable XLA loop (and ``data`` may be
    exactly [K, n_rows])."""

    def __init__(self, offsets, data, shape, tr=None):
        self.offsets = tuple(int(o) for o in offsets)
        self.data = data
        self.shape = (int(shape[0]), int(shape[1]))
        self._tr = int(tr) if tr else None

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.shape, self._tr)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        offsets, shape, tr = aux
        return cls(offsets, leaves[0], shape, tr=tr)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self):
        return int(np.count_nonzero(
            np.asarray(self.data)[:, : self.shape[0]]))

    @staticmethod
    def from_scipy(M, dtype=None) -> "DIA":
        M = sp.csr_matrix(M)
        M.sort_indices()
        n_rows, n_cols = M.shape
        rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(M.indptr))
        offs = M.indices - rows
        uniq = np.unique(offs)
        dtype = dtype or M.data.dtype
        tr = _fused_tr(uniq.tolist(), n_rows, dtype)
        n_pad = -(-n_rows // (_SUBL * tr)) * (_SUBL * tr) if tr else n_rows
        data = np.zeros((len(uniq), n_pad), dtype=dtype)
        slot = np.searchsorted(uniq, offs)
        data[slot, rows] = M.data.astype(dtype)
        return DIA(uniq.tolist(), jnp.asarray(data), M.shape, tr=tr)

    @staticmethod
    def make_fused(offsets, data, shape, pad_value=0.0) -> "DIA":
        """Wrap device-resident [K, n_rows] values for the fused path:
        pads rows to the tile multiple ONCE (device-side) so per-matvec
        padding never appears in the solve loop.  Falls back to the plain
        container outside the fused envelope."""
        offsets = [int(o) for o in offsets]
        n_rows = int(shape[0])
        tr = _fused_tr(offsets, n_rows, data.dtype)
        if tr is None:
            return DIA(offsets, data, shape)
        n_pad = -(-n_rows // (_SUBL * tr)) * (_SUBL * tr)
        if data.shape[1] < n_pad:
            data = jnp.pad(data, ((0, 0), (0, n_pad - data.shape[1])),
                           constant_values=pad_value)
        return DIA(offsets, data, shape, tr=tr)

    @staticmethod
    def viable(M, max_offsets: int = 8, max_fill_ratio: float = 3.0) -> bool:
        """Is the DIA form worth it for this matrix?"""
        M = sp.csr_matrix(M)
        if M.nnz == 0:
            return False
        rows = np.repeat(np.arange(M.shape[0], dtype=np.int64),
                         np.diff(M.indptr))
        n_off = len(np.unique(M.indices - rows))
        return (n_off <= max_offsets
                and n_off * M.shape[0] <= max_fill_ratio * M.nnz)

    def _fused_active(self) -> bool:
        if self._tr is None:
            return False
        import os

        mode = os.environ.get("PFLARE_DIA_FUSED", "auto")
        if mode == "0":
            return False
        return mode == "force" or jax.default_backend() == "tpu"

    def matvec(self, x):
        n_rows, n_cols = self.shape
        offsets = self.offsets
        if not offsets:
            return jnp.zeros(n_rows, dtype=self.data.dtype)
        if self._fused_active():
            return _dia_fused(self.data, x, offsets, n_rows, self._tr,
                              interpret=jax.default_backend() != "tpu")
        pad_lo = max(0, -min(offsets))
        pad_hi = max(0, max(offsets) + n_rows - n_cols)
        xp = jnp.pad(x, (pad_lo, pad_hi))
        y = None
        for k, off in enumerate(offsets):
            seg = jax.lax.dynamic_slice(xp, (pad_lo + off,), (n_rows,))
            term = self.data[k, :n_rows] * seg
            y = term if y is None else y + term
        return y

    def __matmul__(self, x):
        return self.matvec(x)

    def astype(self, dtype):
        if np.dtype(dtype) != np.float32 and self._tr is not None:
            # outside the fused envelope: drop the padding and the flag
            return DIA(self.offsets,
                       self.data[:, : self.shape[0]].astype(dtype),
                       self.shape)
        return DIA(self.offsets, self.data.astype(dtype), self.shape,
                   tr=self._tr)

    def to_scipy(self) -> sp.csr_matrix:
        n_rows, n_cols = self.shape
        data = np.asarray(self.data)[:, :n_rows]
        rows_l, cols_l, vals_l = [], [], []
        for k, off in enumerate(self.offsets):
            i = np.arange(n_rows)
            j = i + off
            ok = (j >= 0) & (j < n_cols) & (data[k] != 0)
            rows_l.append(i[ok])
            cols_l.append(j[ok])
            vals_l.append(data[k][ok])
        M = sp.csr_matrix(
            (np.concatenate(vals_l), (np.concatenate(rows_l),
                                      np.concatenate(cols_l))),
            shape=self.shape,
        )
        M.sort_indices()
        return M


# ~~~~~~~~~~~~~~~~~~ fused multi-offset Pallas SpMV ~~~~~~~~~~~~~~~~~~

def _dia_kernel(xa_ref, xb_ref, d_ref, o_ref, *, offs_r, TR):
    # xa: [8, TR] -- 8 consecutive TR-row groups of x_pad; xb: [1, TR] --
    # the ONE overlap row after them.  Every offset becomes a static lane
    # concat of xa and its row-shifted sibling: all K FMAs touch HBM-
    # loaded data exactly once.
    xa = xa_ref[:]
    xs = jnp.concatenate([xa[1:], xb_ref[:1]], axis=0)  # rows s+1
    acc = None
    for k, r in enumerate(offs_r):
        if r == 0:
            seg = xa
        elif r == TR:
            seg = xs
        else:
            seg = jnp.concatenate([xa[:, r:], xs[:, :r]], axis=1)
        term = d_ref[k] * seg
        acc = term if acc is None else acc + term
    o_ref[:] = acc


@partial(jax.jit, static_argnames=("offsets", "n_rows", "tr", "interpret"))
def _dia_fused(data, x, offsets, n_rows: int, tr: int,
               interpret: bool = False):
    """One-pass fused DIA SpMV (see module docstring).

    Row g = i*8*TR + s*TR + l reads x_pad[(8i+s)*TR + l + r_k] with
    r_k = offset_k + lo in [0, TR]: rows 8i+s and 8i+s+1 of the
    TR-reshaped x_pad, so each grid step needs one aligned [8, TR] block
    plus one overlap row -- x traffic ~1.125x its size, data and y 1x.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, n_pad = data.shape
    nt = n_pad // (_SUBL * tr)
    lo = max(0, -min(offsets))
    # one extra (8, TR) block row so tile nt-1's overlap block exists
    # (Mosaic rejects height-1 blocks; reading the full next block costs
    # one extra pass over x -- still (K+3)/(K+2) of the traffic bound)
    total = _SUBL * (nt + 1) * tr
    x_pad = jnp.pad(x.astype(data.dtype),
                    (lo, total - lo - x.shape[0]))
    x2d = x_pad.reshape(_SUBL * (nt + 1), tr)
    d3 = data.reshape(K, _SUBL * nt, tr)
    offs_r = tuple(int(o) + lo for o in offsets)

    y = pl.pallas_call(
        partial(_dia_kernel, offs_r=offs_r, TR=tr),
        grid=(nt,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((_SUBL, tr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBL, tr), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, _SUBL, tr), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SUBL, tr), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_SUBL * nt, tr), data.dtype),
    )(x2d, x2d, d3)
    return y.reshape(-1)[:n_rows]
