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
_FUSED_MIN_ROWS = 65536   # below this the whole op is dispatch-bound
_FUSED_MAX_K = 16
_VMEM_BUDGET = 10 * 1024 * 1024


def _fused_tr(offsets, n_rows: int, n_cols: int, dtype):
    """Pick the fused kernel's tile geometry (TR, SUB, aligned) -- TR
    lanes per row-group, SUB row-groups per grid step -- or None if the
    matrix is outside the fused envelope (small, wide-span, many-offset,
    f64).  SUB is the largest tile height whose double-buffered working
    set fits VMEM: per-grid-step overhead is ~1.5 us on this backend, so
    tall tiles amortise it (measured 159 -> 475+ GB/s real).

    ``aligned``: when some TR divides n_cols with every offset in
    [-TR, 2*TR), the kernel reads x DIRECTLY via clamped overlap blocks
    -- no per-matvec pad/shift copy of x at all (edge reads land on
    clamped garbage that the data zeros annihilate).  The padded
    variant (shift x by ``lo``, pad to the tile multiple) is the
    general fallback."""
    if not offsets or len(offsets) > _FUSED_MAX_K:
        return None
    if np.dtype(dtype) != np.float32:
        return None
    if n_rows < _FUSED_MIN_ROWS:
        return None
    K = len(offsets)

    def pick_sub(tr, extra):
        for sub in (64, 32, 16, 8):
            if 2 * (K * sub + sub + extra + sub) * tr * 4 <= _VMEM_BUDGET:
                return sub
        return None

    lo_off = min(0, min(offsets))
    hi_off = max(0, max(offsets))
    # aligned candidates: smallest divisor of n_cols that is a multiple
    # of 128 and covers the offsets in [-tr, 2tr)
    need = max(512, -lo_off, (hi_off + 2) // 2)
    tr = -(-need // _LANES) * _LANES
    while tr <= 32768:
        if n_cols % tr == 0 and -tr <= lo_off and hi_off < 2 * tr:
            nx = n_cols // tr
            sub = pick_sub(tr, 16)
            # the clamped neighbour blocks need full 8-row blocks of x
            # and an exact sub-tiling of its rows
            while sub is not None and sub >= 8 and (nx % sub != 0
                                                    or sub > nx):
                sub //= 2
            if sub is not None and sub >= 8 and nx >= 8:
                return tr, sub, True
        tr += _LANES
    span = hi_off - lo_off      # every shifted offset lands in [0, span]
    tr = max(512, -(-span // _LANES) * _LANES)
    sub = pick_sub(tr, 8)
    return None if sub is None else (tr, sub, False)


@jax.tree_util.register_pytree_node_class
class DIA:
    """offsets: static tuple of ints; data: [n_offsets, n_rows_padded].

    ``tr``: when set, a (TR, SUB) tile geometry -- ``data`` is
    zero-padded to a multiple of ``SUB*tr`` rows and matvec takes the
    fused Pallas path on TPU (see module docstring); None keeps the
    portable XLA loop (and ``data`` may be exactly [K, n_rows])."""

    def __init__(self, offsets, data, shape, tr=None):
        self.offsets = tuple(int(o) for o in offsets)
        self.data = data
        self.shape = (int(shape[0]), int(shape[1]))
        self._tr = (int(tr[0]), int(tr[1]), bool(tr[2])) if tr else None

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
        tr = _fused_tr(uniq.tolist(), n_rows, n_cols, dtype)
        blk = tr[0] * tr[1] if tr else 1
        n_pad = -(-n_rows // blk) * blk
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
        tr = _fused_tr(offsets, n_rows, int(shape[1]), data.dtype)
        if tr is None:
            return DIA(offsets, data, shape)
        blk = tr[0] * tr[1]
        n_pad = -(-n_rows // blk) * blk
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
            tr, sub, aligned = self._tr
            interp = jax.default_backend() != "tpu"
            if aligned:
                return _dia_fused_aligned(self.data, x, offsets, n_rows,
                                          tr, sub, interpret=interp)
            return _dia_fused(self.data, x, offsets, n_rows, tr, sub,
                              interpret=interp)
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
    # xa: [SUB, TR] -- SUB consecutive TR-row groups of x_pad; xb:
    # [8, TR] -- the 8-row block after them (only its first row is
    # used).  Every offset becomes a static lane concat of xa and its
    # row-shifted sibling: all K FMAs touch HBM-loaded data exactly once.
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


def _dia_kernel_aligned(xp_ref, xa_ref, xb_ref, d_ref, o_ref, *,
                        offs_dr, TR):
    # xa: [SUB, TR] = x rows [i*SUB, i*SUB+SUB); xp/xb: the 8-row blocks
    # before/after (clamped at the edges -- their misread values are
    # annihilated by the data zeros).  offs_dr: per offset the (row
    # shift d in {-1,0,1}, lane shift r in [0, TR)) decomposition.
    xa = xa_ref[:]
    xm1 = xs1 = xs2 = None
    for _, (d, r) in enumerate(offs_dr):
        if d == -1 and xm1 is None:
            xm1 = jnp.concatenate([xp_ref[7:8], xa[:-1]], axis=0)
        if (d == 1 or (d == 0 and r > 0)) and xs1 is None:
            xs1 = jnp.concatenate([xa[1:], xb_ref[:1]], axis=0)
        if d == 1 and r > 0 and xs2 is None:
            xs2 = jnp.concatenate([xa[2:], xb_ref[:2]], axis=0)
    acc = None
    for k, (d, r) in enumerate(offs_dr):
        base = {-1: xm1, 0: xa, 1: xs1}[d]
        if r == 0:
            seg = base
        else:
            nxt = {-1: xa, 0: xs1, 1: xs2}[d]
            seg = jnp.concatenate([base[:, r:], nxt[:, :r]], axis=1)
        term = d_ref[k] * seg
        acc = term if acc is None else acc + term
    o_ref[:] = acc


@partial(jax.jit,
         static_argnames=("offsets", "n_rows", "tr", "sub", "interpret"))
def _dia_fused_aligned(data, x, offsets, n_rows: int, tr: int, sub: int,
                       interpret: bool = False):
    """Pad-free fused DIA SpMV: TR divides len(x), so x reshapes to
    [len(x)//TR, TR] with NO copy and every offset decomposes into a row
    shift d in {-1,0,1} plus a lane shift r -- served by the tile's own
    block plus clamped 8-row neighbour blocks.  Eliminates the
    per-matvec pad/shift of x that capped the padded variant at ~160
    GB/s model; x traffic is ~(1 + 16/SUB)x its size."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, n_pad = data.shape
    nt = n_pad // (sub * tr)
    nx = x.shape[0] // tr
    x2d = x.astype(data.dtype).reshape(nx, tr)
    d3 = data.reshape(K, sub * nt, tr)
    offs_dr = tuple((int(o) // tr, int(o) % tr) for o in offsets)
    s8 = sub // 8
    nb8 = nx // 8                     # valid 8-row block indices [0, nb8)

    y = pl.pallas_call(
        partial(_dia_kernel_aligned, offs_dr=offs_dr, TR=tr),
        grid=(nt,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((8, tr),
                         lambda i: (jnp.maximum(i * s8 - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (sub, tr),
                lambda i: (jnp.minimum(i, max(nx // sub - 1, 0)), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, tr),
                lambda i: (jnp.minimum(i * s8 + s8, nb8 - 1), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((K, sub, tr), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, tr), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sub * nt, tr), data.dtype),
    )(x2d, x2d, x2d, d3)
    return y.reshape(-1)[:n_rows]


@partial(jax.jit,
         static_argnames=("offsets", "n_rows", "tr", "sub", "interpret"))
def _dia_fused(data, x, offsets, n_rows: int, tr: int, sub: int,
               interpret: bool = False):
    """One-pass fused DIA SpMV (see module docstring).

    Row g = (i*SUB + s)*TR + l reads x_pad[(i*SUB + s)*TR + l + r_k]
    with r_k = offset_k + lo in [0, TR]: rows i*SUB+s and i*SUB+s+1 of
    the TR-reshaped x_pad.  Each grid step loads one aligned [SUB, TR]
    block plus the 8-row overlap block after it -- x traffic
    ~(1 + 8/SUB)x its size, data and y exactly once.  SUB is as tall as
    VMEM allows: per-grid-step overhead is ~1.5 us on this backend, so
    short tiles throttle the stream (measured 159 GB/s at SUB=8 vs 475+
    at SUB=32 for the same math).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, n_pad = data.shape
    nt = n_pad // (sub * tr)
    lo = max(0, -min(offsets))
    # one extra 8-row block so tile nt-1's overlap block exists
    total = (sub * nt + 8) * tr
    x_pad = jnp.pad(x.astype(data.dtype),
                    (lo, total - lo - x.shape[0]))
    x2d = x_pad.reshape(sub * nt + 8, tr)
    d3 = data.reshape(K, sub * nt, tr)
    offs_r = tuple(int(o) + lo for o in offsets)
    s8 = sub // 8

    y = pl.pallas_call(
        partial(_dia_kernel, offs_r=offs_r, TR=tr),
        grid=(nt,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((sub, tr), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr), lambda i: (i * s8 + s8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, sub, tr), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, tr), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sub * nt, tr), data.dtype),
    )(x2d, x2d, d3)
    return y.reshape(-1)[:n_rows]
