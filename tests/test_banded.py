"""Banded windowed-gather Pallas SpMV (sparse/banded.py).

The kernel exists because of a measurement (docs/tpu.md): arbitrary-index
gathers cost ~7 ms at 512^2 on TPU while this kernel measures ~1.8 ms
(split precision) / ~4.3 ms (exact).  On the CPU test backend the kernel
runs in interpreter mode; correctness is what's asserted here.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from pflare_tpu import AIROptions, PCAIR, adv_diff_2d
from pflare_tpu.sparse.banded import BandedSpMV


def _band_matrix(n, w, seed):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        nz = rng.integers(1, 9)
        c = np.clip(i + rng.integers(-w, w + 1, size=nz), 0, n - 1)
        rows += [i] * len(c)
        cols += c.tolist()
        vals += rng.standard_normal(len(c)).tolist()
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    A.sort_indices()
    return A


def _f32_reference(A, x32):
    """Exact-in-f64 product of the f32-rounded operator and vector: the
    bound a correct f32 kernel must meet."""
    Af = A.copy()
    Af.data = Af.data.astype(np.float32).astype(np.float64)
    return Af @ np.asarray(x32, dtype=np.float64)


def test_matvec_structured():
    """f32 kernel (the TPU-native dtype): split precision holds ~5e-6
    relative, highest ~1e-7 (docs/tpu.md measurements)."""
    A = adv_diff_2d(64)
    assert BandedSpMV.viable(A)
    x32 = np.random.default_rng(0).standard_normal(
        A.shape[0]).astype(np.float32)
    ref = _f32_reference(A, x32)
    scale = np.abs(ref).max()
    for prec, tol in (("highest", 1e-6), ("split", 2e-5)):
        M = BandedSpMV.from_scipy(A, dtype=jnp.float32, precision=prec)
        y = np.asarray(M.matvec(jnp.asarray(x32)))
        assert np.abs(y - ref).max() / scale < tol, prec


def test_matvec_random_band():
    A = _band_matrix(1200, 37, 1)
    assert BandedSpMV.viable(A)
    x32 = np.random.default_rng(2).standard_normal(1200).astype(np.float32)
    ref = _f32_reference(A, x32)
    scale = np.abs(ref).max()
    for prec, tol in (("highest", 1e-6), ("split", 2e-5)):
        M = BandedSpMV.from_scipy(A, dtype=jnp.float32, precision=prec)
        y = np.asarray(M.matvec(jnp.asarray(x32)))
        assert np.abs(y - ref).max() / scale < tol, prec


def test_roundtrip_and_viability():
    A = _band_matrix(900, 25, 3)
    M = BandedSpMV.from_scipy(A)
    assert abs(M.to_scipy() - A).max() < 1e-6
    # wide-band matrix exceeds the VMEM one-hot budget
    Awide = _band_matrix(4000, 3500, 4)
    assert not BandedSpMV.viable(Awide)
    # tiny matrices aren't worth the kernel
    assert not BandedSpMV.viable(_band_matrix(100, 5, 5))


def test_resetup_layout_roundtrip():
    """Device re-setup can rebuild a BandedSpMV op from CSR values (the
    layout only arises on the TPU backend; exercised here directly)."""
    from pflare_tpu.air.device_resetup import _build_op, _op_layout

    A = _band_matrix(900, 25, 3)
    M = BandedSpMV.from_scipy(A, dtype=jnp.float64)
    kind, arrs, aux = _op_layout(M, A)
    assert kind == "banded"
    M2 = _build_op(kind, arrs, aux, jnp.asarray(A.data), jnp.float64)
    assert abs(M2.to_scipy() - A).max() < 1e-12
    # rebuilt from scaled values -> scaled operator
    M3 = _build_op(kind, arrs, aux, jnp.asarray(2.0 * A.data), jnp.float64)
    assert abs(M3.to_scipy() - 2.0 * A).max() < 1e-12
