"""Measure SpMV / fused-smooth variants on the TPU (VERDICT #10: Pallas
only where it pays -- this is the measurement).

Amortised timing: each variant runs INSIDE one jitted lax.scan of many
iterations, so tunnel dispatch latency cancels and per-op device time is
what's measured.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pflare_jax_cache")
import jax.numpy as jnp
import numpy as np

from pflare_tpu import AIROptions, adv_diff_2d
from pflare_tpu.sparse import ELL
from pflare_tpu.sparse.dia import DIA

N = 512
ITS = 200
A = adv_diff_2d(N)
n = A.shape[0]
x0 = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                 dtype=jnp.float32)

ell = ELL.from_scipy(A, dtype=jnp.float32)
dia = DIA.from_scipy(A, dtype=jnp.float32)


def bench(name, op):
    @jax.jit
    def run(op, x):
        def body(x, _):
            y = op.matvec(x)
            return y / (jnp.max(jnp.abs(y)) + 1.0), None
        x, _ = jax.lax.scan(body, x, None, length=ITS)
        return x

    y = run(op, x0)
    float(jnp.sum(y))                 # full value sync (tunnel-safe)
    t0 = time.perf_counter()
    y = run(op, x0)
    s_chk = float(jnp.sum(y))         # forces execution + d2h
    dt = (time.perf_counter() - t0) / ITS
    gbs = (A.nnz * 8 + n * 8) / dt / 1e9   # rough bytes moved per matvec
    print(f"{name:22s} {dt*1e6:8.1f} us/matvec  ~{gbs:6.1f} GB/s")
    return dt


t_ell = bench("ELL gather", ell)
t_dia = bench("DIA slices", dia)

# ~~~~~ Pallas fused DIA smoothing step: x + M (t - A x) in one kernel ~~~~~
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offs_a = np.asarray(dia.offsets)
    d_np = A.diagonal()
    Minv = np.where(d_np != 0, 1.0 / d_np, 0.0).astype(np.float32)
    PAD = int(max(abs(offs_a.min()), abs(offs_a.max())))
    n_pad = ((n + 2 * PAD + 127) // 128) * 128

    R128 = n_pad // 128
    a_data = np.zeros((len(offs_a), R128, 128), dtype=np.float32)
    a_data[:, :, :].reshape(len(offs_a), -1)[:, PAD:PAD + n] = \
        np.asarray(dia.data)
    a_dev = jnp.asarray(a_data)
    m_dev = jnp.asarray(
        np.pad(Minv, (PAD, n_pad - n - PAD)).reshape(R128, 128))

    def flat_shift(x2d, off):
        """roll(flatten(x), -off) on the [R, 128] layout: row roll + lane
        splice of two row-shifted copies (pure VPU ops, no relayout)."""
        q, sft = divmod(int(off), 128)
        a = jnp.roll(x2d, -q, axis=0)
        if sft == 0:
            return a
        b = jnp.roll(x2d, -(q + 1), axis=0)
        return jnp.concatenate([a[:, sft:], b[:, :sft]], axis=1)

    def smooth_kernel(x_ref, t_ref, a_ref, m_ref, o_ref):
        # r = t - A x (DIA), y = x + Minv r; offsets unrolled statically
        x = x_ref[:]
        r = t_ref[:]
        for k, off in enumerate(offs_a):
            r = r - a_ref[k] * flat_shift(x, off)
        o_ref[:] = x + m_ref[:] * r

    @jax.jit
    def run_pallas(x, t, a, m):
        def body(x, _):
            y = pl.pallas_call(
                smooth_kernel,
                out_shape=jax.ShapeDtypeStruct((R128, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, t, a, m)
            return y / (jnp.max(jnp.abs(y)) + 1.0), None
        x, _ = jax.lax.scan(body, x, None, length=ITS)
        return x

    xp = jnp.pad(x0, (PAD, n_pad - n - PAD)).reshape(R128, 128)
    tp = jnp.zeros_like(xp)
    y = run_pallas(xp, tp, a_dev, m_dev)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    y = run_pallas(xp, tp, a_dev, m_dev)
    float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / ITS
    print(f"{'Pallas fused smooth':22s} {dt*1e6:8.1f} us/step   "
          f"(= matvec + inverse apply + 2 axpy fused)")

    # XLA equivalent of the same fused step for comparison
    @jax.jit
    def run_xla(x, t, a, m):
        def body(x, _):
            r = t
            for k, off in enumerate(offs_a):
                r = r - a[k] * flat_shift(x, off)
            y = x + m * r
            return y / (jnp.max(jnp.abs(y)) + 1.0), None
        x, _ = jax.lax.scan(body, x, None, length=ITS)
        return x

    y = run_xla(xp, tp, a_dev, m_dev)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    y = run_xla(xp, tp, a_dev, m_dev)
    float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / ITS
    print(f"{'XLA fused smooth':22s} {dt*1e6:8.1f} us/step")
except Exception as e:
    print("pallas probe failed:", repr(e))
