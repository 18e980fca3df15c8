"""Measure the CPU baseline anchor for bench.py's ``vs_baseline``.

Runs scipy's ILU-preconditioned GMRES (and SuperLU as a direct-solve
cross-check) on the EXACT system bench.py times: the 512^2 2D
advection-diffusion FD operator (reference medium scaling study,
reference: tests/Makefile:1117-1140), one process, rtol 1e-10.

The best ILU+GMRES DoF/s becomes BASELINE_DOF_PER_S in bench.py -- a real,
reproducible single-core CPU iterative-solver anchor replacing round 1/2's
assumed 1e6 DoF/s (see BASELINE.md "Benchmark denominator").

Run:  python tools/measure_baseline.py [N]
"""

import sys
import time

import numpy as np
import scipy.sparse.linalg as spla

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from pflare_tpu import adv_diff_2d  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    A = adv_diff_2d(N).tocsc()
    n = A.shape[0]
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)

    # best-of-6: the SAME steady-state window bench.py uses for the
    # subject (this VM's first-touch page-fault penalty decays over the
    # first 3-4 runs), so anchor and subject are measured symmetrically
    runs_lu = []
    for _ in range(6):
        t0 = time.perf_counter()
        lu = spla.splu(A)
        x = lu.solve(b)
        runs_lu.append(time.perf_counter() - t0)
    best_lu = min(runs_lu)
    res = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    print(f"superlu {N}^2: {best_lu:.3f}s = {n / best_lu:.0f} DoF/s "
          f"(rel res {res:.1e}; runs {[round(t, 3) for t in runs_lu]})")

    runs_it = []
    for _ in range(6):
        t0 = time.perf_counter()
        ilu = spla.spilu(A, drop_tol=1e-4, fill_factor=10)
        M = spla.LinearOperator((n, n), ilu.solve)
        x, info = spla.gmres(A, b, rtol=1e-10, restart=30, maxiter=100, M=M)
        runs_it.append(time.perf_counter() - t0)
        assert info == 0, f"GMRES failed: {info}"
    best_it = min(runs_it)
    res = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    print(f"ilu(1e-4)+gmres {N}^2: {best_it:.3f}s = {n / best_it:.0f} DoF/s "
          f"(rel res {res:.1e}; runs {[round(t, 3) for t in runs_it]})")
    print(f"-> BASELINE_DOF_PER_S = {n / best_it:.0f}")


if __name__ == "__main__":
    main()
