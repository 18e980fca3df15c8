"""Iteration-count scaling study: AIRG stays flat as the grid refines
(counterpart of the reference's run_tests_medium group,
reference: tests/Makefile:1117-1140)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import pflare_tpu as pf


def main(sizes=(100, 200, 400)):
    print(f"{'grid':>8s} {'dofs':>9s} {'its':>4s} {'grid cx':>8s} "
          f"{'setup s':>8s} {'solve s':>8s}")
    for n in sizes:
        A = pf.adv_diff_2d(n)
        b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
        t0 = time.perf_counter()
        pc = pf.PCAIR(pf.AIROptions(a_lump=True, a_drop=1e-5,
                                    strong_threshold=0.99), jit=False)
        pc.setup(A)
        t_setup = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = pc.solve(b, rtol=1e-10, atol=1e-50, side="right", max_it=6)
        t_solve = time.perf_counter() - t0
        s = pc.stats()
        flag = "" if res.converged else "  NOT CONVERGED"
        print(f"{n:>5d}^2 {A.shape[0]:>9d} {res.iterations:>4d} "
              f"{s['grid_complexity']:>8.2f} {t_setup:>8.2f} "
              f"{t_solve:>8.2f}{flag}")


if __name__ == "__main__":
    main(tuple(int(a) for a in sys.argv[1:]) or (100, 200, 400))
