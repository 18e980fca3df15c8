"""AIRG on 2D upwinded advection (the reference's flagship use case,
counterpart of python/ex2.py + the adv_diff_fd driver).

Run: python examples/ex_airg_advection.py [grid_size]
"""

import sys

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import pflare_tpu as pf


def main(n_grid=100):
    A = pf.adv_diff_2d(n_grid)
    print(f"2D advection, {A.shape[0]} unknowns, {A.nnz} nonzeros")

    pc = pf.PCAIR(pf.AIROptions(a_lump=True, a_drop=1e-5,
                                strong_threshold=0.99))
    pc.setup(A)
    pc.view()

    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    res = pc.solve(b, rtol=1e-10, atol=1e-50, side="right")
    print(f"converged={res.converged} in {res.iterations} iterations")
    print("residual history:", ["%.2e" % v for v in res.history])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
