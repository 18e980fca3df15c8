"""Every PCPFLAREINV inverse type on the same problem (counterpart of
python/ex_pcpflareinv_options.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import pflare_tpu as pf


def main():
    A = pf.random_diag_dominant(400, 0.02, seed=3)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(400))
    for t in pf.InverseType:
        for mf in (False, True):
            if mf and t in (pf.InverseType.SAI, pf.InverseType.ISAI,
                            pf.InverseType.WJACOBI, pf.InverseType.JACOBI):
                continue
            pc = pf.PCPFLAREINV(inverse_type=t, poly_order=6, matrix_free=mf)
            pc.setup(A)
            res = pc.solve(b, rtol=1e-8, max_it=100)
            tag = "mf" if mf else "assembled"
            print(f"{t.name:16s} {tag:9s} converged={res.converged} "
                  f"its={res.iterations}")


if __name__ == "__main__":
    main()
