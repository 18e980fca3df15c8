"""Polynomial-coefficient checkpoint/restore protocol
(counterpart of python/ex6f_getcoeffs.py; reference: tests/ex6_getcoeffs.c,
src/PCPFLAREINV.c:484-563): extract the GMRES-polynomial coefficients from
a configured preconditioner and rebuild an identical one from them --
reconstructing a preconditioner across processes or runs without
re-running the coefficient iteration."""

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
    A = pf.adv_1d(400)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))

    # one-level PFLAREINV: get/set on the PC
    pc = pf.PCPFLAREINV(matrix_free=True, poly_order=10)
    pc.setup(A)
    coeffs = pc.get_poly_coeffs()
    print(f"extracted {len(coeffs)} coefficients: {np.asarray(coeffs)[:4]} ...")

    pc2 = pf.PCPFLAREINV(matrix_free=True, poly_order=10)
    pc2.set_poly_coeffs(coeffs)      # injected: setup skips the iteration
    pc2.setup(A)
    y1, y2 = np.asarray(pc.apply(b)), np.asarray(pc2.apply(b))
    print("restored preconditioner identical:",
          bool(np.allclose(y1, y2, atol=1e-14)))

    # per-level coefficients of a full AIR hierarchy
    pcair = pf.PCAIR(pf.AIROptions(max_levels=4), jit=False)
    pcair.setup(pf.adv_diff_2d(32))
    for lvl in range(pcair.n_levels - 1):
        c = pcair.get_poly_coefficients(lvl)
        if c is not None:
            print(f"level {lvl}: order-{len(np.asarray(c).ravel()) - 1} "
                  f"smoothing polynomial")
        else:
            print(f"level {lvl}: diagonal A_ff (MATDIAGONAL fast path, "
                  "no polynomial)")


if __name__ == "__main__":
    main()
