"""Setup reuse across matrix re-assemblies (counterpart of
tests/reuse_preconditioner.c + docs/reuse.md)."""

import time

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
    A = pf.adv_diff_2d(100)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))

    pc = pf.PCAIR(pf.AIROptions(reuse_sparsity=True), jit=False)
    t0 = time.perf_counter()
    pc.setup(A)
    t_full = time.perf_counter() - t0
    its0 = pc.solve(b, rtol=1e-8).iterations

    # "time step": same pattern, perturbed values
    A2 = A.copy()
    A2.data = A2.data * (1.0 + 0.01 * np.sin(np.arange(A2.nnz)))
    t0 = time.perf_counter()
    pc.setup(A2, structure="same")
    t_reuse = time.perf_counter() - t0
    its1 = pc.solve(b, rtol=1e-8).iterations

    print(f"full setup   {t_full:.3f}s, solve {its0} its")
    print(f"reuse setup  {t_reuse:.3f}s ({t_full / t_reuse:.1f}x faster), "
          f"solve {its1} its")

    # freeze semantics: no re-setup at all
    pc.freeze(True)
    t0 = time.perf_counter()
    pc.setup(A2)
    print(f"frozen setup {time.perf_counter() - t0:.6f}s (no-op)")


if __name__ == "__main__":
    main()
