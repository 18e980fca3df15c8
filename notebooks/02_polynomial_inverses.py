# %% [markdown]
# # GMRES polynomial approximate inverses (PCPFLAREINV)
#
# A GMRES polynomial q(A) minimises ||b - A q(A) b|| over polynomials of a
# fixed degree: the best one-shot Krylov approximation to A^-1.  Three bases
# trade stability against communication:
#
# - **power**: one QR reduction total (communication-avoiding); stable to
#   ~order 10
# - **arnoldi**: one reduction per order; stable higher
# - **newton**: applied as a product over harmonic-Ritz roots
#   (Leja-ordered, extra roots added for conditioning); stable to order
#   100+, and matrix-free application needs no dot products at all --
#   ideal for a multigrid coarse solve.

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import pflare_tpu as pf

A = pf.random_diag_dominant(500, 0.02, seed=1)
E = pf.ELL.from_scipy(A)
b = jnp.asarray(np.random.default_rng(0).standard_normal(500))

# %% [markdown]
# ## Iteration counts vs basis and order

# %%
for t in (pf.InverseType.POWER, pf.InverseType.ARNOLDI, pf.InverseType.NEWTON):
    for order in (2, 6, 12):
        inv = pf.build_inverse(E, t, poly_order=order, matrix_free=True,
                               A_scipy=A)
        r = pf.gmres(E, b, M=inv.apply, rtol=1e-8, max_it=100)
        print(f"{t.name:8s} order {order:2d}: {r.iterations} its")

# %% [markdown]
# ## Assembled fixed-sparsity inverses
#
# Assembling q(A) with every power restricted to the sparsity of
# A^`sparsity_order` gives a single-SpMV application at bounded storage --
# the smoother AIRG uses on every level.

# %%
inv = pf.build_inverse(E, pf.InverseType.ARNOLDI, poly_order=6,
                       sparsity_order=1, A_scipy=A)
print("assembled nnz:", inv.mat.nnz, "vs A nnz:", A.nnz)
r = pf.gmres(E, b, M=inv.apply, rtol=1e-8, max_it=100)
print("assembled, sparsity 1:", r.iterations, "its")

# %% [markdown]
# ## Coefficient save/restore
#
# Coefficients can be extracted and re-injected to reproduce a
# preconditioner exactly (e.g. across processes).

# %%
pc = pf.PCPFLAREINV(matrix_free=True)
pc.setup(A)
coeffs = pc.get_poly_coeffs()
print("saved coefficients:", np.round(coeffs, 4))
