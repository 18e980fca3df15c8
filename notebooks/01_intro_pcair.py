# %% [markdown]
# # Introduction: solving advection with AIR reduction multigrid
#
# Classical multigrid fails on strongly asymmetric systems -- advection,
# streaming, space-time problems.  PCAIR builds a *reduction* multigrid with
# an Approximate Ideal Restriction: the restrictor annihilates the
# fine-grid influence exactly in the ideal limit, so iteration counts stay
# flat as the problem grows (tutorial counterpart of the reference's
# notebooks/).
#
# This walkthrough runs on CPU in float64.

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

# %% [markdown]
# ## The problem: 2D upwinded advection
#
# Pure advection at angle theta = pi/4, Dirichlet inflow on the left/bottom,
# outflow on the top/right.  The matrix is a lower-triangular-ish stencil --
# the classic case where Gauss-Seidel-in-flow-order would work but nothing
# symmetric does.

# %%
A = pf.adv_diff_2d(100)
print(A.shape, A.nnz, "nonzeros")

# %% [markdown]
# ## Unpreconditioned GMRES stagnates

# %%
E = pf.ELL.from_scipy(A)
b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
res = pf.gmres(E, b, rtol=1e-8, max_it=60)
print("no PC:", res.converged, res.iterations, "its")

# %% [markdown]
# ## AIRG: iteration counts flat in problem size

# %%
for n in (50, 100, 150):
    An = pf.adv_diff_2d(n)
    pc = pf.PCAIR(pf.AIROptions(a_lump=True, a_drop=1e-5,
                                strong_threshold=0.99), jit=False)
    pc.setup(An)
    bn = jnp.asarray(np.random.default_rng(0).standard_normal(An.shape[0]))
    r = pc.solve(bn, rtol=1e-10, atol=1e-50, side="right")
    s = pc.stats()
    print(f"n={n}^2: {r.iterations} its, grid cx {s['grid_complexity']:.2f}, "
          f"levels {pc.n_levels}")

# %% [markdown]
# ## What the hierarchy looks like

# %%
pc.view()
