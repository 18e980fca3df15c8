# %% [markdown]
# # CF splittings: PMISR-DDC and friends
#
# AIR's effectiveness hinges on the F/C partition: the F-F block A_ff must
# be cheap to invert approximately.  PMISR picks an *independent set* as the
# F points (so A_ff has no strong off-diagonal couplings) and the DDC second
# pass flips the least diagonally-dominant F rows to C.

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pflare_tpu as pf
from pflare_tpu.cf import strength_matrix, pmisr, ddc
from pflare_tpu.sparse.ops import diag_dominance_ratio

A = pf.adv_diff_2d(60, curved_velocity=True)

# %% [markdown]
# ## Strength graph and first-pass PMISR

# %%
S = strength_matrix(A, theta=0.5, symmetrize=True)
cf = pmisr(S, max_luby_steps=-1)
f_mask = cf == pf.F_POINT
print(f"{f_mask.sum()} F / {(~f_mask).sum()} C")
r = diag_dominance_ratio(A, f_mask)
print(f"A_ff dominance ratio: max {r.max():.3f}, mean {r.mean():.3f}")

# %% [markdown]
# ## DDC cleanup improves A_ff conditioning

# %%
cf2, _ = ddc(A, cf.copy(), fraction_swap=0.1)
r2 = diag_dominance_ratio(A, cf2 == pf.F_POINT)
print(f"after DDC: max {r2.max():.3f}, mean {r2.mean():.3f}")

# %% [markdown]
# ## Splitting families compared inside the solver

# %%
import jax.numpy as jnp

b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
for t in (pf.CFSplittingType.PMISR_DDC, pf.CFSplittingType.PMIS,
          pf.CFSplittingType.PMIS_DIST2, pf.CFSplittingType.AGG):
    pc = pf.PCAIR(pf.AIROptions(cf_splitting_type=t), jit=False)
    pc.setup(A)
    res = pc.solve(b, rtol=1e-8, max_it=40)
    s = pc.stats()
    print(f"{t.name:12s}: {res.iterations:2d} its, "
          f"grid cx {s['grid_complexity']:.2f}")

# %% [markdown]
# ## Diagonally-dominant submatrix extraction
#
# The standalone `compute_diag_dom_submatrix` repeatedly splits until every
# remaining row is diagonally dominant below the target ratio -- useful for
# building block preconditioners (reference: docs/new_methods.md:136-168).

# %%
sub, idx = pf.compute_diag_dom_submatrix(A, max_dd_ratio=0.6)
rs = diag_dominance_ratio(sub, np.ones(sub.shape[0], dtype=bool))
print(f"{sub.shape[0]} of {A.shape[0]} rows kept, max ratio {rs.max():.3f}")
