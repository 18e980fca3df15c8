# %% [markdown]
# # Unstructured meshes: Gmsh import, DG upwind and SUPG CG FEM
#
# The reference's hardest test operators come from FEM discretisations on
# unstructured Gmsh meshes read through DMPlex (reference:
# tests/adv_dg_upwind.c, tests/adv_diff_cg_supg.c).  The same pipeline
# here: a numpy Gmsh 4.1 reader, an upwinded DG(1) assembly (broken nodal
# spaces, isoparametric hexes), and SUPG-stabilised continuous Galerkin
# advection-diffusion.

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

DATA = os.environ.get("PFLARE_DATA", "/root/reference/tests/data")

# %% [markdown]
# ## Reading a mesh

# %%
pts, cells = pf.read_gmsh(os.path.join(DATA, "square_unstruc.msh"))
print("square_unstruc:", len(pts), "points,",
      {k: v.shape for k, v in cells.items()})

# %% [markdown]
# ## DG(1) upwind advection
#
# Each cell owns its nodal DoFs; the upwind numerical flux couples cells
# across facets.  The operator is strongly asymmetric -- AIR's target
# regime.  Consistency check: A @ 1 is supported only on inflow-boundary
# DoFs and sums to the total inflow flux.

# %%
A = pf.dg1_advection_from_gmsh(os.path.join(DATA, "square_unstruc.msh"))
r = np.asarray(A @ np.ones(A.shape[0]))
print(f"DG(1): {A.shape[0]} DoFs, inflow flux sum = {r.sum():.12f} "
      f"(exact sqrt(2) = {np.sqrt(2):.12f})")

pc = pf.PCAIR(pf.AIROptions(), jit=False)
pc.setup(A)
b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
res = pc.solve(b, ksp="richardson", rtol=1e-5, max_it=4)
print("AIRG Richardson:", res.iterations, "iterations (reference cap 4)")

# %% [markdown]
# ## A genuinely hard mesh: the twisted annulus
#
# 3D hexahedra twisted along the axis with axial flow -- the advection
# characteristics wrap around the annulus, producing cycles in the
# connectivity graph (the reference's "hexs and cycles" case).

# %%
A_ann = pf.dg1_advection_from_gmsh(os.path.join(DATA, "annulus_twisted.msh"),
                                   velocity=(0.0, 0.0, 1.0))
pc = pf.PCAIR(pf.AIROptions(a_lump=True, smooth_order=(1, -1, 1)), jit=False)
pc.setup(A_ann)
b = jnp.asarray(np.random.default_rng(1).standard_normal(A_ann.shape[0]))
res = pc.solve(b, ksp="richardson", rtol=1e-5, max_it=4)
print(f"annulus: {A_ann.shape[0]} DoFs, {pc.n_levels} levels, "
      f"{res.iterations} iterations")

# %% [markdown]
# ## SUPG CG advection-diffusion and diagonal scaling
#
# The curved, unnormalised velocity field produces a badly row-scaled
# operator (the reference's "poorly scaled" test): GMRES polynomials
# degrade unless they are computed on the diagonally scaled operator
# (`diag_scale_polys`, the `-pc_air_diag_scale_polys` flag).

# %%
A_s = pf.supg_from_gmsh(os.path.join(DATA, "square_unstruc.msh"),
                        curved=True, unit_velocity=False)
d = np.abs(A_s.diagonal())
print(f"SUPG operator: diag ratio {d.max()/d.min():.0f}x")
for ds in (False, True):
    pc = pf.PCAIR(pf.AIROptions(a_lump=True, diag_scale_polys=ds), jit=False)
    pc.setup(A_s)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(A_s.shape[0]))
    res = pc.solve(b, ksp="richardson", rtol=1e-5, max_it=20)
    print(f"diag_scale_polys={ds}: {res.iterations} iterations")
