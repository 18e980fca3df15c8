# %% [markdown]
# # Multi-chip AIR: device meshes, sharded SpMV, distributed TSQR
#
# The reference parallelises by distributing matrix rows over MPI ranks
# with PetscSF halo exchanges and a custom-reduction TSQR (tutorial
# counterpart of the reference's notebooks/; design map in SURVEY.md §2.4).
# On TPU the same decomposition is a 1-D `jax.sharding.Mesh` over row
# blocks: XLA inserts the collectives, reductions are `psum`s, and for
# banded partitions the halo exchange can be hand-scheduled as two
# `ppermute` neighbour shifts over ICI.
#
# This notebook runs on 8 *virtual* CPU devices so it works anywhere; on a
# TPU pod slice the same code maps the row axis onto real chips.

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import pflare_tpu as pf
from pflare_tpu.parallel import (
    make_mesh, shard_ell, shard_vec, shard_hierarchy, tsqr_r, HaloSpMV,
)

print("devices:", jax.devices())

# %% [markdown]
# ## A row-sharded operator
#
# `shard_ell` places row blocks of the ELL operator on the mesh; a matvec
# under `jit` then runs SPMD with XLA choosing the x-gather collectives
# (the GSPMD path).

# %%
mesh = make_mesh(8)
A = pf.adv_diff_2d(64)
E = shard_ell(pf.ELL.from_scipy(A), mesh)
x = shard_vec(jnp.ones(A.shape[0]), mesh)
y = jax.jit(lambda E, x: E.matvec(x))(E, x)
print("sharded SpMV matches scipy:",
      bool(np.allclose(np.asarray(y)[: A.shape[0]], A @ np.ones(A.shape[0]))))

# %% [markdown]
# ## Hand-scheduled halo exchange
#
# For banded partitions (structured levels, RCM-ordered meshes) the
# reference's PetscSF neighbour exchange maps onto exactly two `ppermute`
# shifts: each shard receives one slab from each neighbour and multiplies
# with locally rewritten column indices.  No all-gather.

# %%
h = pf.parallel.HaloSpMV(A, mesh) if hasattr(pf, "parallel") else HaloSpMV(A, mesh)
xr = np.random.default_rng(0).standard_normal(A.shape[0])
print("halo SpMV max err:", float(np.abs(np.asarray(h @ xr) - A @ xr).max()))

# %% [markdown]
# ## Distributed TSQR
#
# The power-basis GMRES coefficients need one tall-skinny QR of the Krylov
# block.  The reference reduces per-rank R factors with a deliberately
# non-commutative MPI op for bitwise reproducibility; here each shard QRs
# its rows and the small R factors are all-gathered in axis order
# (deterministic) and combined.

# %%
K = jnp.asarray(np.random.default_rng(1).standard_normal((1024, 8)))
R = tsqr_r(jax.device_put(K, jax.sharding.NamedSharding(
    mesh, jax.sharding.PartitionSpec("rows", None))), mesh)
R_ref = np.linalg.qr(np.asarray(K), mode="r")
# R is unique up to row signs
print("TSQR |R| matches:",
      bool(np.allclose(np.abs(np.asarray(R)), np.abs(R_ref), atol=1e-10)))

# %% [markdown]
# ## A sharded hierarchy
#
# `shard_hierarchy` places every level's operators on the mesh; levels
# smaller than `process_eq_limit * n_devices` replicate (the reference's
# processor agglomeration).  The V-cycle then runs SPMD end-to-end.

# %%
pc = pf.PCAIR(pf.AIROptions(max_levels=4), jit=False)
pc.setup(A)
levels, coarse_inv = shard_hierarchy(pc.hierarchy, mesh)
from pflare_tpu.air.smooth import vcycle_kaskade

b = shard_vec(jnp.ones(A.shape[0]), mesh)
z = jax.jit(lambda lv, ci, b: vcycle_kaskade(lv, ci, b, (2,)))(
    levels, coarse_inv, b)
print("sharded V-cycle output norm:", float(jnp.linalg.norm(z)))
