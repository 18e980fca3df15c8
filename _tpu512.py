import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pflare_jax_cache")
import numpy as np, jax.numpy as jnp
from pflare_tpu import AIROptions, InverseType, adv_diff_2d
from pflare_tpu.air.device_setup import setup_hierarchy_device
A = adv_diff_2d(512)
opts = AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99,
                  max_levels=8, coarsest_inverse_type=InverseType.NEWTON,
                  coarsest_poly_order=16, coarsest_matrix_free_polys=True)
t0=time.perf_counter()
h = setup_hierarchy_device(A, opts, dtype=jnp.float32)
print("cold:", time.perf_counter()-t0, "levels:", h.n_levels, flush=True)
for lvl in h.levels:
    print(f"  n={lvl.n} n_f={lvl.n_f} nnzA={lvl.nnz_A}", flush=True)
t0=time.perf_counter()
h2 = setup_hierarchy_device(A, opts, dtype=jnp.float32)
print("warm:", time.perf_counter()-t0, flush=True)
# solve
from pflare_tpu.air.smooth import vcycle_kaskade
from pflare_tpu.solvers.jitted import richardson_fixed
b = jnp.asarray(np.random.default_rng(1).standard_normal(A.shape[0]), dtype=jnp.float32)
@jax.jit
def solve(top, levels, ci, b):
    return richardson_fixed(top.matvec, lambda r: vcycle_kaskade(levels, ci, r, opts.smooth_order), b, 10)
x, norms = solve(h.top_A, h.device_levels, h.coarse_inv, b); x.block_until_ready()
t0=time.perf_counter()
x, norms = solve(h.top_A, h.device_levels, h.coarse_inv, b); x.block_until_ready()
print("solve:", time.perf_counter()-t0, flush=True)
xh = np.asarray(x, dtype=np.float64)
print("true rel:", np.linalg.norm(A @ xh - np.asarray(b, np.float64))/np.linalg.norm(np.asarray(b)))
