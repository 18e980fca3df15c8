import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pflare_jax_cache_tpu")
import numpy as np, jax.numpy as jnp
from pflare_tpu import PCAIR, AIROptions, InverseType, adv_diff_2d
A = adv_diff_2d(48)
pc = PCAIR(AIROptions(max_levels=4, a_lump=True, a_drop=1e-5,
                      strong_threshold=0.99,
                      coarsest_inverse_type=InverseType.NEWTON,
                      coarsest_poly_order=8,
                      coarsest_matrix_free_polys=True))
t0=time.perf_counter()
pc.setup_device(A)
print("setup_device ok:", time.perf_counter()-t0, "levels", pc.n_levels, flush=True)
b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]), dtype=jnp.float32)
x, norms = pc.solve_device(b, max_it=8)
xh = np.asarray(x, dtype=np.float64)
print("true rel:", np.linalg.norm(A @ xh - np.asarray(b, np.float64))/np.linalg.norm(np.asarray(b)))
