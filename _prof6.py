import os, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from pflare_tpu import PCAIR, AIROptions, InverseType, adv_diff_2d
from pflare_tpu.utils.timers import _TIMERS as TIMERS, _COUNTS
A = adv_diff_2d(512)
opts = AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99,
                  max_levels=8, coarsest_inverse_type=InverseType.NEWTON,
                  coarsest_poly_order=16, coarsest_matrix_free_polys=True)
pc = PCAIR(opts, dtype=jnp.float32); pc.setup(A)
best = 1e9
for _ in range(2):
    TIMERS.clear(); _COUNTS.clear()
    t0=time.perf_counter()
    pc2 = PCAIR(opts, dtype=jnp.float32); pc2.setup(A)
    tt = time.perf_counter()-t0
    best = min(best, tt)
print("warm best:", best)
for k,v in sorted(TIMERS.items(), key=lambda kv: -kv[1])[:6]:
    print(f"  {k:16s} {v:.3f}")
