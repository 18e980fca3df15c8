"""Device-resident first setup + multi-chip sharded solve.

The round-2 TPU-native additions in one script:

1. ``pc.setup_device(A)`` -- pattern discovery ON the accelerator
   (strength graph, PMISR, DDC, extraction, polynomial assembly, Z, RAP
   all as XLA programs; sparse/dell.py), the analogue of the reference's
   Kokkos setup for device matrices (reference: docs/gpus.md).
2. ``pc.setup(A, mesh=...)`` -- the distributed-setup slice: device PMISR
   over the mesh + distributed TSQR power coefficients (reference:
   src/PMISR_Module.F90:476-643, src/TSQR.F90:65).
3. ``pc.solve_device(b, mesh=...)`` -- hierarchy sharded with the
   processor-agglomeration schedule, banded ppermute halo Krylov matvec
   (reference: src/AIR_MG_Setup.F90:645-907, src/Repartition.F90).

Run: python examples/ex_device_setup.py [grid_size]
(uses 8 virtual CPU devices so it works anywhere; on TPU the same code
maps onto real chips)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import jax.numpy as jnp
import pflare_tpu as pf
from pflare_tpu.parallel import make_mesh
from pflare_tpu.parallel.repartition import active_shards_schedule


def main(n_grid=64):
    A = pf.adv_diff_2d(n_grid)
    n = A.shape[0]
    print(f"2D advection, {n} unknowns on {len(jax.devices())} devices")
    opts = pf.AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99,
                         max_levels=6)

    # ~~~~~ 1. device-resident first setup ~~~~~
    t0 = time.perf_counter()
    pc_dev = pf.PCAIR(opts)
    pc_dev.setup_device(A, dtype=jnp.float32)
    print(f"device setup: {time.perf_counter()-t0:.2f}s "
          f"(includes XLA compiles), {pc_dev.n_levels} levels")
    for lvl in pc_dev.hierarchy.levels:
        print(f"  n={lvl.n:6d}  F={lvl.n_f:6d}  C={lvl.n_c:6d}  "
              f"nnz(A)={lvl.nnz_A}")
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    dtype=jnp.float32)
    x, norms = pc_dev.solve_device(b, max_it=10)
    rel = float(np.linalg.norm(A @ np.asarray(x, np.float64)
                               - np.asarray(b, np.float64))
                / np.linalg.norm(np.asarray(b)))
    print(f"device-built hierarchy solve: true rel residual {rel:.2e}")

    # ~~~~~ 2. distributed setup + 3. sharded solve ~~~~~
    mesh = make_mesh(8)
    pc = pf.PCAIR(opts)
    pc.setup(A, mesh=mesh)          # device PMISR + distributed TSQR
    sizes = [lvl.n for lvl in pc.hierarchy.levels]
    sched = active_shards_schedule(sizes, 8, opts.process_eq_limit,
                                   opts.processor_agglom_factor)
    print(f"level sizes {sizes}; active shards per level {sched}")
    b64 = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    x1, _ = pc.solve_device(b64, max_it=12)            # single device
    x2, _ = pc.solve_device(b64, max_it=12, mesh=mesh)  # sharded
    diff = float(np.abs(np.asarray(x1) - np.asarray(x2)).max())
    print(f"sharded-vs-single max abs diff: {diff:.3e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
