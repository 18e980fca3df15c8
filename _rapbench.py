import time
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, scipy.sparse as sp
import pflare_tpu.native as native
from pflare_tpu import PCAIR, AIROptions, InverseType, adv_diff_2d

# capture real R, AP at each level
calls = []
orig = native.spgemm_drop_native
def spy(R, B, tol, relative, lump):
    out = orig(R, B, tol, relative, lump)
    calls.append((R.copy(), B.copy(), tol, relative, lump))
    return out
native.spgemm_drop_native = spy
import pflare_tpu.air.operators as O
O.spgemm_drop_native = spy
import pflare_tpu.air.hierarchy as H
A = adv_diff_2d(512)
opts = AIROptions(a_lump=True, a_drop=1e-5, strong_threshold=0.99,
                  max_levels=8, coarsest_inverse_type=InverseType.NEWTON,
                  coarsest_poly_order=16, coarsest_matrix_free_polys=True)
pc = PCAIR(opts); pc.setup(A)
native.spgemm_drop_native = orig

tot = 0.0
for (R, B, tol, rel, lump) in calls:
    ts = []
    for _ in range(2):
        t0=time.perf_counter(); C1 = orig(R, B, tol, rel, lump); ts.append(time.perf_counter()-t0)
    t_stamp = min(ts)
    # scipy product + drop two-step for comparison
    from pflare_tpu.sparse.ops import remove_small_from_sparse
    ts = []
    for _ in range(2):
        t0=time.perf_counter()
        P2 = sp.csr_matrix(R @ B); P2.sort_indices()
        C2 = remove_small_from_sparse(P2, tol, relative_max_row_tol=1, lump=lump)
        ts.append(time.perf_counter()-t0)
    t_scipy = min(ts)
    ub = int(np.diff(B.indptr)[R.indices].sum()) if R.nnz else 0
    tot += min(t_stamp, t_scipy)
    print(f"triples={ub:9d} stamp={t_stamp*1e3:7.1f}ms scipy2step={t_scipy*1e3:7.1f}ms  kept={C1.nnz}")
print("best-mix total:", tot)
