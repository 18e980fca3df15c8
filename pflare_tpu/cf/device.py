"""Device-side CF splitting: jitted PMISR over the padded neighbour array.

The parity item for the reference's Kokkos device splitting
(reference: src/PMISR_Modulek.kokkos.cxx): for very large problems the Luby
rounds run on device with the strength graph resident as padded ELL arrays.
The fixed-step mode (`max_luby_steps > 0`) is a short static chain of
gathers + row reductions -- no data-dependent control flow, no host syncs
(the reference notes 2-3 rounds decide >99% of nodes,
src/PMISR_Module.F90:466-473).

Returns the same markers as the host implementation given the same measure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..params import C_POINT, F_POINT


def graph_to_device(S_sym: sp.csr_matrix):
    """Symmetric strength graph -> (cols [n,K] int32, mask [n,K] bool)."""
    S = sp.csr_matrix(S_sym)
    S.sort_indices()
    n = S.shape[0]
    row_len = np.diff(S.indptr)
    K = max(int(row_len.max()) if S.nnz else 1, 1)
    cols = np.zeros((n, K), dtype=np.int32)
    mask = np.zeros((n, K), dtype=bool)
    rows = np.repeat(np.arange(n), row_len)
    offs = np.arange(S.nnz) - np.repeat(S.indptr[:-1], row_len)
    cols[rows, offs] = S.indices.astype(np.int32)
    mask[rows, offs] = True
    return jnp.asarray(cols), jnp.asarray(mask)


@partial(jax.jit, static_argnames=("max_luby_steps", "zero_measure_c_point",
                                   "pmis"))
def pmisr_device(cols, mask, measure, cf0, max_luby_steps: int = 3,
                 zero_measure_c_point: bool = False, pmis: bool = False):
    """Jitted PMISR Luby rounds (fixed step count).

    cols/mask: padded neighbour arrays of the SYMMETRIC strength graph.
    measure: [n] float (rand + degree, negated for PMIS by the caller).
    cf0: [n] int32 initial markers (0 = undecided).
    """
    n = measure.shape[0]
    gidx = jnp.arange(n, dtype=jnp.int32)
    cf = cf0.astype(jnp.int32)
    assigned = cf != 0

    zero_nodes = (~assigned) & (jnp.abs(measure) < 1)
    # pre-flip markers for PMIS (caller negates afterwards), matching the
    # host path (reference: src/PMISR_Module.F90:398-437)
    if zero_measure_c_point:
        zero_val = F_POINT if pmis else C_POINT
    else:
        zero_val = C_POINT if pmis else F_POINT
    cf = jnp.where(zero_nodes, zero_val, cf)
    assigned = assigned | zero_nodes

    def round_fn(carry, _):
        cf, assigned = carry
        nb_meas = measure[cols]
        active = mask & ~assigned[cols]
        lose = active & (
            (measure[:, None] > nb_meas)
            | ((measure[:, None] == nb_meas) & (gidx[:, None] > cols))
        )
        in_set = ~assigned & ~jnp.any(lose, axis=1)
        cf = jnp.where(in_set, F_POINT, cf)
        assigned = assigned | in_set
        # neighbours of the new set become assigned (C at the end);
        # the graph is symmetric so a gather doubles as the scatter
        nb_of_new = jnp.any(mask & in_set[cols], axis=1)
        assigned = assigned | nb_of_new
        return (cf, assigned), None

    # while_loop with early exit: converged graphs stop, and the host
    # convention max_luby_steps <= 0 ("iterate until done") maps to a
    # cap of 64 rounds -- Luby terminates in O(log n) w.h.p., and any
    # node still undecided afterwards becomes C exactly like the
    # fixed-step reference mode (a lax.scan with length=-1 raised)
    cap = max_luby_steps if max_luby_steps > 0 else 64

    def cond(c):
        cf, assigned, r = c
        return (~jnp.all(assigned)) & (r < cap)

    def body(c):
        cf, assigned, r = c
        (cf, assigned), _ = round_fn((cf, assigned), None)
        return cf, assigned, r + 1

    cf, assigned, _ = jax.lax.while_loop(
        cond, body, (cf, assigned, jnp.int32(0)))
    cf = jnp.where(cf == 0, C_POINT, cf)
    return cf


def pmisr_on_device(S: sp.csr_matrix, max_luby_steps: int = 3,
                    pmis: bool = False, seed: int = 5) -> np.ndarray:
    """End-to-end device PMISR from a host strength matrix (symmetrizes the
    pattern like the host path)."""
    G = sp.csr_matrix(S + S.T)
    G.sort_indices()
    cols, mask = graph_to_device(G)
    rng = np.random.default_rng(seed)
    measure = rng.random(S.shape[0]) + np.diff(S.indptr)
    if pmis:
        measure = -measure
    cf = pmisr_device(cols, mask, jnp.asarray(measure),
                      jnp.zeros(S.shape[0], dtype=jnp.int32),
                      max_luby_steps=max_luby_steps, pmis=pmis)
    cf = np.asarray(cf, dtype=np.int64)
    if pmis:
        cf = -cf
    return cf
