"""Device-mesh sharding: domain decomposition over matrix rows.

The reference's only parallelism is row distribution over MPI ranks
(reference: SURVEY.md §2.4, src/PMISR_Module.F90:174-180).  The TPU-native
mapping is a 1-D ``jax.sharding.Mesh`` axis over row blocks: ELL value/cols
arrays and vectors are sharded by rows, and XLA inserts the halo collectives
for the x-gather in SpMV (the PetscSF/VecScatter analogue).  Reductions
(norms, dot products, the TSQR R-combine) become psums over the axis.

Shard agglomeration (the reference's processor agglomeration,
src/Repartition.F90) falls out naturally: coarse levels smaller than
``process_eq_limit * n_devices`` are simply replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sparse import ELL
from ..sparse.pattern import SparsityPattern

ROW_AXIS = "rows"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ROW_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _pad_rows(pattern: SparsityPattern, multiple: int) -> SparsityPattern:
    """Pad the row count to a multiple (empty padded rows)."""
    n = pattern.shape[0]
    n_pad = (-n) % multiple
    if n_pad == 0:
        return pattern
    indptr = np.concatenate(
        [pattern.indptr, np.full(n_pad, pattern.indptr[-1])]
    )
    return SparsityPattern(indptr, pattern.indices,
                           (n + n_pad, pattern.shape[1]))


def shard_ell(A: ELL, mesh: Mesh, pad: bool = True) -> ELL:
    """Shard an ELL matrix's rows over the mesh.  If rows don't divide the
    axis size, empty rows are padded on (SpMV output must then be sliced
    back by the caller -- pcair keeps original row counts level-side)."""
    n_dev = mesh.devices.size
    n = A.shape[0]
    if n % n_dev != 0:
        if not pad:
            raise ValueError("rows not divisible by mesh size")
        pattern = _pad_rows(A.pattern, n_dev)
        data = jnp.zeros((pattern.shape[0], pattern.K), dtype=A.dtype)
        data = data.at[:n, : A.pattern.K].set(A.data)
        cols = jnp.zeros((pattern.shape[0], pattern.K), dtype=A.cols.dtype)
        cols = cols.at[:n, : A.pattern.K].set(A.cols)
        A = ELL(pattern, data, cols)
    sh = row_sharding(mesh)
    return ELL(
        A.pattern,
        jax.device_put(A.data, sh),
        jax.device_put(A.cols, sh),
    )


def shard_vec(x, mesh: Mesh, pad: bool = True):
    n_dev = mesh.devices.size
    n = x.shape[0]
    if n % n_dev != 0:
        if not pad:
            raise ValueError("length not divisible by mesh size")
        x = jnp.concatenate([x, jnp.zeros((-n) % n_dev, dtype=x.dtype)])
    return jax.device_put(x, row_sharding(mesh))


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sh)
        if isinstance(leaf, (jnp.ndarray, jax.Array)) else leaf,
        tree,
    )


def _shard_op(op, mesh: Mesh):
    """Row-shard a device operator (ELL or DIA) if its rows divide the
    mesh; otherwise replicate."""
    from ..sparse.dia import DIA

    n_dev = mesh.devices.size
    if isinstance(op, ELL):
        if op.shape[0] % n_dev == 0:
            return shard_ell(op, mesh, pad=False)
        return replicate(op, mesh)
    if isinstance(op, DIA):
        if op.shape[0] % n_dev == 0:
            sh = NamedSharding(mesh, P(None, ROW_AXIS))
            return DIA(op.offsets, jax.device_put(op.data, sh), op.shape)
        return replicate(op, mesh)
    return replicate(op, mesh)


def shard_hierarchy(hierarchy, mesh: Mesh, min_rows_per_device: int = 1):
    """Shard each level's row-dimension operators over the mesh; replicate
    levels too small to benefit (shard agglomeration)."""
    from ..sparse.dia import DIA

    n_dev = mesh.devices.size
    out_levels = []
    for lvl in hierarchy.device_levels:
        if "mask_f" in lvl:
            n = int(lvl["mask_f"].shape[0])
        else:
            n = int(lvl["A_ff"].shape[0]) + int(lvl["A_fc"].shape[1])
        if n < min_rows_per_device * n_dev or n % n_dev != 0:
            out_levels.append(replicate(lvl, mesh))
            continue
        new = {}
        for key, val in lvl.items():
            if isinstance(val, (ELL, DIA)):
                new[key] = _shard_op(val, mesh)
            elif key in ("mask_f", "mask_c") and val.shape[0] % n_dev == 0:
                new[key] = jax.device_put(val, row_sharding(mesh))
            elif hasattr(val, "dtype"):
                new[key] = jax.device_put(val, replicated(mesh))
            else:
                new[key] = replicate(val, mesh)
        out_levels.append(new)
    coarse_inv = replicate(hierarchy.coarse_inv, mesh)
    return out_levels, coarse_inv
