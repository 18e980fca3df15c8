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
    """Row-shard a device operator (ELL, DELL or DIA) if its rows divide
    the mesh; otherwise replicate."""
    from ..sparse.dia import DIA
    from ..sparse.dell import DELL

    n_dev = mesh.devices.size
    if isinstance(op, ELL):
        if op.shape[0] % n_dev == 0:
            return shard_ell(op, mesh, pad=False)
        return replicate(op, mesh)
    if isinstance(op, DELL):
        if op.data.shape[0] % n_dev == 0:
            sh = row_sharding(mesh)
            return DELL(jax.device_put(op.data, sh),
                        jax.device_put(op.cols, sh), op.n_cols)
        return replicate(op, mesh)
    if isinstance(op, DIA):
        if op.shape[0] % n_dev == 0:
            sh = NamedSharding(mesh, P(None, ROW_AXIS))
            return DIA(op.offsets, jax.device_put(op.data, sh), op.shape)
        return replicate(op, mesh)
    return replicate(op, mesh)


def _pad_ell_rows_to(op: ELL, n_pad: int) -> ELL:
    if op.shape[0] == n_pad:
        return op
    p = n_pad - op.shape[0]
    pat = op.pattern
    indptr = np.concatenate([pat.indptr, np.full(p, pat.indptr[-1])])
    new_pat = SparsityPattern(indptr, pat.indices, (n_pad, pat.shape[1]))
    # keep the original K (the padded pattern recomputes K identically)
    data = jnp.pad(op.data, ((0, p), (0, 0)))
    cols = jnp.pad(op.cols, ((0, p), (0, 0)))
    return ELL(new_pat, data, cols)


def _pad_op_rows_to(op, n_pad: int):
    from ..sparse.dia import DIA
    from ..sparse.dell import DELL, PADCOL

    if isinstance(op, ELL):
        return _pad_ell_rows_to(op, n_pad)
    if isinstance(op, DELL):
        p = n_pad - op.data.shape[0]
        if p <= 0:
            return op
        return DELL(jnp.pad(op.data, ((0, p), (0, 0))),
                    jnp.pad(op.cols, ((0, p), (0, 0)),
                            constant_values=PADCOL), op.n_cols)
    if isinstance(op, DIA):
        if op.data.shape[1] == n_pad:
            return op
        p = n_pad - op.data.shape[1]
        return DIA(op.offsets, jnp.pad(op.data, ((0, 0), (0, p))),
                   (n_pad, max(op.shape[1], n_pad)))
    return op


def _pad_inverse_rows_to(inv, n_pad: int):
    """Pad a full-space Inverse to the padded row space: matrix-free
    diagonals extend with ones (harmless divisions on zero inputs),
    assembled/diagonal values with zeros."""
    from ..inverse.build import Inverse
    from ..sparse.dia import DIA

    if inv.kind == "diagonal":
        d = inv.diag
        if d.shape[0] < n_pad:
            d = jnp.pad(d, (0, n_pad - d.shape[0]))
        return Inverse("diagonal", diag=d, meta=inv.meta)
    from ..sparse.dell import DELL as _DELL

    mat = inv.mat
    if isinstance(mat, (ELL, DIA, _DELL)):
        mat = _pad_op_rows_to(mat, n_pad)
    diag = inv.diag
    if diag is not None and diag.shape[0] < n_pad:
        diag = jnp.pad(diag, (0, n_pad - diag.shape[0]),
                       constant_values=1.0)
    return Inverse(inv.kind, mat=mat, coefficients=inv.coefficients,
                   steps=inv.steps, diag=diag, scaled=inv.scaled,
                   meta=inv.meta)


def shard_hierarchy(hierarchy, mesh: Mesh, options=None):
    """Shard each level over the mesh following the processor-agglomeration
    schedule (reference: src/AIR_MG_Setup.F90:645-907, Repartition.F90):
    levels keep ``active <= n_devices`` shards per
    ``active_shards_schedule``; rows pad to equal blocks (the reference's
    'simple' interleaved partition) so only the active shards own data, and
    a one-shard level is simply replicated (the subcomm analogue)."""
    from ..inverse.build import Inverse
    from ..sparse.dia import DIA
    from .repartition import active_shards_schedule

    opts = options if options is not None else getattr(hierarchy, "options",
                                                       None)
    n_dev = mesh.devices.size
    dev_levels = hierarchy.device_levels
    sizes = []
    for lvl in dev_levels:
        if "mask_f" in lvl:
            sizes.append(int(lvl["mask_f"].shape[0]))
        else:
            sizes.append(int(lvl["A_ff"].shape[0])
                         + int(lvl["A_fc"].shape[1]))
    if opts is not None and getattr(opts, "processor_agglom", True):
        schedule = active_shards_schedule(
            sizes, n_dev,
            process_eq_limit=getattr(opts, "process_eq_limit", 50),
            processor_agglom_factor=getattr(opts,
                                            "processor_agglom_factor", 2))
        # second trigger: the local/off-block nnz ratio (reference:
        # src/Repartition.F90:24-60 + AIR_MG_Setup.F90:645-700) -- when a
        # level's communication share grows past the ratio, halve the
        # active shards even if the row count allows more
        import scipy.sparse as _sp

        from .repartition import (local_nonlocal_nnz_ratio,
                                  should_agglomerate)

        ratio_lim = getattr(opts, "processor_agglom_ratio", 2.0)
        factor = getattr(opts, "processor_agglom_factor", 2)
        host_levels = getattr(hierarchy, "levels", [])
        for i, lvl in enumerate(host_levels):
            A_host = getattr(lvl, "A", None)
            if not _sp.issparse(A_host) or schedule[i] <= 1:
                continue
            r = local_nonlocal_nnz_ratio(A_host, schedule[i])
            if should_agglomerate(
                    sizes[i], schedule[i], r,
                    getattr(opts, "process_eq_limit", 50), ratio_lim):
                schedule[i] = max(1, schedule[i] // factor)
        # keep the schedule monotone non-increasing toward coarse levels
        for i in range(1, len(schedule)):
            schedule[i] = min(schedule[i], schedule[i - 1])
    else:
        schedule = [n_dev] * len(sizes)

    from ..sparse.dell import DELL

    out_levels = []
    for lvl, n, active in zip(dev_levels, sizes, schedule):
        def _op_shardable(v):
            if isinstance(v, Inverse):
                m = v.mat
                return m is None or isinstance(m, (ELL, DIA, DELL))
            if hasattr(v, "matvec"):
                return isinstance(v, (ELL, DIA, DELL))
            return True
        shardable = all(_op_shardable(v) for v in lvl.values())
        if active <= 1 or "mask_f" not in lvl or not shardable:
            out_levels.append(replicate(lvl, mesh))
            continue
        # equal blocks over the active shards; trailing shards own only
        # padding (active-rank reduction without changing the mesh)
        w = -(-n // active)
        n_pad = w * n_dev
        new = {}
        sh = row_sharding(mesh)
        for key, val in lvl.items():
            if isinstance(val, ELL):
                # banded level operators take the explicit neighbour
                # halo-exchange path (two ppermutes) instead of the
                # GSPMD gather (which all-gathers x); coarse levels are
                # RCM-repartitioned at setup exactly so this check passes
                # (air/hierarchy.py coarse repartition; reference:
                # src/Repartition.F90)
                from .halo import HaloELL

                try:
                    new[key] = HaloELL.from_ell(val, mesh, n_pad)
                except ValueError:
                    new[key] = _shard_op(_pad_op_rows_to(val, n_pad), mesh)
            elif isinstance(val, (DIA, DELL)):
                new[key] = _shard_op(_pad_op_rows_to(val, n_pad), mesh)
            elif key in ("mask_f", "mask_c"):
                m = jnp.pad(val, (0, n_pad - val.shape[0]))
                new[key] = jax.device_put(m, sh)
            elif hasattr(val, "kind"):          # Inverse pytree
                new[key] = _shard_inverse(
                    _pad_inverse_rows_to(val, n_pad), mesh, n_pad=n_pad)
            elif hasattr(val, "dtype"):
                new[key] = jax.device_put(val, replicated(mesh))
            else:
                new[key] = replicate(val, mesh)
        out_levels.append(new)
    coarse_inv = replicate(hierarchy.coarse_inv, mesh)
    return out_levels, coarse_inv


def _shard_inverse(inv, mesh: Mesh, n_pad: int | None = None):
    """Row-shard an Inverse's operator/diagonal where divisible."""
    from ..inverse.build import Inverse
    from ..sparse.dia import DIA
    from ..sparse.dell import DELL

    n_dev = mesh.devices.size
    diag = inv.diag
    if diag is not None and diag.shape[0] % n_dev == 0:
        diag = jax.device_put(diag, row_sharding(mesh))
    elif diag is not None:
        diag = jax.device_put(diag, replicated(mesh))
    mat = inv.mat
    if isinstance(mat, ELL) and n_pad is not None:
        from .halo import HaloELL

        try:
            mat = HaloELL.from_ell(mat, mesh, n_pad)
        except ValueError:
            mat = _shard_op(mat, mesh)
    elif isinstance(mat, (ELL, DIA, DELL)):
        mat = _shard_op(mat, mesh)
    coeffs = inv.coefficients
    if coeffs is not None:
        coeffs = jax.device_put(coeffs, replicated(mesh))
    return Inverse(inv.kind, mat=mat, coefficients=coeffs, steps=inv.steps,
                   diag=diag, scaled=inv.scaled, meta=inv.meta)
