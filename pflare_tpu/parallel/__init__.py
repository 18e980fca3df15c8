from .tsqr import tsqr_r, make_qr_reduce
from .halo import HaloELL, HaloSpMV
from .repartition import (
    local_nonlocal_nnz_ratio,
    should_agglomerate,
    active_shards_schedule,
    interleaved_partition,
)
from .mesh import (
    make_mesh,
    row_sharding,
    replicated,
    shard_ell,
    shard_vec,
    replicate,
    shard_hierarchy,
    ROW_AXIS,
)

__all__ = [
    "tsqr_r",
    "HaloSpMV",
    "HaloELL",
    "make_qr_reduce",
    "local_nonlocal_nnz_ratio",
    "should_agglomerate",
    "active_shards_schedule",
    "interleaved_partition",
    "make_mesh",
    "row_sharding",
    "replicated",
    "shard_ell",
    "shard_vec",
    "replicate",
    "shard_hierarchy",
    "ROW_AXIS",
]
