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
    "make_mesh",
    "row_sharding",
    "replicated",
    "shard_ell",
    "shard_vec",
    "replicate",
    "shard_hierarchy",
    "ROW_AXIS",
]
