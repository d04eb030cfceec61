from .sharded import (
    ShardedFlatIndex,
    db_sharded_flat_search,
    dp_sharded_beam_search,
    make_mesh,
    shard_space_by_rows,
)

__all__ = [
    "ShardedFlatIndex",
    "db_sharded_flat_search",
    "dp_sharded_beam_search",
    "make_mesh",
    "shard_space_by_rows",
]
