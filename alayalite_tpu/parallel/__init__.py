from .sharded import (
    ShardedBlockIndex,
    ShardedFlatIndex,
    ShardedGraphIndex,
    db_sharded_flat_search,
    db_sharded_graph_search,
    dp_sharded_beam_search,
    make_mesh,
    shard_space_by_rows,
)

__all__ = [
    "ShardedBlockIndex",
    "ShardedFlatIndex",
    "ShardedGraphIndex",
    "db_sharded_flat_search",
    "db_sharded_graph_search",
    "dp_sharded_beam_search",
    "make_mesh",
    "shard_space_by_rows",
]
