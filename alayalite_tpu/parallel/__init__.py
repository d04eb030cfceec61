from .sharded import (
    db_sharded_flat_search,
    dp_sharded_beam_search,
    make_mesh,
    shard_space_by_rows,
)

__all__ = [
    "db_sharded_flat_search",
    "dp_sharded_beam_search",
    "make_mesh",
    "shard_space_by_rows",
]
