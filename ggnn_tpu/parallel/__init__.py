"""Multi-chip sharding: mesh construction, shard_map query, ICI top-k merge."""

from ggnn_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    sharded_bf_query,
    sharded_fused_query,
    sharded_query,
    stack_shards,
)
