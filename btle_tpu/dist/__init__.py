from .shard import ShardedWidebandScan, make_mesh  # noqa: F401
