from .shard import ShardedWidebandScan, make_mesh  # noqa: F401
from .multihost import MultiHostWidebandScan, init_distributed  # noqa: F401
