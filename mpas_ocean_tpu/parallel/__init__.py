from .partition import partition_cells, build_partition, PartitionedMesh
from .shard_step import ShardedModel

__all__ = ["partition_cells", "build_partition", "PartitionedMesh", "ShardedModel"]
