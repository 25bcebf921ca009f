from .partition import partition_cells, build_partition, PartitionedMesh
from .ppermute import build_permute_schedule, halo_exchange_ppermute
from .shard_step import ShardedModel
from .stats import format_stats, partition_stats

__all__ = [
    "partition_cells",
    "build_partition",
    "PartitionedMesh",
    "ShardedModel",
    "build_permute_schedule",
    "halo_exchange_ppermute",
    "partition_stats",
    "format_stats",
]
