from .hex_layout import HexLayout
from .model import StructuredModel
from .pallas_model import (
    pallas_rollout_diff,
    pallas_run_loop,
    pallas_step,
    pallas_tiled_run_loop,
    structured_auto_run_loop,
)
from .sharded import ShardedStructuredModel

__all__ = [
    "HexLayout",
    "StructuredModel",
    "ShardedStructuredModel",
    "pallas_rollout_diff",
    "pallas_run_loop",
    "pallas_step",
    "pallas_tiled_run_loop",
    "structured_auto_run_loop",
]
