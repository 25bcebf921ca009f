from .hex_layout import HexLayout
from .model import StructuredModel
from .pallas_model import pallas_run_loop, pallas_step
from .sharded import ShardedStructuredModel

__all__ = [
    "HexLayout",
    "StructuredModel",
    "ShardedStructuredModel",
    "pallas_run_loop",
    "pallas_step",
]
