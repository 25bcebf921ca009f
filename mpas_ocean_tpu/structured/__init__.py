from .hex_layout import HexLayout
from .model import StructuredModel
from .pallas_model import pallas_run_loop, pallas_step

__all__ = ["HexLayout", "StructuredModel", "pallas_run_loop", "pallas_step"]
