from .hex_layout import HexLayout
from .model import StructuredModel

__all__ = ["HexLayout", "StructuredModel"]
