from .pytree import static_field, pytree_dataclass
from .errors import ErrorMeasures, error_measures

__all__ = ["static_field", "pytree_dataclass", "ErrorMeasures", "error_measures"]
